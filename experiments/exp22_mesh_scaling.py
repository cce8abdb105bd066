"""exp22: multi-chip scaling curve on the virtual CPU mesh.

VERDICT r2 #6: measure how the (dp, sp) shard_map render step scales with
device count — per-device ray throughput and parallel efficiency vs the
(1,1) baseline — on the 8-virtual-device CPU mesh (real multi-chip
hardware is not available in this environment; ICI collective cost is NOT
represented here, but partition efficiency, replication overheads, and
the psum-mean reduction structure are).

Method: chained frames through the donated accumulation buffer (true
sequential dependency), one forced readback at the end, warmup frame
excluded — the same discipline as bench.py. CPU wall times are meaningless
in absolute terms; the deliverable is the CURVE (efficiency column).

Writes MESH_SCALING.json (one entry per mesh shape) and prints a table.

Run:  python experiments/exp22_mesh_scaling.py   (from the repo root)
Env:  EXP22_RES=WxH (default 512x256), EXP22_FRAMES=N (default 4),
      EXP22_BOUNCES=N (default 4), EXP22_SPP=K (default 8).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    from raytracer_tpu.core.camera import default_camera
    from raytracer_tpu.core.types import RenderConfig
    from raytracer_tpu.engine.renderer import Renderer
    from raytracer_tpu.parallel.sharding import MeshRenderer, make_mesh
    from raytracer_tpu.scene.builder import build_fast_scene_from_arrays
    from raytracer_tpu.utils import assets

    res = os.environ.get("EXP22_RES", "512x256")
    w, h = (int(x) for x in res.split("x"))
    frames = int(os.environ.get("EXP22_FRAMES", "4"))
    bounces = int(os.environ.get("EXP22_BOUNCES", "4"))
    spp = int(os.environ.get("EXP22_SPP", "8"))

    if os.environ.get("EXP22_SCENE", "terrain") == "flagship":
        # VERDICT r3 item 8: the real 48.9k-tri workload, so the curve
        # reflects flagship-scale replication/collective costs.
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from __graft_entry__ import _flagship_scene

        scene = _flagship_scene()
        tris = np.zeros((int(scene.num_triangles), 1))  # count only
    else:
        tris = assets.make_terrain(n=72)  # ~10k tris
        mats = np.zeros((tris.shape[0], 4), np.float32)
        mats[:, 0:3] = (0.55, 0.5, 0.45)
        scene = build_fast_scene_from_arrays(tris, mats)
    cam = default_camera(w, h)
    cfg = RenderConfig(width=w, height=h, max_bounces=bounces,
                       kernel="packet", samples_per_pixel=spp)

    shapes = [(1, 1), (2, 1), (4, 1), (8, 1), (4, 2), (2, 4), (1, 8)]
    if os.environ.get("EXP22_SHAPES"):
        # e.g. EXP22_SHAPES=1x1,2x1,8x1,2x4 — trim the grid for the
        # flagship-scale run (48.9k tris on one physical core is slow).
        shapes = [tuple(int(v) for v in s.split("x"))
                  for s in os.environ["EXP22_SHAPES"].split(",")]
    results = []
    for dp, sp in shapes:
        n = dp * sp
        if cfg.height % (dp * 8) or spp % sp:
            print(f"skip ({dp},{sp}): shape constraints")
            continue
        if n == 1:
            r = Renderer(cfg)
            rscene = scene
        else:
            r = MeshRenderer(cfg, mesh=make_mesh(n_devices=n, sp=sp))
            rscene = r.prepare_scene(scene)
        cam.frame_count = 0
        accum, img, stats = r.render(rscene, cam.uniforms())  # warmup
        np.asarray(img)
        rays_per_frame = float(stats["rays_traced"])
        t0 = time.perf_counter()
        for fc in range(1, frames + 1):
            cam.frame_count = fc
            accum, img, stats = r.render(rscene, cam.uniforms(), accum)
        np.asarray(img)
        dt = (time.perf_counter() - t0) / frames
        mrays = rays_per_frame / dt / 1e6
        results.append({
            "dp": dp, "sp": sp, "devices": n,
            "ms_per_frame": round(dt * 1e3, 1),
            "mrays_s": round(mrays, 3),
            "mrays_s_per_device": round(mrays / n, 3),
            "rays_per_frame": rays_per_frame,
        })
        print(f"({dp},{sp}) x{n}: {dt*1e3:8.1f} ms/frame  "
              f"{mrays:7.2f} Mrays/s  {mrays/n:6.2f} /dev", flush=True)

    base = next((r for r in results if r["devices"] == 1), None)
    for r in results:
        r["efficiency_vs_1dev"] = (
            round(r["mrays_s"] / (base["mrays_s"] * r["devices"]), 3)
            if base else None)
        # On the VIRTUAL mesh the honest headline is wall-clock speedup:
        # the 8 "devices" share the same physical cores, so per-device
        # efficiency is structurally <= 1/N even with zero partition
        # overhead. speedup > 1 means partitioning exposed parallelism
        # XLA:CPU wasn't already using; speedup ~ 1 at dp=N means the
        # partition added no overhead; < 1 is real replication/collective
        # cost (the sp axis pays scene replication + psum).
        r["speedup_vs_1dev"] = (
            round(base["ms_per_frame"] / r["ms_per_frame"], 3)
            if base else None)

    out = {
        "workload": {"resolution": res, "frames": frames,
                     "bounces": bounces, "spp": spp,
                     "scene": os.environ.get("EXP22_SCENE", "terrain"),
                     "triangles": int(tris.shape[0]),
                     "backend": "cpu-virtual-8dev"},
        "results": results,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MESH_SCALING.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")

    print("\n| mesh (dp,sp) | devices | ms/frame | Mrays/s | per-dev | "
          "efficiency |")
    print("|---|---|---|---|---|---|")
    for r in results:
        print(f"| ({r['dp']},{r['sp']}) | {r['devices']} | "
              f"{r['ms_per_frame']} | {r['mrays_s']} | "
              f"{r['mrays_s_per_device']} | {r['efficiency_vs_1dev']} |")


if __name__ == "__main__":
    main()
