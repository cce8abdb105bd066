"""exp37: decompose the r4b lbvh_ploc 0.77 FPS post-mortem.

Two suspects for device-PLOC's collapse on the two_humans live-edit
bench (r4b: karras 5.57 FPS, ploc 0.77 FPS):

  (a) host-side: ``_build_jit_ploc()`` returned a FRESH ``jax.jit``
      wrapper every build, so each frame re-traced (and re-compiled)
      the entire PLOC while_loop program — fixed in
      scene/device_builder.py (wrapper now ``functools.cache``d);
  (b) device-side: PLOC's O(n) compaction iterations genuinely cost
      more per rebuild than Karras' radix sort + pointer doubling.

This measures, at the two_humans scale (2x FinalBaseMesh, 97,836 tris,
131,072-capacity bucket):

  1. per-REBUILD wall time, karras vs ploc, dragged params each call
     (changing inputs + forced readback per the CLAUDE.md tunnel rules),
     warm-up call excluded and reported separately (compile);
  2. per-FRAME render time with each FIXED tree (720p, 10 bounces) —
     tree quality isolated from build cost.

Run from the repo root on TPU:  python experiments/exp37_device_build_cost.py
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["RAYTPU_DEVICE_BUILD"] = "lbvh"

import numpy as np  # noqa: E402


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax  # noqa: F401

    from raytracer_tpu.core.camera import default_camera
    from raytracer_tpu.core.types import RenderConfig
    from raytracer_tpu.engine.renderer import Renderer
    from raytracer_tpu.scene.device_builder import DeviceSceneBuilder
    from raytracer_tpu.scene.scene import ModelInstance
    from raytracer_tpu.utils.assets import asset_path

    path = asset_path("FinalBaseMesh.obj")
    builder = DeviceSceneBuilder()
    base = [
        ModelInstance(model_path=path, display_name="human_a",
                      position=(-8.0, -10.0, 0.0), scale=(2.0,) * 3,
                      color=(0.7, 0.6, 0.5), material_type=0.0),
        ModelInstance(model_path=path, display_name="human_b",
                      position=(8.0, -10.0, 0.0), scale=(2.0,) * 3,
                      color=(0.5, 0.6, 0.7), material_type=0.0),
    ]

    def dragged(k):
        out = list(base)
        out[-1] = dataclasses.replace(
            out[-1], position=(8.0 + 0.05 * k, -10.0, 0.0))
        return out

    def force(scene):
        # Forced host readback: the tunnel's block_until_ready does not
        # block (CLAUDE.md); a tiny slice fence is enough.
        return float(np.asarray(scene.nodes8[:1, :1]).sum())

    n_builds = int(os.environ.get("EXP37_BUILDS", "6"))
    results = {}
    for tree in ("karras", "ploc"):
        os.environ["RAYTPU_DEVICE_TREE"] = tree
        t0 = time.perf_counter()
        scene = builder.build(dragged(0))
        force(scene)
        compile_s = time.perf_counter() - t0
        log(f"{tree}: first build (incl. compile) {compile_s:.1f}s")

        times = []
        for k in range(1, n_builds + 1):
            t0 = time.perf_counter()
            scene = builder.build(dragged(k))
            force(scene)
            times.append(time.perf_counter() - t0)
        build_ms = 1e3 * float(np.median(times))
        log(f"{tree}: rebuild median {build_ms:.1f} ms over {n_builds} "
            f"(all: {[f'{1e3 * t:.0f}' for t in times]})")
        results[tree] = {"compile_s": compile_s, "build_ms": build_ms,
                         "scene": scene}

    # Phase B: render-only with each fixed tree.
    cfg = RenderConfig(width=1280, height=720, max_bounces=10,
                       kernel="packet")
    renderer = Renderer(cfg)
    cam = default_camera(1280, 720)
    n_frames = int(os.environ.get("EXP37_FRAMES", "6"))
    for tree in ("karras", "ploc"):
        scene = results[tree].pop("scene")
        accum, img, _ = renderer.render(scene, cam.uniforms(), None)
        np.asarray(img)  # warm
        t0 = time.perf_counter()
        for _ in range(n_frames):
            cam.increment_frame_count()
            accum, img, _ = renderer.render(scene, cam.uniforms(), accum)
        np.asarray(img)
        render_ms = 1e3 * (time.perf_counter() - t0) / n_frames
        results[tree]["render_ms"] = render_ms
        log(f"{tree}: render {render_ms:.1f} ms/frame over {n_frames}")

    k, p = results["karras"], results["ploc"]
    log(f"SUMMARY build karras {k['build_ms']:.0f} ms vs ploc "
        f"{p['build_ms']:.0f} ms; render karras {k['render_ms']:.1f} ms "
        f"vs ploc {p['render_ms']:.1f} ms; frame(karras) "
        f"{k['build_ms'] + k['render_ms']:.0f} ms, frame(ploc) "
        f"{p['build_ms'] + p['render_ms']:.0f} ms")


if __name__ == "__main__":
    main()
