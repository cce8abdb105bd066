"""Small-first TPU smoke for the PLOC builders (host + device) before
the r4b full-frame benches: compile + run a 256x128 render on the
flagship scene with RAYTPU_BVH=ploc, and an on-device PLOC rebuild of a
~16k-tri terrain, checking both against the SAH-built image."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    log(f"devices: {jax.devices()}")
    from __graft_entry__ import _flagship_scene
    from raytracer_tpu.core.camera import default_camera
    from raytracer_tpu.core.types import RenderConfig
    from raytracer_tpu.kernels.packet import render_linear_fast

    os.environ["RAYTPU_B0"] = "pallas"
    os.environ["RAYTPU_BOUNCE"] = "wave"
    w, h = 256, 128
    cfg = RenderConfig(width=w, height=h, max_bounces=6, kernel="packet")
    uni = default_camera(w, h).uniforms()

    imgs = {}
    for mode in ("sah", "ploc"):
        os.environ["RAYTPU_BVH"] = mode
        t0 = time.time()
        scene = _flagship_scene()
        t_build = time.time() - t0
        t0 = time.time()
        img, st = jax.jit(lambda s, u: render_linear_fast(s, u, cfg))(
            scene, uni)
        imgs[mode] = np.asarray(img)
        log(f"host {mode}: build {t_build:.2f}s, render ok in "
            f"{time.time() - t0:.1f}s (rays {float(st['rays_traced']):.0f})")
    d = np.abs(imgs["sah"].astype(np.float32)
               - imgs["ploc"].astype(np.float32)).max()
    log(f"host ploc vs sah max|diff| (u8): {d}")
    assert d <= 2.0, "PLOC host image diverged"

    # On-device PLOC rebuild smoke (the live-edit path).
    import jax.numpy as jnp

    from raytracer_tpu.bvh.lbvh import (build_fast_scene_device,
                                        pad_to_cluster_multiple)
    from raytracer_tpu.bvh.ploc_device import build_fast_scene_device_ploc
    from raytracer_tpu.utils import assets

    tris = assets.make_terrain(n=90)  # ~16k tris
    mats = np.zeros((tris.shape[0], 4), np.float32)
    mats[:, 0:3] = 0.6
    pv, pm = pad_to_cluster_multiple(tris, mats)
    pv, pm = jnp.asarray(pv), jnp.asarray(pm)
    from raytracer_tpu.core.camera import Camera

    cam = Camera(origin=(0.0, 30.0, 80.0), look_at=(0.0, 0.0, 0.0),
                 vfov_deg=40.0, aspect_ratio=w / h)
    uni2 = cam.uniforms()

    out = {}
    for name, fn in (("karras", build_fast_scene_device),
                     ("ploc", build_fast_scene_device_ploc)):
        t0 = time.time()
        scene = jax.jit(fn)(pv, pm)
        img, st = jax.jit(lambda s, u: render_linear_fast(s, u, cfg))(
            scene, uni2)
        out[name] = np.asarray(img)
        log(f"device {name}: build+render ok in {time.time() - t0:.1f}s "
            f"(n_wide {int(scene.num_nodes4)})")
    d = np.abs(out["karras"].astype(np.float32)
               - out["ploc"].astype(np.float32)).max()
    log(f"device ploc vs karras max|diff| (u8): {d}")
    assert d <= 2.0, "PLOC device image diverged"
    log("smoke done")


if __name__ == "__main__":
    main()
