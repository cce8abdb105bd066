"""Small-first TPU smoke after the key-mode kernel change: compile + run
the bounce megakernel at 256x128 in all three key modes and check the
images are identical (they must be — test_key_mode_image_invariance).
Run BEFORE any full-frame bench after a worker outage (CLAUDE.md)."""
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
    scene = _flagship_scene()
    w, h = 256, 128
    cfg = RenderConfig(width=w, height=h, max_bounces=6, kernel="packet")
    uni = default_camera(w, h).uniforms()
    imgs = {}
    for mode in ("pd5", "om9", "cid"):
        os.environ["RAYTPU_SORT_KEY"] = mode
        t0 = time.time()
        img, st = jax.jit(lambda s, u: render_linear_fast(s, u, cfg))(
            scene, uni)
        imgs[mode] = np.asarray(img)
        log(f"{mode}: ok in {time.time() - t0:.1f}s "
            f"(rays {float(st['rays_traced']):.0f})")
    bad = False
    for mode in ("om9", "cid"):
        same = np.array_equal(imgs[mode], imgs["pd5"])
        log(f"{mode} vs pd5 identical: {same}")
        if not same:
            bad = True
            diff = np.abs(imgs[mode].astype(np.int32)
                          - imgs["pd5"].astype(np.int32))
            log(f"  MAX DIFF {diff.max()} at {int((diff > 0).sum())} px")
    if bad:
        log("SMOKE FAILED")
        sys.exit(1)
    log("smoke done")


if __name__ == "__main__":
    main()
