"""exp23: round-3 TPU smoke + A/B — fused trace+shade rounds, cluster
precompute, wide-emit LBVH scenes.

Three checks on the real chip, smallest first (a fatal kernel bug at full
frame can wedge the axon worker for hours — probe small):

1. flagship scene at 256x128, 4 bounces: RAYTPU_WAVE=fused vs =split must
   produce identical images (atol 2e-5) — validates the pmega-based round
   kernel + the precomputed cluster records on TPU.
2. device-built (LBVH) scene small render: wide table (new emit) vs
   binary traversal — validates emit_wide_device on TPU.
3. timing A/B at the 720p band scale (5 salted frames each, chained with
   forced readback per the memoization rules in PERF_NOTES.md).

Run from the repo root in a background task with a generous budget.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    log(f"devices: {jax.devices()}")

    from __graft_entry__ import _flagship_scene
    from raytracer_tpu.core.camera import default_camera
    from raytracer_tpu.core.types import RenderConfig
    from raytracer_tpu.kernels.packet import render_linear_fast

    scene = _flagship_scene()
    log(f"flagship scene: {int(scene.num_triangles)} tris")

    # --- 1. fused vs split parity at small frame ---
    w, h = 256, 128
    cfg = RenderConfig(width=w, height=h, max_bounces=4, kernel="packet")
    cam = default_camera(w, h)
    uni = cam.uniforms()

    os.environ["RAYTPU_B0"] = "pallas"
    os.environ["RAYTPU_BOUNCE"] = "wave"

    os.environ["RAYTPU_WAVE"] = "split"
    t0 = time.time()
    a, sa = jax.jit(lambda s, u: render_linear_fast(s, u, cfg))(scene, uni)
    a = np.asarray(a)
    log(f"split small frame ok in {time.time()-t0:.1f}s "
        f"(rays {float(sa['rays_traced']):.0f})")

    os.environ["RAYTPU_WAVE"] = "fused"
    t0 = time.time()
    b, sb = jax.jit(lambda s, u: render_linear_fast(s, u, cfg))(scene, uni)
    b = np.asarray(b)
    log(f"fused small frame ok in {time.time()-t0:.1f}s "
        f"(rays {float(sb['rays_traced']):.0f})")
    err = np.abs(a - b).max()
    log(f"fused vs split max abs err: {err:.2e} "
        f"rays equal: {float(sa['rays_traced']) == float(sb['rays_traced'])}")
    assert err < 2e-5, "FUSED ROUND MISMATCH"

    # --- 2. wide-emit device scene on TPU ---
    from raytracer_tpu.bvh.lbvh import (build_fast_scene_device,
                                        pad_to_cluster_multiple)
    from raytracer_tpu.utils import assets

    cube = assets.make_cube() * 4.0 + np.array([0, -6, 0], np.float32)
    sphere = assets.make_icosphere(3, 3.0) + np.array([6, -3, 2], np.float32)
    plane = (assets.make_ground_plane() * np.array([150, 1, 150], np.float32)
             + np.array([0, -10, 0], np.float32))
    verts = np.concatenate([plane, cube, sphere]).astype(np.float32)
    mats = np.zeros((verts.shape[0], 4), np.float32)
    mats[:, 0:3] = (0.6, 0.5, 0.4)
    pverts, pmats = pad_to_cluster_multiple(verts, mats)
    dev_scene = jax.jit(build_fast_scene_device)(
        jnp.asarray(pverts), jnp.asarray(pmats))
    assert dev_scene.nodes4 is not None
    n_wide = int(dev_scene.num_nodes4)
    log(f"device scene built on TPU: {int(dev_scene.num_nodes)} nodes, "
        f"{n_wide} wide")

    os.environ["RAYTPU_TRAVERSE"] = "bvh4"
    c, _ = jax.jit(lambda s, u: render_linear_fast(s, u, cfg))(dev_scene, uni)
    c = np.asarray(c)
    os.environ["RAYTPU_TRAVERSE"] = "binary"
    os.environ["RAYTPU_WAVE"] = "split"
    d, _ = jax.jit(lambda s, u: render_linear_fast(s, u, cfg))(dev_scene, uni)
    d = np.asarray(d)
    err2 = np.abs(c - d).max()
    log(f"wide-emit vs binary (device scene) max abs err: {err2:.2e}")
    assert err2 < 2e-5, "WIDE EMIT MISMATCH ON TPU"
    os.environ["RAYTPU_TRAVERSE"] = "bvh4"
    os.environ["RAYTPU_WAVE"] = "fused"

    # --- 3. timing A/B at 720p-band scale: 1280x144 band (184320 rays) ---
    w2, h2 = 1280, 144
    cfg2 = RenderConfig(width=w2, height=h2, max_bounces=10,
                        kernel="packet", band_rays=0)
    cam2 = default_camera(w2, 720)

    def bench(tag):
        fn = jax.jit(lambda s, u: render_linear_fast(s, u, cfg2))
        # warmup/compile
        img, st = fn(scene, cam2.uniforms())
        float(np.asarray(img).sum())
        times = []
        for i in range(5):
            u = cam2.uniforms()
            # salt: nudge exposure (unused by render) no — nudge origin
            cam2.move("W") if i % 2 == 0 else cam2.move("S")
            t0 = time.time()
            img, st = fn(scene, cam2.uniforms())
            s = float(np.asarray(img).sum())  # forced readback
            times.append(time.time() - t0)
        ms = 1e3 * np.median(times)
        log(f"{tag}: median {ms:.1f} ms/band-frame (times "
            f"{['%.0f' % (t*1e3) for t in times]})")
        return ms

    os.environ["RAYTPU_WAVE"] = "split"
    ms_split = bench("split rounds")
    os.environ["RAYTPU_WAVE"] = "fused"
    ms_fused = bench("fused rounds")
    log(f"fused/split speedup at band scale: {ms_split / ms_fused:.2f}x")
    log("exp23 DONE")


if __name__ == "__main__":
    main()
