"""exp6: Pallas per-tile traversal on the real TPU.

Stages (each prints, so a hang is attributable):
  1. tiny compile + parity vs ray_traverse_fast (8k rays, cube scene)
  2. flagship-scene parity on a 184k-ray band
  3. timing: tile-major vs raster ray order, vs the XLA megakernel bounce-0

Methodology per CLAUDE.md: changing inputs every dispatch + forced host
readback; generous budget; run to completion.
"""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def tile_order(h, w, th, tw):
    """Pixel (y,x) arrays in tile-major order: consecutive th*tw rays form
    one tile."""
    yy = np.arange(h)[:, None].repeat(w, 1)
    xx = np.arange(w)[None, :].repeat(h, 0)
    def tm(a):
        return (a.reshape(h // th, th, w // tw, tw)
                 .transpose(0, 2, 1, 3).reshape(-1))
    return tm(yy), tm(xx)


def main():
    from raytracer_tpu.core.camera import default_camera, Camera
    from raytracer_tpu.core.types import RenderConfig
    from raytracer_tpu.scene.builder import build_fast_scene_from_arrays
    from raytracer_tpu.utils import assets
    from raytracer_tpu.kernels.packet import ray_traverse_fast
    from raytracer_tpu.kernels.pallas_trace import pallas_traverse
    from raytracer_tpu.kernels.tracer import make_primary_rays, initial_seed

    print("devices:", jax.devices(), flush=True)
    skip_parity = os.environ.get("RAYTPU_EXP6_TIMING_ONLY") == "1"

    # --- stage 1: tiny parity ---
    W, H = 128, 64
    cube = assets.make_cube() * 4.0 + np.array([0, -6, 0], np.float32)
    plane = (assets.make_ground_plane() * np.array([150, 1, 150], np.float32)
             + np.array([0, -10, 0], np.float32))
    verts = np.concatenate([plane, cube]).astype(np.float32)
    mats = np.zeros((verts.shape[0], 4), np.float32); mats[:, 0:3] = 0.6
    scene = build_fast_scene_from_arrays(verts, mats)
    cfg = RenderConfig(width=W, height=H)
    cam = Camera(origin=(-10., 6., 30.), look_at=(0., -6., 0.),
                 vfov_deg=40., aspect_ratio=W / H)
    uni = cam.uniforms()
    yy = jnp.asarray(np.arange(H)[:, None].repeat(W, 1).reshape(-1))
    xx = jnp.asarray(np.arange(W)[None, :].repeat(H, 0).reshape(-1))
    pix = (yy * W + xx).astype(jnp.uint32)
    seed = initial_seed(uni, cfg, pix, 0)
    seed, ro, rd = make_primary_rays(uni, cfg, seed, xx, yy, H)
    active = jnp.ones((W * H,), bool)
    if not skip_parity:
        t0 = time.time()
        b = pallas_traverse(scene, ro, rd, active, cfg, interpret=False)
        tsum = float(jnp.sum(b.closest_t * (b.closest_t < cfg.t_max)))
        print(f"stage1 compile+run {time.time()-t0:.1f}s tsum={tsum:.2f}",
              flush=True)
        a = ray_traverse_fast(scene, ro, rd, active, cfg)
        np.testing.assert_allclose(np.asarray(a.closest_t),
                                   np.asarray(b.closest_t), atol=2e-4)
        print("stage1 parity OK", flush=True)

    # --- stage 2: flagship band parity ---
    from __graft_entry__ import _flagship_scene
    fs = _flagship_scene()
    W, H = 1280, 144  # one 184k-ray band of the 720p frame
    cfg = RenderConfig(width=W, height=H)
    cam = default_camera(1280, 720)
    uni = cam.uniforms()
    ty, tx = tile_order(H, W, 16, 64)
    yyt = jnp.asarray(ty + 288)  # middle band of the 720p frame
    xxt = jnp.asarray(tx)
    pix = (yyt * W + xxt).astype(jnp.uint32)
    seed = initial_seed(uni, cfg, pix, 0)
    seed, ro, rd = make_primary_rays(uni, cfg, seed, xxt, yyt, 720)
    active = jnp.ones((W * H,), bool)
    if not skip_parity:
        t0 = time.time()
        b = pallas_traverse(fs, ro, rd, active, cfg)
        hits = int(np.asarray(b.hit).sum())
        print(f"stage2 compile+run {time.time()-t0:.1f}s hits={hits}",
              flush=True)
        a = ray_traverse_fast(fs, ro, rd, active, cfg)
        bad = np.abs(np.asarray(a.closest_t) - np.asarray(b.closest_t)) > 2e-3
        print(f"stage2 parity: {bad.sum()} mismatched of {W*H}", flush=True)

    # --- stage 3: timing ---
    def bench(order_name, yyo, xxo, iters=8):
        yyj = jnp.asarray(yyo + 288)
        xxj = jnp.asarray(xxo)
        pixj = (yyj * W + xxj).astype(jnp.uint32)

        import functools as _ft

        @jax.jit
        def once(scene, u, si):
            s = initial_seed(u, cfg, pixj, si) ^ si
            s, o, d = make_primary_rays(u, cfg, s, xxj, yyj, 720)
            r = pallas_traverse(scene, o, d, active, cfg)
            return jnp.sum(r.closest_t * (r.closest_t < cfg.t_max))

        once = _ft.partial(once, fs, uni)
        float(once(jnp.uint32(0)))  # warm
        t0 = time.time()
        acc = 0.0
        for i in range(iters):
            acc += float(once(jnp.uint32(i + 1)))
        dt = (time.time() - t0) / iters
        print(f"stage3 {order_name}: {dt*1e3:.1f} ms/dispatch "
              f"({W*H/dt/1e6:.1f} Mrays/s) acc={acc:.0f}", flush=True)
        return dt

    bench("tile16x64", ty, tx)
    ry = np.arange(H)[:, None].repeat(W, 1).reshape(-1)
    rx = np.arange(W)[None, :].repeat(H, 0).reshape(-1)
    bench("raster", ry, rx)

    # megakernel bounce-0 comparison: full traversal via XLA path
    import functools as _ft

    @jax.jit
    def once_xla_f(scene, u, si):
        s = initial_seed(u, cfg, pix, si) ^ si
        s, o, d = make_primary_rays(u, cfg, s, xxt, yyt, 720)
        r = ray_traverse_fast(scene, o, d, active, cfg)
        return jnp.sum(r.closest_t * (r.closest_t < cfg.t_max))
    once_xla = _ft.partial(once_xla_f, fs, uni)
    float(once_xla(jnp.uint32(0)))
    t0 = time.time()
    acc = 0.0
    for i in range(4):
        acc += float(once_xla(jnp.uint32(i + 1)))
    dt = (time.time() - t0) / 4
    print(f"stage3 xla_per_ray: {dt*1e3:.1f} ms/dispatch "
          f"({W*H/dt/1e6:.1f} Mrays/s) acc={acc:.0f}", flush=True)


if __name__ == "__main__":
    main()
