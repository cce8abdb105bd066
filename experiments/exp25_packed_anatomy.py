"""exp25: localize the packed-state regression (A/B on TPU).

bench A/B showed packed rounds at 5.4 FPS vs flat-SoA fused at 7.0 —
the packed plumbing LOST ~1.3x despite removing ~10 fusions/round.
Two suspects, measured separately on an identical sorted bounce-1
population at 720p band scale (184320 rays):

1. KERNEL: bounce_megakernel (14 separate [rows,128] blocks) vs
   bounce_megakernel_packed (one [13,rows,128] f32 + one [2,rows,128]
   i32 block, row-view indexing) — same kernel core, same inputs.
2. GLUE: one round's sort machinery — flat-SoA (stack + row-gather +
   per-field unpack) vs packed col-gather vs packed transpose+row-gather.

Each timed as K salted chained dispatches with one forced readback
(axon memoizes identical dispatches; see PERF_NOTES.md).

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
    from raytracer_tpu.kernels import packet as pk
    from raytracer_tpu.kernels.pallas_trace import pallas_traverse
    from raytracer_tpu.kernels.tracer import (initial_seed,
                                              make_primary_rays, shade)
    from raytracer_tpu.kernels.wavefront import sort_key

    scene = _flagship_scene()
    w, h = 1280, 144
    p = w * h
    cfg = RenderConfig(width=w, height=h, max_bounces=10, kernel="packet",
                       band_rays=0)
    cam = default_camera(w, 720)
    uni = cam.uniforms()

    # --- realistic sorted bounce-1 population (tile-major order) ---
    @jax.jit
    def bounce1_state(cam):
        i = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0).reshape(p)
        per = 16 * 16
        t_id, off = i // per, i % per
        tiles_x = w // 16
        xx = (t_id % tiles_x) * 16 + off % 16
        yy = (t_id // tiles_x) * 16 + off // 16
        pixel = (yy * w + xx).astype(jnp.uint32)
        seed = initial_seed(cam, cfg, pixel, 0)
        seed, ray_o, ray_d = make_primary_rays(cam, cfg, seed, xx, yy, 720)
        alive = jnp.ones((p,), bool)
        res = pallas_traverse(scene, ray_o, ray_d, alive, cfg)
        zero = jnp.zeros((p,), jnp.float32)
        one = jnp.ones((p,), jnp.float32)
        ray_o, ray_d, color, atten, seed, alive = shade(
            res, ray_o, ray_d, (zero, zero, zero), (one, one, one), seed,
            alive, cam.sky_enabled > 0, cfg)
        smin = tuple(scene.nodes8[0, ax] for ax in range(3))
        smax = tuple(scene.nodes8[0, 3 + ax] for ax in range(3))
        key = sort_key(ray_o, ray_d, alive, smin, smax, "pd5")
        order = jnp.argsort(key)
        tk = lambda c: jnp.take(c, order)
        return (tuple(tk(c) for c in ray_o), tuple(tk(c) for c in ray_d),
                tuple(tk(c) for c in color), tuple(tk(c) for c in atten),
                tk(seed), tk(alive), tk((yy * w + xx)))

    ray_o, ray_d, color, atten, seed, alive, pix = bounce1_state(uni)
    live = int(jnp.sum(alive.astype(jnp.int32)))
    log(f"bounce-1 state ready: {live}/{p} live")

    from raytracer_tpu.kernels.pallas_mega import (bounce_megakernel,
                                                   bounce_megakernel_packed)

    num4 = jnp.asarray(scene.num_nodes4, jnp.int32).reshape(1)
    cap1 = jnp.ones((1,), jnp.int32)
    sky1 = jnp.ones((1,), jnp.int32)
    bounds = scene.nodes8[0, :6]
    SUB = 16

    # --- 1. kernel-only A/B ---
    @jax.jit
    def run_unpacked(ray_o, ray_d, color, atten, seed, alive, salt):
        blocks = tuple(
            c.reshape(-1, 128)
            for c in (*ray_o, *ray_d, *color, *atten)) + (
            (jax.lax.bitcast_convert_type(seed, jnp.int32)
             + salt).reshape(-1, 128),
            alive.astype(jnp.float32).reshape(-1, 128),
            jnp.full((p // 128, 128), 1 << 30, jnp.int32))
        outs = bounce_megakernel(
            scene.nodes4, scene.clusters, num4, blocks, cap1, sky1,
            bounds, SUB,
            float(cfg.fuzz), False, t_min=float(cfg.t_min),
            t_max=float(cfg.t_max), det_eps=float(cfg.det_eps))
        return outs[6][0, :8]  # tiny readback handle

    @jax.jit
    def run_packed(ray_o, ray_d, color, atten, seed, alive, salt):
        sf = jnp.stack(list(ray_o) + list(ray_d) + list(color)
                       + list(atten)
                       + [alive.astype(jnp.float32)], axis=0)
        si = jnp.stack([jax.lax.bitcast_convert_type(seed, jnp.int32)
                        + salt,
                        jnp.arange(p, dtype=jnp.int32)], axis=0)
        sfo, sio, raysb, liveb, keyb = bounce_megakernel_packed(
            scene.nodes4, scene.clusters, num4,
            sf.reshape(13, -1, 128), si.reshape(2, -1, 128), cap1, sky1,
            bounds, SUB, float(cfg.fuzz), False, t_min=float(cfg.t_min),
            t_max=float(cfg.t_max), det_eps=float(cfg.det_eps))
        return sfo[6, 0, :8]

    def timeit(tag, fn, iters=8):
        # warm + compile; per-iter salts beat the tunnel's memoization,
        # one trailing readback drains the async queue (block_until_ready
        # does not block on axon — PERF_NOTES.md).
        float(np.asarray(fn(ray_o, ray_d, color, atten, seed, alive,
                            jnp.int32(1))).sum())
        t0 = time.time()
        r = None
        for it in range(iters):
            r = fn(ray_o, ray_d, color, atten, seed, alive,
                   jnp.int32(2 + it))
        acc = float(np.asarray(r).sum())
        dt = (time.time() - t0) / iters * 1e3
        log(f"{tag}: {dt:.2f} ms/dispatch (sum {acc:.1f})")
        return dt

    ms_u = timeit("kernel unpacked (14 blocks)", run_unpacked)
    ms_p = timeit("kernel packed   (3D blocks)", run_packed)
    log(f"kernel packed/unpacked: {ms_p / ms_u:.2f}x")

    # --- 2. glue-only A/B (sort machinery, no kernel) ---
    smin = tuple(scene.nodes8[0, ax] for ax in range(3))
    smax = tuple(scene.nodes8[0, 3 + ax] for ax in range(3))

    @jax.jit
    def glue_unpacked(ray_o, ray_d, color, atten, seed, alive, pix, salt):
        key = sort_key(ray_o, ray_d, alive, smin, smax, "pd5") + salt
        order = jnp.argsort(key)
        fpack = jnp.stack(list(ray_o) + list(ray_d) + list(color)
                          + list(atten), axis=-1)
        fpack = jnp.take(fpack, order, axis=0)
        ipack = jnp.stack(
            [jax.lax.bitcast_convert_type(seed, jnp.int32), pix,
             alive.astype(jnp.int32)], axis=-1)
        ipack = jnp.take(ipack, order, axis=0)
        blocks = tuple(fpack[:, j].reshape(-1, 128) for j in range(12)) + (
            ipack[:, 0].reshape(-1, 128),
            ipack[:, 2].astype(jnp.float32).reshape(-1, 128))
        return sum(b[0, :8] for b in blocks[:12])

    sf0 = jnp.stack(list(ray_o) + list(ray_d) + list(color) + list(atten)
                    + [alive.astype(jnp.float32)], axis=0)
    si0 = jnp.stack([jax.lax.bitcast_convert_type(seed, jnp.int32), pix],
                    axis=0)

    @jax.jit
    def glue_col(sf, si, salt):
        key = sort_key((sf[0], sf[1], sf[2]), (sf[3], sf[4], sf[5]),
                       sf[12] > 0.5, smin, smax, "pd5") + salt
        order = jnp.argsort(key)
        sf = jnp.take(sf, order, axis=1)
        si = jnp.take(si, order, axis=1)
        return sf[6, :8] + si[0, :8].astype(jnp.float32)

    @jax.jit
    def glue_row(sf, si, salt):
        key = sort_key((sf[0], sf[1], sf[2]), (sf[3], sf[4], sf[5]),
                       sf[12] > 0.5, smin, smax, "pd5") + salt
        order = jnp.argsort(key)
        sf = jnp.take(sf.T, order, axis=0).T
        si = jnp.take(si.T, order, axis=0).T
        return sf[6, :8] + si[0, :8].astype(jnp.float32)

    def timeit2(tag, fn, args, iters=12):
        float(np.asarray(fn(*args, jnp.uint32(1))).sum())
        t0 = time.time()
        r = None
        for it in range(iters):
            r = fn(*args, jnp.uint32(2 + it))
        acc = float(np.asarray(r).sum())
        dt = (time.time() - t0) / iters * 1e3
        log(f"{tag}: {dt:.2f} ms/round-glue (sum {acc:.1f})")
        return dt

    g_u = timeit2("glue unpacked", glue_unpacked,
                  (ray_o, ray_d, color, atten, seed, alive, pix))
    g_c = timeit2("glue packed col", glue_col, (sf0, si0))
    g_r = timeit2("glue packed row", glue_row, (sf0, si0))
    log(f"glue col/unpacked: {g_c / g_u:.2f}x  row/unpacked: "
        f"{g_r / g_u:.2f}x")
    log("exp25 DONE")


if __name__ == "__main__":
    main()
