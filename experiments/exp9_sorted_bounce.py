"""exp9: sorted-wavefront bounce round costs on the real TPU.

Measures, on one 184k-ray band of the flagship 720p frame:
  1. bounce-1 ray population (pallas bounce-0 + shade)
  2. key+argsort cost at 184k (u32 key: dead | octant | morton)
  3. permutation-gather cost of a packed [184k, 24] float state
  4. pallas_traverse on bounce-1 rays: primary-tile order vs sorted
  5. XLA per-ray traversal on the same rays (the current megakernel cost
     class) for comparison

Methodology per CLAUDE.md: marginal cost of K vs 2K chained in-jit
dispatches, changing inputs, one readback; run to completion in background.
"""
import sys, time, os, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from exp6_pallas_trace import tile_order


def part1bits(v):
    """Spread 10 bits of v to every 3rd bit (u32)."""
    v = v & jnp.uint32(0x3FF)
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def sort_key(ro, rd, alive, smin, smax):
    """u32: dead(1) | octant(3) | morton 9bits/axis (27) -> 31 bits."""
    oct_ = ((rd[0] > 0).astype(jnp.uint32)
            | ((rd[1] > 0).astype(jnp.uint32) << 1)
            | ((rd[2] > 0).astype(jnp.uint32) << 2))
    codes = []
    for ax in range(3):
        q = jnp.clip((ro[ax] - smin[ax]) / (smax[ax] - smin[ax]) * 511.0,
                     0.0, 511.0).astype(jnp.uint32)
        codes.append(part1bits(q) << jnp.uint32(ax))
    m = codes[0] | codes[1] | codes[2]  # 27+2 bits; keep low 27
    m = m & jnp.uint32((1 << 27) - 1)
    dead = (~alive).astype(jnp.uint32) << jnp.uint32(31)
    return dead | (oct_ << jnp.uint32(28)) | m


def main():
    from raytracer_tpu.core.camera import default_camera
    from raytracer_tpu.core.types import RenderConfig
    from raytracer_tpu.kernels.pallas_trace import pallas_traverse
    from raytracer_tpu.kernels.packet import ray_traverse_fast
    from raytracer_tpu.kernels.tracer import (initial_seed, make_primary_rays,
                                              shade)
    from __graft_entry__ import _flagship_scene

    print("devices:", jax.devices(), flush=True)
    fs = _flagship_scene()
    smin = tuple(float(x) for x in np.asarray(fs.nodes8[0, 0:3]))
    smax = tuple(float(x) for x in np.asarray(fs.nodes8[0, 3:6]))
    W, H = 1280, 144
    P = W * H
    cfg = RenderConfig(width=W, height=H)
    cam = default_camera(1280, 720)
    uni = cam.uniforms()
    ty, tx = tile_order(H, W, 16, 64)
    yyt = jnp.asarray(ty + 288)
    xxt = jnp.asarray(tx)
    pixj = (yyt * W + xxt).astype(jnp.uint32)
    ones = jnp.ones((P,), bool)

    @jax.jit
    def bounce1_state(scene, u, salt):
        s = initial_seed(u, cfg, pixj, 0) ^ salt
        s, o, d = make_primary_rays(u, cfg, s, xxt, yyt, 720)
        r = pallas_traverse(scene, o, d, ones, cfg)
        zero = jnp.zeros((P,), jnp.float32)
        one = jnp.ones((P,), jnp.float32)
        o, d, col, att, s, alive = shade(
            r, o, d, (zero,)*3, (one,)*3, s, ones, jnp.bool_(True), cfg)
        return o, d, col, att, s, alive

    t0 = time.time()
    o1, d1, col, att, s1, alive1 = bounce1_state(fs, uni, jnp.uint32(0))
    na = int(np.asarray(alive1).sum())
    print(f"bounce-1 state: {na}/{P} alive ({time.time()-t0:.0f}s incl "
          "compile)", flush=True)

    # --- 2/3: sort + permute cost ---
    @functools.partial(jax.jit, static_argnames=("k", "what"))
    def chain_sort(o, d, alive, salt, k, what):
        def body(i, acc):
            key = sort_key((o[0] + acc * 1e-8, o[1], o[2]), d, alive,
                           smin, smax) ^ (salt + i)
            if what == "key":
                return acc + jnp.float32(jnp.sum(key & jnp.uint32(1)))
            order = jnp.argsort(key)
            if what == "argsort":
                return acc + jnp.float32(order[0])
            pack = jnp.stack(list(o) + list(d) + [alive.astype(jnp.float32)]
                             * 18, axis=-1)  # [P, 24]
            pg = jnp.take(pack, order, axis=0)
            return acc + pg[0, 0]
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    def timed(fn, k, reps=3):
        float(fn(k=k))
        t0 = time.time()
        for r in range(reps):
            float(fn(k=k))
        return (time.time() - t0) / reps

    for what in ("key", "argsort", "perm"):
        fn = functools.partial(chain_sort, o1, d1, alive1, jnp.uint32(7),
                               what=what)
        t4 = timed(fn, 4)
        t8 = timed(fn, 8)
        print(f"{what:10s}: marginal {(t8-t4)/4*1e3:7.2f} ms "
              f"(k4 {t4*1e3:.1f} k8 {t8*1e3:.1f})", flush=True)

    # --- 4: pallas traversal on bounce-1 rays, orders A/B ---
    key = sort_key(o1, d1, alive1, smin, smax)
    order_sorted = jnp.argsort(key)
    order_tile = jnp.arange(P, dtype=jnp.int32)

    def reorder(order):
        o = tuple(jnp.take(c, order) for c in o1)
        d = tuple(jnp.take(c, order) for c in d1)
        a = jnp.take(alive1, order)
        return o, d, a

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain_trace(o, d, a, salt, k):
        def body(i, acc):
            oo = (o[0] + (salt + i).astype(jnp.float32) * 1e-12, o[1], o[2])
            r = pallas_traverse(fs, oo, d, a, cfg)
            return acc + jnp.sum(r.closest_t * (r.closest_t < cfg.t_max))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    for name, order in (("tile-order", order_tile),
                        ("sorted", order_sorted)):
        o, d, a = reorder(order)
        fn = functools.partial(chain_trace, o, d, a, jnp.uint32(3))
        t2 = timed(fn, 2)
        t4 = timed(fn, 4)
        per = (t4 - t2) / 2
        print(f"pallas bounce-1 {name:10s}: {per*1e3:7.2f} ms/traversal "
              f"= {na/per/1e6:5.1f} Mrays/s live "
              f"({P/per/1e6:5.1f} all)", flush=True)

    # --- 5: XLA per-ray traversal on same rays ---
    @functools.partial(jax.jit, static_argnames=("k",))
    def chain_xla(o, d, a, salt, k):
        def body(i, acc):
            oo = (o[0] + (salt + i).astype(jnp.float32) * 1e-12, o[1], o[2])
            r = ray_traverse_fast(fs, oo, d, a, cfg)
            return acc + jnp.sum(r.closest_t * (r.closest_t < cfg.t_max))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    o, d, a = reorder(order_tile)
    fn = functools.partial(chain_xla, o, d, a, jnp.uint32(3))
    t1 = timed(fn, 1)
    t2 = timed(fn, 2)
    per = t2 - t1
    print(f"xla bounce-1 per-ray    : {per*1e3:7.2f} ms/traversal "
          f"= {na/per/1e6:5.1f} Mrays/s live", flush=True)


if __name__ == "__main__":
    main()
