"""exp9b: pallas_traverse throughput on real bounce-1 rays, A/B orders.

Follow-up to exp9 (whose sort/permute costs stand: key ~0, argsort 0.11 ms,
24-col permute 0.72 ms at 184k). Ray state is perturbed *inside* the jit so
operands aren't hoisted into VMEM-scoped constants, and dead-tile overhead
is measured with an all-dead population.
"""
import sys, time, os, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from exp6_pallas_trace import tile_order
from exp9_sorted_bounce import sort_key


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
        return o, d, alive

    o1, d1, alive1 = bounce1_state(fs, uni, jnp.uint32(0))
    na = int(np.asarray(alive1).sum())
    print(f"bounce-1: {na}/{P} alive", flush=True)

    key = sort_key(o1, d1, alive1, smin, smax)
    order_sorted = jnp.argsort(key)
    order_tile = jnp.arange(P, dtype=jnp.int32)

    def packed(order):
        o = tuple(np.asarray(jnp.take(c, order)) for c in o1)
        d = tuple(np.asarray(jnp.take(c, order)) for c in d1)
        a = np.asarray(jnp.take(alive1, order))
        return (jnp.asarray(np.stack(list(o) + list(d), -1)),
                jnp.asarray(a))

    @functools.partial(jax.jit, static_argnames=("k", "which"))
    def chain(scene, pack, a, salt, k, which):
        def body(i, acc):
            eps = (salt + i).astype(jnp.float32) * 1e-12
            o = (pack[:, 0] + eps, pack[:, 1], pack[:, 2])
            d = (pack[:, 3], pack[:, 4], pack[:, 5])
            if which == "pallas":
                r = pallas_traverse(scene, o, d, a, cfg)
            else:
                r = ray_traverse_fast(scene, o, d, a, cfg)
            return acc + jnp.sum(r.closest_t * (r.closest_t < cfg.t_max))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    def timed(fn, k, reps=3):
        float(fn(k=k))
        t0 = time.time()
        for r in range(reps):
            float(fn(k=k))
        return (time.time() - t0) / reps

    cases = [("pallas tile-order", order_tile, None, "pallas"),
             ("pallas sorted", order_sorted, None, "pallas"),
             ("pallas all-dead", order_tile, "dead", "pallas"),
             ("xla per-ray", order_tile, None, "xla")]
    for name, order, dead, which in cases:
        pack, a = packed(order)
        if dead == "dead":
            a = jnp.zeros_like(a)
        fn = functools.partial(chain, fs, pack, a, jnp.uint32(3),
                               which=which)
        if which == "xla":
            t_lo, t_hi, dk = timed(fn, 1), timed(fn, 2), 1
        else:
            t_lo, t_hi, dk = timed(fn, 2), timed(fn, 4), 2
        per = (t_hi - t_lo) / dk
        live = na if dead is None else 0
        print(f"{name:18s}: {per*1e3:7.2f} ms/traversal "
              f"({(live or P)/per/1e6:6.1f} Mrays/s of "
              f"{'live' if live else 'dead-overhead'})", flush=True)

    # primaries reference point (same harness)
    @functools.partial(jax.jit, static_argnames=("k",))
    def chain_prim(scene, u, salt, k):
        def body(i, acc):
            s = initial_seed(u, cfg, pixj, 0) ^ (salt + i)
            s, o, d = make_primary_rays(u, cfg, s, xxt, yyt, 720)
            r = pallas_traverse(scene, o, d, ones, cfg)
            return acc + jnp.sum(r.closest_t * (r.closest_t < cfg.t_max))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))
    fn = functools.partial(chain_prim, fs, uni, jnp.uint32(5))
    t2, t4 = timed(fn, 2), timed(fn, 4)
    per = (t4 - t2) / 2
    print(f"pallas primaries  : {per*1e3:7.2f} ms/traversal "
          f"({P/per/1e6:6.1f} Mrays/s)", flush=True)


if __name__ == "__main__":
    main()
