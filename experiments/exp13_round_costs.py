"""exp13: what does a wavefront round cost besides traversal?

Times the three component programs of a bounce round separately on the
184k flagship band (salted chains; traversal itself measured 10.4 ms at
S=32 pack, exp12b):

  sortperm   key + argsort + 12-col f32 take + 3-col i32 take + unpack
  shade      tracer.shade on a traversal result (masked elementwise + RNG)
  cond       the level-loop predicate (alive popcount reduction)
"""
import sys, time, os, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from exp6_pallas_trace import tile_order
from raytracer_tpu.core.types import RenderConfig
from raytracer_tpu.kernels.pallas_trace import pallas_traverse
from raytracer_tpu.kernels.wavefront import sort_key


def main():
    from raytracer_tpu.core.camera import default_camera
    from raytracer_tpu.kernels.tracer import (initial_seed,
                                              make_primary_rays, shade)
    from __graft_entry__ import _flagship_scene

    print("devices:", jax.devices(), flush=True)
    fs = _flagship_scene()
    W, H = 1280, 144
    P = W * H
    cfg = RenderConfig(width=W, height=H)
    cam = default_camera(1280, 720)
    uni = cam.uniforms()
    ty, tx = tile_order(H, W, 16, 128)
    yyt, xxt = jnp.asarray(ty + 288), jnp.asarray(tx)
    pixj = (yyt * W + xxt).astype(jnp.uint32)
    ones = jnp.ones((P,), bool)

    @jax.jit
    def gen(scene, u):
        s = initial_seed(u, cfg, pixj, 0)
        s, o, d = make_primary_rays(u, cfg, s, xxt, yyt, 720)
        r = pallas_traverse(scene, o, d, ones, cfg)
        zero = jnp.zeros((P,), jnp.float32)
        one = jnp.ones((P,), jnp.float32)
        o1, d1, col, att, s, alive1 = shade(
            r, o, d, (zero,)*3, (one,)*3, s, ones, jnp.bool_(True), cfg)
        return o1, d1, col, att, s, alive1, r

    o1, d1, col, att, seed, alive1, res = gen(fs, uni)
    smin = tuple(fs.nodes8[0, ax] for ax in range(3))
    smax = tuple(fs.nodes8[0, 3 + ax] for ax in range(3))
    pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0).reshape(P)

    from raytracer_tpu.kernels.wavefront import (_pack_state, _sort_state,
                                                 _unpack_state)

    @functools.partial(jax.jit, static_argnames=("k",))
    def sortperm(o, d, c, a, s, al, px, salt, k):
        def body(i, carry):
            o, d, c, a, s, al, px, acc = carry
            o = (o[0] + (salt + i).astype(jnp.float32) * 1e-12, o[1], o[2])
            key = sort_key(o, d, al, smin, smax, "pd5")
            st = _pack_state(o, d, c, a, s, px, al)
            st = _sort_state(st, key)
            o, d, c, a, s, px, al = _unpack_state(st)
            return o, d, c, a, s, al, px, acc + jnp.sum(st[:, 0])
        init = (o, d, c, a, s, al, px, jnp.float32(0))
        return jax.lax.fori_loop(0, k, body, init)[-1]

    @functools.partial(jax.jit, static_argnames=("k",))
    def shade_chain(r, o, d, c, a, s, al, salt, k):
        def body(i, carry):
            c, a, s, acc = carry
            rr = r._replace(closest_t=r.closest_t
                            + (salt + i).astype(jnp.float32) * 1e-12)
            o2, d2, c2, a2, s2, al2 = shade(rr, o, d, c, a, s, al,
                                            jnp.bool_(True), cfg)
            return c2, a2, s2, acc + jnp.sum(c2[0]) + jnp.sum(o2[0])
        return jax.lax.fori_loop(0, k, body,
                                 (c, a, s, jnp.float32(0)))[-1]

    @functools.partial(jax.jit, static_argnames=("k",))
    def cond_chain(al, salt, k):
        def body(i, acc):
            live = jnp.sum((al ^ (i % 2 == 1)).astype(jnp.int32))
            return acc + live
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    def timed(fn, k, reps=3):
        float(fn(k=k))
        t0 = time.time()
        for _ in range(reps):
            float(fn(k=k))
        return (time.time() - t0) / reps

    fns = {
        "sortpkt": functools.partial(sortperm, o1, d1, col, att, seed,
                                     alive1, pix, jnp.uint32(3)),
        "shade": functools.partial(shade_chain, res, o1, d1, col, att,
                                   seed, alive1, jnp.uint32(3)),
        "cond": functools.partial(cond_chain, alive1, jnp.uint32(3)),
    }
    for name, fn in fns.items():
        t2, t8 = timed(fn, 2), timed(fn, 8)
        per = (t8 - t2) / 6
        print(f"{name:9s}: {per*1e3:7.3f} ms/round", flush=True)


if __name__ == "__main__":
    main()
