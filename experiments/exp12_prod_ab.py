"""exp12: production-kernel A/B — node_src (extract|pack) x sort key.

Measures the *shipped* pallas_traverse (8 outputs, valid-masking) on the
184k-ray flagship band, after exp11 showed the packed-row SMEM node fetch
1.8x faster on sorted bounce-1 in a 1-output harness. Also compares the
round sort keys (pd5 vs oct_morton) on the bounce-1 population since key
order changes the union walk the kernel actually does.
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

LANES = 128


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
    ty, tx = tile_order(H, W, 16, 256)
    yyt, xxt = jnp.asarray(ty + 288), jnp.asarray(tx)
    pixj = (yyt * W + xxt).astype(jnp.uint32)
    ones = jnp.ones((P,), bool)

    @functools.partial(jax.jit, static_argnames=("key_mode",))
    def gen(scene, u, key_mode):
        s = initial_seed(u, cfg, pixj, 0)
        s, o, d = make_primary_rays(u, cfg, s, xxt, yyt, 720)
        r = pallas_traverse(scene, o, d, ones, cfg)
        zero = jnp.zeros((P,), jnp.float32)
        one = jnp.ones((P,), jnp.float32)
        o1, d1, col, att, s, alive1 = shade(
            r, o, d, (zero,)*3, (one,)*3, s, ones, jnp.bool_(True), cfg)
        smin = tuple(scene.nodes8[0, ax] for ax in range(3))
        smax = tuple(scene.nodes8[0, 3 + ax] for ax in range(3))
        order = jnp.argsort(sort_key(o1, d1, alive1, smin, smax, key_mode))
        o1 = tuple(jnp.take(c, order) for c in o1)
        d1 = tuple(jnp.take(c, order) for c in d1)
        alive1 = jnp.take(alive1, order)
        return o, d, o1, d1, alive1

    po, pd, b1o_p, b1d_p, b1a_p = gen(fs, uni, "pd5")
    _, _, b1o_m, b1d_m, b1a_m = gen(fs, uni, "oct_morton")

    pops = {
        "primaries": (po, pd, ones, 32),
        "b1 pd5": (b1o_p, b1d_p, b1a_p, 16),
        "b1 octm": (b1o_m, b1d_m, b1a_m, 16),
    }

    @functools.partial(jax.jit, static_argnames=("k", "src", "sub"))
    def chain(o, d, a, salt, k, src, sub):
        def body(i, acc):
            oo = (o[0] + (salt + i).astype(jnp.float32) * 1e-12, o[1], o[2])
            r = pallas_traverse(fs, oo, d, a, cfg, sublanes=sub,
                                node_src=src)
            return acc + jnp.sum(r.closest_t * r.hit)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    def timed(fn, k, reps=3):
        float(fn(k=k))
        t0 = time.time()
        for _ in range(reps):
            float(fn(k=k))
        return (time.time() - t0) / reps

    for src in ("extract", "pack"):
        for name, (o, d, a, sub) in pops.items():
            fn = functools.partial(chain, o, d, a, jnp.uint32(3),
                                   src=src, sub=sub)
            t2, t4 = timed(fn, 2), timed(fn, 4)
            per = (t4 - t2) / 2
            n_live = int(np.asarray(a).sum())
            print(f"{src:8s} {name:10s}: {per*1e3:7.2f} ms "
                  f"({n_live/per/1e6:6.1f} Mrays/s live)", flush=True)


if __name__ == "__main__":
    main()
