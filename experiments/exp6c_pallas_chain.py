"""exp6c: true Pallas traversal cost via chained in-jit dispatches.

Marginal cost of K vs 2K chained traversals inside one jit (per-iteration
seed change defeats memoization; single readback at the end) — isolates
kernel time from the ~37 ms tunnel RTT.
"""
import sys, time, os, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from exp6_pallas_trace import tile_order


def main():
    from raytracer_tpu.core.camera import default_camera
    from raytracer_tpu.core.types import RenderConfig
    from raytracer_tpu.kernels.pallas_trace import pallas_traverse
    from raytracer_tpu.kernels.tracer import make_primary_rays, initial_seed
    from __graft_entry__ import _flagship_scene

    print("devices:", jax.devices(), flush=True)
    fs = _flagship_scene()
    W, H = 1280, 144
    cfg = RenderConfig(width=W, height=H)
    cam = default_camera(1280, 720)
    uni = cam.uniforms()
    ty, tx = tile_order(H, W, 16, 64)
    yyt = jnp.asarray(ty + 288)
    xxt = jnp.asarray(tx)
    pixj = (yyt * W + xxt).astype(jnp.uint32)
    active = jnp.ones((W * H,), bool)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(scene, u, base, k):
        def body(i, acc):
            s = initial_seed(u, cfg, pixj, 0) ^ (base + i)
            s, o, d = make_primary_rays(u, cfg, s, xxt, yyt, 720)
            r = pallas_traverse(scene, o, d, active, cfg)
            return acc + jnp.sum(r.closest_t * (r.closest_t < cfg.t_max))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    def timed(k, reps=4):
        float(chain(fs, uni, jnp.uint32(0), k))  # warm/compile
        t0 = time.time()
        acc = 0.0
        for r in range(reps):
            acc += float(chain(fs, uni, jnp.uint32(1000 + r), k))
        return (time.time() - t0) / reps

    t4 = timed(4)
    t8 = timed(8)
    per = (t8 - t4) / 4
    print(f"k=4: {t4*1e3:.1f} ms  k=8: {t8*1e3:.1f} ms  "
          f"marginal {per*1e3:.2f} ms/traversal "
          f"= {W*H/per/1e6:.0f} Mrays/s (primary, 184k band)", flush=True)


if __name__ == "__main__":
    main()
