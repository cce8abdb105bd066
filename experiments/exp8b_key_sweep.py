"""exp8b: sort-key sweep for bounce-1 coherence (CPU counts).

exp8 found oct_morton = 321 union-iters per live-K-rays vs tile 421 and
per-ray ideal 11.6. Try keys that weight direction more finely.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from exp6_pallas_trace import tile_order
from exp8_bounce_coherence import (GROUP, counted_group_walk, eval_ordering,
                                   morton)
from raytracer_tpu.core.camera import default_camera
from raytracer_tpu.core.types import RenderConfig
from raytracer_tpu.kernels.packet import ray_traverse_fast
from raytracer_tpu.kernels.tracer import (initial_seed, make_primary_rays,
                                          shade)


def interleave(cols, bits):
    """Interleave len(cols) integer arrays, `bits` bits each."""
    n = len(cols)
    code = np.zeros(cols[0].shape[0], np.uint64)
    for b in range(bits):
        for i, c in enumerate(cols):
            code |= ((c.astype(np.uint64) >> np.uint64(b)) & np.uint64(1)) \
                << np.uint64(n * b + i)
    return code


def quant(v, lo, hi, bits):
    q = ((v - lo) / (hi - lo + 1e-9) * (2 ** bits - 1))
    return np.clip(q, 0, 2 ** bits - 1).astype(np.uint64)


def main():
    from __graft_entry__ import _flagship_scene
    fs = _flagship_scene()
    smin = np.asarray(fs.nodes8[0, 0:3])
    smax = np.asarray(fs.nodes8[0, 3:6])
    W, H = 1280, 144
    p = W * H
    cfg = RenderConfig(width=W, height=H)
    cam = default_camera(1280, 720)
    uni = cam.uniforms()
    ty, tx = tile_order(H, W, 16, 64)
    yy, xx = jnp.asarray(ty + 288), jnp.asarray(tx)
    pix = (yy * W + xx).astype(jnp.uint32)
    seed = initial_seed(uni, cfg, pix, 0)
    seed, ro, rd = make_primary_rays(uni, cfg, seed, xx, yy, 720)
    alive = jnp.ones((p,), bool)
    res = ray_traverse_fast(fs, ro, rd, alive, cfg)
    zero = jnp.zeros((p,), jnp.float32)
    one = jnp.ones((p,), jnp.float32)
    ro1, rd1, col, att, seed, alive1 = shade(
        res, ro, rd, (zero,)*3, (one,)*3, seed, alive, jnp.bool_(True), cfg)
    na = int(np.asarray(alive1).sum())
    print(f"bounce 1: {na}/{p} alive; ideal 11.6/ray; "
          "oct_morton was 321.6/K, tile 421.3/K", flush=True)

    o3 = np.stack([np.asarray(c) for c in ro1], -1)
    d3 = np.stack([np.asarray(c) for c in rd1], -1)
    al = np.asarray(alive1)
    dead = (~al).astype(np.uint64) << np.uint64(62)
    octant = ((d3[:, 0] > 0).astype(np.uint64)
              | ((d3[:, 1] > 0).astype(np.uint64) << np.uint64(1))
              | ((d3[:, 2] > 0).astype(np.uint64) << np.uint64(2)))

    qo = [quant(o3[:, ax], smin[ax], smax[ax], 8) for ax in range(3)]
    qd = [quant(d3[:, ax], -1.0, 1.0, 8) for ax in range(3)]

    keys = {
        # 6-way interleave of position+direction, 8 bits each
        "pd_interleave8": interleave(qo + qd, 8),
        # octant then position/direction interleave 4 bits each
        "oct_pd4": (octant << np.uint64(24))
        | interleave([q >> np.uint64(4) for q in qo + qd], 4),
        # direction-major: 5-bit dir morton, then 6-bit origin morton
        "dir5_org6": (octant << np.uint64(33))
        | (interleave([q >> np.uint64(3) for q in qd], 5) << np.uint64(18))
        | interleave([q >> np.uint64(2) for q in qo], 6),
        # origin-major fine: 8-bit origin morton then 6-bit dir
        "org8_dir6": (interleave(qo, 8) << np.uint64(18))
        | interleave([q >> np.uint64(2) for q in qd], 6),
        # oct + origin morton 7 + dir 4
        "oct_org7_dir4": (octant << np.uint64(33))
        | (interleave([q >> np.uint64(1) for q in qo], 7) << np.uint64(12))
        | interleave([q >> np.uint64(4) for q in qd], 4),
    }
    for name, key in keys.items():
        order = np.argsort(dead | key, kind="stable")
        eval_ordering(name, fs, ro1, rd1, alive1, order, cfg)


if __name__ == "__main__":
    main()
