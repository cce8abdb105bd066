"""exp8c: union-walk iterations vs walk-group size (CPU counts).

The Pallas kernel walks one pointer per 1024-ray tile. Smaller groups =
fewer wasted union visits per ray but more scalar work per block. This
measures the iteration side: total union internal/leaf iterations for
group sizes 2048..128 on sorted bounce-1 rays and tile-major primaries
(flagship band). Work model: a [8,128] block holding G-ray groups runs
1024/G walks; kernel iterations ~ sum over groups of union length
(sequential grid) regardless of G, so totals compare directly.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from exp6_pallas_trace import tile_order
from exp8_bounce_coherence import counted_group_walk
from exp8b_key_sweep import interleave, quant
from raytracer_tpu.core.camera import default_camera
from raytracer_tpu.core.types import RenderConfig
from raytracer_tpu.kernels.packet import ray_traverse_fast
from raytracer_tpu.kernels.tracer import (initial_seed, make_primary_rays,
                                          shade)


def run(name, fs, ro, rd, alive, order, cfg, group):
    p = ro[0].shape[0]
    nt = p // group
    def g(c):
        return jnp.asarray(np.asarray(c)[order].reshape(nt, group).T)
    o = tuple(g(c) for c in ro)
    d = tuple(g(c) for c in rd)
    a = g(alive).astype(bool)
    t0 = time.time()
    n_int, n_leaf = counted_group_walk(fs, o, d, a, cfg)
    print(f"  {name:10s} group={group:5d}: internal={n_int:8d} "
          f"leaf={n_leaf:7d} ({time.time()-t0:.0f}s)", flush=True)


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

    ident = np.arange(p)
    print("primaries (tile-major order):", flush=True)
    for group in (2048, 1024, 512, 256, 128):
        run("primary", fs, ro, rd, alive, ident, cfg, group)

    # bounce-1 sorted by the best key from exp8b (6-way pos+dir interleave)
    o3 = np.stack([np.asarray(c) for c in ro1], -1)
    d3 = np.stack([np.asarray(c) for c in rd1], -1)
    al = np.asarray(alive1)
    qo = [quant(o3[:, ax], smin[ax], smax[ax], 8) for ax in range(3)]
    qd = [quant(d3[:, ax], -1.0, 1.0, 8) for ax in range(3)]
    key = ((~al).astype(np.uint64) << np.uint64(62)) | interleave(qo + qd, 8)
    order = np.argsort(key, kind="stable")
    print("bounce-1 (pd_interleave8 sorted):", flush=True)
    for group in (2048, 1024, 512, 256, 128):
        run("bounce1", fs, ro1, rd1, alive1, order, cfg, group)


if __name__ == "__main__":
    main()
