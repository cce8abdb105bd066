"""exp8: how coherent can bounce rays be made for per-tile traversal?

The Pallas kernel walks the BVH with one node pointer per 1024-ray tile;
its cost is sum-over-tiles of each tile's *union* walk length. This
experiment measures that union work for real bounce-1/2 ray populations of
the flagship scene under candidate orderings (CPU backend, no TPU):

  tile          rays stay in their primary 32x32 pixel tile (no sort)
  oct_in_tile   stable-sorted by direction octant within each tile
  oct_morton    global sort by (alive, direction octant, morton(origin))
  morton_oct    global sort by (alive, morton(origin), direction octant)
  morton6_oct   coarse 6-bit-per-axis morton first, then octant

Work metric: instrumented per-group walk counting in-flight group
iterations (internal) and leaf iterations separately — exactly the
sequential-grid cost the Pallas kernel pays. The per-ray walk gives the
ideal lower bound.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from raytracer_tpu.core.camera import default_camera
from raytracer_tpu.core.types import RenderConfig
from raytracer_tpu.kernels.packet import ray_traverse_fast, _cluster_mt
from raytracer_tpu.kernels.tracer import (initial_seed, make_primary_rays,
                                          shade)

GROUP = 1024


def counted_group_walk(scene, ray_o, ray_d, active, cfg):
    """packet_traverse with (internal_iters, leaf_iters) counters; groups on
    the trailing axis, [GROUP, NT]."""
    g, ng = ray_o[0].shape
    num_nodes = scene.num_nodes
    inv_d = (1.0 / ray_d[0], 1.0 / ray_d[1], 1.0 / ray_d[2])
    group_live = jnp.any(active, axis=0)
    node = jnp.where(group_live, jnp.int32(0), num_nodes)
    closest_t = jnp.full((g, ng), cfg.t_max, jnp.float32)
    zero = jnp.zeros((g, ng), jnp.float32)
    state = (zero,) * 7

    def cond(c):
        return jnp.any(c[0] < num_nodes)

    def body(c):
        node, closest_t, state, n_int, n_leaf = c
        in_flight = node < num_nodes
        safe = jnp.where(in_flight, node, 0)
        rows = jnp.take(scene.nodes8, safe, axis=0)
        skip = jax.lax.bitcast_convert_type(rows[:, 6], jnp.int32)
        leaf = jax.lax.bitcast_convert_type(rows[:, 7], jnp.int32)
        left = -leaf - 1
        bmin = rows[None, :, 0:3]
        bmax = rows[None, :, 3:6]
        ro3 = jnp.stack(ray_o, axis=-1)
        inv3 = jnp.stack(inv_d, axis=-1)
        t0s = (bmin - ro3) * inv3
        t1s = (bmax - ro3) * inv3
        t_enter = jnp.max(jnp.minimum(t0s, t1s), axis=-1)
        t_exit = jnp.min(jnp.maximum(t0s, t1s), axis=-1)
        ray_hit = ((t_exit > t_enter) & (t_exit > cfg.t_min)
                   & (t_enter < closest_t) & active)
        group_hit = jnp.any(ray_hit, axis=0) & in_flight
        is_leaf = leaf >= 0
        do_leaf = group_hit & is_leaf
        crow = jnp.take(scene.clusters, jnp.where(do_leaf, leaf, 0), axis=0)
        closest_t, state = _cluster_mt(
            crow, ray_o, ray_d, closest_t, do_leaf[None, :] & active,
            state, cfg)
        descend = group_hit & ~is_leaf
        node = jnp.where(in_flight, jnp.where(descend, left, skip), node)
        n_int = n_int + jnp.sum(in_flight.astype(jnp.int32))
        n_leaf = n_leaf + jnp.sum(do_leaf.astype(jnp.int32))
        return node, closest_t, state, n_int, n_leaf

    node, closest_t, state, n_int, n_leaf = jax.lax.while_loop(
        cond, body, (node, closest_t, state, jnp.int32(0), jnp.int32(0)))
    return int(n_int), int(n_leaf)


def counted_ray_walk(scene, ray_o, ray_d, active, cfg):
    """Per-ray walk work: sum of in-flight per-ray iterations."""
    p = ray_o[0].shape[0]
    num_nodes = scene.num_nodes
    inv_d = (1.0 / ray_d[0], 1.0 / ray_d[1], 1.0 / ray_d[2])
    node = jnp.where(active, jnp.int32(0), num_nodes)
    closest_t = jnp.full((p,), cfg.t_max, jnp.float32)
    state = (jnp.zeros((p,), jnp.float32),) * 7

    def cond(c):
        return jnp.any(c[0] < num_nodes)

    def body(c):
        node, closest_t, state, n_int, n_leaf = c
        in_flight = node < num_nodes
        safe = jnp.where(in_flight, node, 0)
        rows = jnp.take(scene.nodes8, safe, axis=0)
        skip = jax.lax.bitcast_convert_type(rows[:, 6], jnp.int32)
        leaf = jax.lax.bitcast_convert_type(rows[:, 7], jnp.int32)
        left = -leaf - 1
        ro3 = jnp.stack(ray_o, axis=-1)
        inv3 = jnp.stack(inv_d, axis=-1)
        t0s = (rows[:, 0:3] - ro3) * inv3
        t1s = (rows[:, 3:6] - ro3) * inv3
        t_enter = jnp.max(jnp.minimum(t0s, t1s), axis=-1)
        t_exit = jnp.min(jnp.maximum(t0s, t1s), axis=-1)
        ray_hit = ((t_exit > t_enter) & (t_exit > cfg.t_min)
                   & (t_enter < closest_t) & in_flight & active)
        is_leaf = leaf >= 0
        do_leaf = ray_hit & is_leaf
        crow = jnp.take(scene.clusters, jnp.where(do_leaf, leaf, 0), axis=0)
        closest_t, state = _cluster_mt(
            crow, ray_o, ray_d, closest_t, do_leaf, state, cfg)
        descend = ray_hit & ~is_leaf
        node = jnp.where(in_flight, jnp.where(descend, left, skip), node)
        n_int = n_int + jnp.sum(in_flight.astype(jnp.int32))
        n_leaf = n_leaf + jnp.sum(do_leaf.astype(jnp.int32))
        return node, closest_t, state, n_int, n_leaf

    node, closest_t, state, n_int, n_leaf = jax.lax.while_loop(
        cond, body, (node, closest_t, state, jnp.int32(0), jnp.int32(0)))
    return int(n_int), int(n_leaf)


def morton(vals, bbox_min, bbox_max, bits):
    q = ((vals - bbox_min) / (bbox_max - bbox_min + 1e-9)
         * (2 ** bits - 1)).astype(np.uint64)
    q = np.clip(q, 0, 2 ** bits - 1)
    code = np.zeros(q.shape[0], np.uint64)
    for b in range(bits):
        for ax in range(3):
            code |= ((q[:, ax] >> np.uint64(b)) & np.uint64(1)) << \
                np.uint64(3 * b + ax)
    return code


def groupify(comps, order):
    """Reorder flat rays and shape as [GROUP, NT] (group on trailing axis,
    consecutive 1024 rays = one group column)."""
    p = comps[0].shape[0]
    nt = p // GROUP
    return tuple(jnp.asarray(np.asarray(c)[order].reshape(nt, GROUP).T)
                 for c in comps)


def eval_ordering(name, scene, ro, rd, alive, order, cfg):
    o = groupify(ro, order)
    d = groupify(rd, order)
    a = groupify((alive,), order)[0].astype(bool)
    t0 = time.time()
    n_int, n_leaf = counted_group_walk(scene, o, d, a, cfg)
    nt = ro[0].shape[0] // GROUP
    print(f"  {name:14s} internal={n_int:8d} leaf={n_leaf:7d} "
          f"per-live-K-rays: int={n_int/max(1,int(alive.sum()))*1024:7.1f} "
          f"({time.time()-t0:.0f}s)", flush=True)
    return n_int, n_leaf


def orderings(ro, rd, alive, p, smin, smax):
    o3 = np.stack([np.asarray(c) for c in ro], -1)
    d3 = np.stack([np.asarray(c) for c in rd], -1)
    al = np.asarray(alive)
    octant = ((d3[:, 0] > 0).astype(np.uint64)
              | ((d3[:, 1] > 0).astype(np.uint64) << np.uint64(1))
              | ((d3[:, 2] > 0).astype(np.uint64) << np.uint64(2)))
    m10 = morton(o3, smin, smax, 10)
    m6 = morton(o3, smin, smax, 6)
    dead = (~al).astype(np.uint64) << np.uint64(62)
    tile_id = (np.arange(p) // GROUP).astype(np.uint64)
    return {
        "tile": np.arange(p),
        "oct_in_tile": np.argsort(
            (tile_id << np.uint64(4)) | dead >> np.uint64(59) | octant,
            kind="stable"),
        "oct_morton": np.argsort(
            dead | (octant << np.uint64(30)) | m10, kind="stable"),
        "morton_oct": np.argsort(
            dead | (m10 << np.uint64(3)) | octant, kind="stable"),
        "morton6_oct": np.argsort(
            dead | (m6 << np.uint64(3)) | octant, kind="stable"),
    }


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

    # tile-major primaries (32x32 pixel tiles = 1024-ray groups)
    from exp6_pallas_trace import tile_order
    ty, tx = tile_order(H, W, 16, 64)
    yy = jnp.asarray(ty + 288)
    xx = jnp.asarray(tx)
    pix = (yy * W + xx).astype(jnp.uint32)
    seed = initial_seed(uni, cfg, pix, 0)
    seed, ro, rd = make_primary_rays(uni, cfg, seed, xx, yy, 720)
    alive = jnp.ones((p,), bool)

    print("== bounce 0 (primaries, tile-major) ==", flush=True)
    ident = np.arange(p)
    o = groupify(ro, ident); d = groupify(rd, ident)
    a = groupify((alive,), ident)[0].astype(bool)
    n_int, n_leaf = counted_group_walk(fs, o, d, a, cfg)
    print(f"  tile           internal={n_int:8d} leaf={n_leaf:7d}", flush=True)
    ri, rl = counted_ray_walk(fs, ro, rd, alive, cfg)
    print(f"  per-ray ideal  internal={ri:8d} leaf={rl:7d} "
          f"(={ri/p:.1f}/{rl/p:.2f} per ray)", flush=True)

    # advance to bounce 1
    res = ray_traverse_fast(fs, ro, rd, alive, cfg)
    zero = jnp.zeros((p,), jnp.float32); one = jnp.ones((p,), jnp.float32)
    ro1, rd1, col, att, seed, alive1 = shade(
        res, ro, rd, (zero,)*3, (one,)*3, seed, alive, jnp.bool_(True), cfg)
    na = int(np.asarray(alive1).sum())
    print(f"== bounce 1: {na}/{p} alive ==", flush=True)
    for name, order in orderings(ro1, rd1, alive1, p, smin, smax).items():
        eval_ordering(name, fs, ro1, rd1, alive1, order, cfg)
    ri, rl = counted_ray_walk(fs, ro1, rd1, alive1, cfg)
    print(f"  per-ray ideal  internal={ri:8d} leaf={rl:7d} "
          f"(={ri/max(1,na):.1f} per live ray)", flush=True)

    # advance to bounce 2
    res1 = ray_traverse_fast(fs, ro1, rd1, alive1, cfg)
    ro2, rd2, col, att, seed, alive2 = shade(
        res1, ro1, rd1, col, att, seed, alive1, jnp.bool_(True), cfg)
    na2 = int(np.asarray(alive2).sum())
    print(f"== bounce 2: {na2}/{p} alive ==", flush=True)
    for name, order in orderings(ro2, rd2, alive2, p, smin, smax).items():
        if name == "oct_in_tile":
            continue
        eval_ordering(name, fs, ro2, rd2, alive2, order, cfg)
    ri, rl = counted_ray_walk(fs, ro2, rd2, alive2, cfg)
    print(f"  per-ray ideal  internal={ri:8d} leaf={rl:7d} "
          f"(={ri/max(1,na2):.1f} per live ray)", flush=True)


if __name__ == "__main__":
    main()
