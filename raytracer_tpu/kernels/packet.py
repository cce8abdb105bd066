"""Packet path tracer: the TPU fast path.

Where ``kernels/tracer.py`` walks the BVH with a per-ray node pointer
(faithful to the GLSL thread-per-pixel model), this kernel walks it with a
**per-group** pointer: a group of rays descends as a unit into any node
*any* of its rays wants, and every ray in the group runs a dense
8-triangle Möller–Trumbore test at each visited leaf. Groups are 8x8 pixel
tiles for the primary bounce (the reference's workgroup shape,
``compute_dynamic_ray.comp:157``) and sorted 16-ray packets for scattered
bounces.

Why this is the right shape for TPU (measurements in PERF_NOTES.md):
* node fetches become gathers of [n_groups, 8] rows instead of
  [n_rays, ...] — 16-64x less gather traffic (gathers are the scarce
  resource; there is no gather hardware);
* per-ray work (AABB + MT) is dense, regular 8x128-lane VPU math with no
  indexing at all;
* group traversal cost is the *union* of its rays' walks, so between
  bounces rays are re-sorted by (dead, direction octant, origin cell):
  dead rays compact to the tail (whole groups exit instantly, and the
  traversal runs on a narrower prefix bucket), live rays regain coherence;
* correctness does not depend on grouping: AABB tests are only a traversal
  filter, and strict ``t < closest_t`` comparisons make the closest hit
  independent of visit order — results match the per-ray tracer (and the
  GLSL reference) to float precision.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from raytracer_tpu.core.fast_types import (CLUSTER_SIZE, FastScene,
                                           TRI_STRIDE)
from raytracer_tpu.core.types import CameraUniforms, RenderConfig
from raytracer_tpu.kernels import rng
from raytracer_tpu.kernels.tracer import _dot, _normalize, scatter, sky_color

TILE_H = 8
TILE_W = 8
TILE = TILE_H * TILE_W          # primary-bounce group: one 8x8 pixel tile
BOUNCE_GROUP = 16               # scattered-bounce group (sorted rays)
# Traversal width buckets (fractions of the ray count) selected by the
# live-ray count after compaction sorting; each is a separately compiled
# branch of the same traversal.
BUCKETS = (1, 4, 16)
# Tree steps per while-loop iteration (amortizes fixed per-iteration cost).
TRAVERSE_UNROLL = 4


class PacketHit(NamedTuple):
    closest_t: jnp.ndarray  # f32[NG, G]
    hit: jnp.ndarray        # bool[NG, G]
    normal: jnp.ndarray     # f32[NG, G, 3]
    mat: jnp.ndarray        # f32[NG, G, 4] — albedo.rgb + type


def packet_traverse(scene: FastScene, ray_o, ray_d, active,
                    cfg: RenderConfig) -> PacketHit:
    """Closest-hit for grouped rays.

    Args: ray_o/ray_d f32[NG, G, 3], active bool[NG, G]. A group advances
    through the skip-link tree with one shared node pointer; fully inactive
    groups start at the sentinel and exit immediately.
    """
    ng, g = ray_o.shape[0], ray_o.shape[1]
    num_nodes = scene.num_nodes

    inv_d = 1.0 / ray_d

    group_live = jnp.any(active, axis=1)
    node = jnp.where(group_live, jnp.int32(0), num_nodes)  # [NG]
    closest_t = jnp.full((ng, g), cfg.t_max, jnp.float32)
    normal = jnp.zeros((ng, g, 3), jnp.float32)
    mat = jnp.zeros((ng, g, 4), jnp.float32)

    def cond(c):
        return jnp.any(c[0] < num_nodes)

    def body(c):
        # Unrolled: several tree steps per while iteration amortize
        # fixed per-iteration costs (loop condition reduce + carry I/O).
        for _ in range(TRAVERSE_UNROLL):
            c = _step(c)
        return c

    def _step(c):
        node, closest_t, normal, mat = c
        in_flight = node < num_nodes
        safe = jnp.where(in_flight, node, 0)

        rows = jnp.take(scene.nodes8, safe, axis=0)     # [NG, 8]
        bmin = rows[:, None, 0:3]                       # [NG, 1, 3]
        bmax = rows[:, None, 3:6]
        skip = jax.lax.bitcast_convert_type(rows[:, 6], jnp.int32)
        leaf = jax.lax.bitcast_convert_type(rows[:, 7], jnp.int32)

        # Per-ray slab test against the group's node
        # (compute_dynamic_ray.comp:88-103 semantics).
        t0s = (bmin - ray_o) * inv_d
        t1s = (bmax - ray_o) * inv_d
        t_enter = jnp.max(jnp.minimum(t0s, t1s), axis=-1)  # [NG, G]
        t_exit = jnp.min(jnp.maximum(t0s, t1s), axis=-1)
        ray_hit = ((t_exit > t_enter) & (t_exit > cfg.t_min)
                   & (t_enter < closest_t) & active)
        group_hit = jnp.any(ray_hit, axis=1) & in_flight    # [NG]

        is_leaf = leaf >= 0
        do_leaf = group_hit & is_leaf

        # Dense MT over the leaf's 8 packed triangles, all rays at once
        # (compute_dynamic_ray.comp:105-129 semantics).
        crow = jnp.take(scene.clusters,
                        jnp.where(do_leaf, leaf, 0), axis=0)  # [NG, 128]
        tris = crow.reshape(ng, 1, CLUSTER_SIZE, TRI_STRIDE)
        v0 = tris[..., 0:3]
        e1 = tris[..., 3:6] - v0
        e2 = tris[..., 6:9] - v0
        rd = ray_d[:, :, None, :]                           # [NG,G,1,3]
        ro = ray_o[:, :, None, :]
        pvec = jnp.cross(rd, e2)
        det = jnp.sum(e1 * pvec, axis=-1)                   # [NG,G,8]
        ok = ~((det > -cfg.det_eps) & (det < cfg.det_eps))
        inv_det = 1.0 / jnp.where(ok, det, 1.0)
        s = ro - v0
        u = inv_det * jnp.sum(s * pvec, axis=-1)
        ok &= (u >= 0.0) & (u <= 1.0)
        qvec = jnp.cross(s, e1)
        v = inv_det * jnp.sum(rd * qvec, axis=-1)
        ok &= (v >= 0.0) & (u + v <= 1.0)
        t = inv_det * jnp.sum(e2 * qvec, axis=-1)
        ok &= (t > cfg.t_min) & (t < closest_t[..., None])
        ok &= do_leaf[:, None, None] & active[..., None]

        # Closest valid triangle within the cluster.
        t_masked = jnp.where(ok, t, jnp.inf)
        best = jnp.argmin(t_masked, axis=-1)                # [NG, G]
        best_ok = jnp.take_along_axis(ok, best[..., None],
                                      axis=-1)[..., 0]
        best_t = jnp.take_along_axis(t_masked, best[..., None],
                                     axis=-1)[..., 0]

        onehot = (jax.lax.broadcasted_iota(
            jnp.int32, (ng, g, CLUSTER_SIZE), 2) == best[..., None])
        sel = lambda x: jnp.sum(jnp.where(onehot[..., None], x, 0.0), axis=2)
        b_e1 = sel(jnp.broadcast_to(e1, (ng, g, CLUSTER_SIZE, 3)))
        b_e2 = sel(jnp.broadcast_to(e2, (ng, g, CLUSTER_SIZE, 3)))
        b_alb = sel(jnp.broadcast_to(tris[..., 9:12],
                                     (ng, g, CLUSTER_SIZE, 3)))
        b_typ = jnp.sum(jnp.where(onehot, tris[..., 12], 0.0), axis=2)

        n_raw = jnp.cross(b_e1, b_e2)
        n_len = jnp.sqrt(_dot(n_raw, n_raw))
        n_unit = n_raw / jnp.where(best_ok, n_len, 1.0)[..., None]
        n_unit = jnp.where(_dot(ray_d, n_unit)[..., None] > 0.0,
                           -n_unit, n_unit)

        closest_t = jnp.where(best_ok, best_t, closest_t)
        normal = jnp.where(best_ok[..., None], n_unit, normal)
        mat = jnp.where(best_ok[..., None],
                        jnp.concatenate([b_alb, b_typ[..., None]], -1), mat)

        descend = group_hit & ~is_leaf
        node = jnp.where(in_flight, jnp.where(descend, node + 1, skip),
                         node)
        return node, closest_t, normal, mat

    node, closest_t, normal, mat = jax.lax.while_loop(
        cond, body, (node, closest_t, normal, mat))
    hit = closest_t < cfg.t_max
    return PacketHit(closest_t, hit, normal, mat)


def _traverse_flat(scene, ray_o, ray_d, active, cfg, group):
    """packet_traverse over flat [P] rays grouped in `group`-sized packets."""
    p = ray_o.shape[0]
    shp = lambda x: x.reshape((p // group, group) + x.shape[1:])
    res = packet_traverse(scene, shp(ray_o), shp(ray_d), shp(active), cfg)
    return PacketHit(*(x.reshape((p,) + x.shape[2:]) for x in res))


def _traverse_bucketed(scene, ray_o, ray_d, active, alive_count, cfg):
    """Run bounce traversal on a prefix-width bucket chosen by live count.

    After compaction sorting, live rays occupy a prefix; traversing only
    the smallest sufficient prefix makes late (sparsely populated) bounces
    proportionally cheaper. Each bucket is its own compiled branch.
    """
    p = ray_o.shape[0]

    def make_branch(divisor):
        k = p // divisor

        def branch(args):
            ray_o, ray_d, active = args
            res = _traverse_flat(scene, ray_o[:k], ray_d[:k], active[:k],
                                 cfg, BOUNCE_GROUP)
            pad = p - k
            return PacketHit(
                jnp.concatenate(
                    [res.closest_t, jnp.full((pad,), cfg.t_max)], 0),
                jnp.concatenate([res.hit, jnp.zeros((pad,), bool)], 0),
                jnp.concatenate([res.normal, jnp.zeros((pad, 3))], 0),
                jnp.concatenate([res.mat, jnp.zeros((pad, 4))], 0),
            )
        return branch

    branches = [make_branch(d) for d in BUCKETS]
    # Pick the narrowest bucket that still covers all live rays.
    idx = jnp.int32(0)
    for i, d in enumerate(BUCKETS):
        idx = jnp.where(alive_count * d <= p, jnp.int32(i), idx)
    return jax.lax.switch(idx, branches, (ray_o, ray_d, active))


def _shade(res: PacketHit, ray_o, ray_d, color, atten, seed, alive,
           sky_on, cfg: RenderConfig):
    """Shared per-bounce shading over flat [P] rays: sky on miss, scatter /
    emit / absorb on hit. Returns the advanced ray state."""
    hit = alive & res.hit
    miss = alive & ~hit

    sky = jnp.where(sky_on, sky_color(ray_d), 0.0)
    color = jnp.where(miss[..., None], atten * sky, color)

    sc = scatter(seed, ray_d, res.normal, res.mat, hit, cfg)
    color = color + sc.emitted * atten
    hit_pos = ray_o + ray_d * res.closest_t[..., None]
    atten = jnp.where(sc.scattered[..., None], atten * sc.attenuation,
                      atten)
    ray_o = jnp.where(sc.scattered[..., None], hit_pos, ray_o)
    ray_d = jnp.where(sc.scattered[..., None], sc.new_dir, ray_d)
    return ray_o, ray_d, color, atten, sc.seed, sc.scattered


def _sort_rays(scene, ray_o, ray_d, color, atten, seed, alive, pix):
    """Compaction + coherence sort between bounces.

    Key = (dead, direction octant, origin Morton cell): dead rays move to
    the tail (group exits + narrow buckets), live rays regroup into
    coherent packets. One fused [P,12] f32 gather + one [P,...] i32 gather
    apply the permutation.
    """
    root_min = scene.nodes8[0, 0:3]
    root_max = scene.nodes8[0, 3:6]
    extent = jnp.maximum(root_max - root_min, 1e-6)
    cell = jnp.clip(((ray_o - root_min) / extent * 16.0).astype(jnp.int32),
                    0, 15)
    morton = cell[:, 0] * 256 + cell[:, 1] * 16 + cell[:, 2]  # 12 bits
    octant = ((ray_d[:, 0] > 0).astype(jnp.int32) * 4
              + (ray_d[:, 1] > 0).astype(jnp.int32) * 2
              + (ray_d[:, 2] > 0).astype(jnp.int32))
    key = (jnp.where(alive, 0, 1 << 30)
           + octant * (1 << 26) + morton * (1 << 14)).astype(jnp.int32)
    perm = jnp.argsort(key, stable=True)

    fstate = jnp.concatenate([ray_o, ray_d, color, atten], axis=1)  # [P,12]
    fstate = jnp.take(fstate, perm, axis=0)
    istate = jnp.stack([seed.astype(jnp.int32), pix,
                        alive.astype(jnp.int32)], axis=1)
    istate = jnp.take(istate, perm, axis=0)
    return (fstate[:, 0:3], fstate[:, 3:6], fstate[:, 6:9], fstate[:, 9:12],
            istate[:, 0].astype(jnp.uint32), istate[:, 1],
            istate[:, 2] > 0)


def _to_tiles(a, h, w):
    """[H, W, ...] -> [NT, TILE, ...] (8x8 pixel tiles)."""
    rest = a.shape[2:]
    return (a.reshape(h // TILE_H, TILE_H, w // TILE_W, TILE_W, *rest)
            .swapaxes(1, 2)
            .reshape((h // TILE_H) * (w // TILE_W), TILE, *rest))


def _from_tiles(a, h, w):
    rest = a.shape[2:]
    return (a.reshape(h // TILE_H, w // TILE_W, TILE_H, TILE_W, *rest)
            .swapaxes(1, 2)
            .reshape(h, w, *rest))


def render_linear_fast(scene: FastScene, cam: CameraUniforms,
                       cfg: RenderConfig, sample_index: jnp.ndarray | int = 0):
    """Hybrid fast frame.

    Bounce 0: packet traversal over 8x8 pixel tiles (coherent).
    Bounces 1+: compaction/coherence sort, then 16-ray packet traversal on
    the narrowest sufficient width bucket. Sampling and shading semantics
    are identical to tracer.render_linear.
    """
    if cfg.height % TILE_H or cfg.width % TILE_W:
        raise ValueError("fast path needs resolution divisible by 8")
    h, w = cfg.height, cfg.width
    p = h * w

    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    pixel = (yy * w + xx).astype(jnp.uint32)

    if cfg.rng_mode == "reference":
        seed = pixel
    else:
        stream = (cam.frame_count.astype(jnp.uint32)
                  * jnp.uint32(cfg.samples_per_pixel)
                  + jnp.uint32(sample_index) + jnp.uint32(1))
        seed = pixel ^ rng.pcg(stream * jnp.uint32(0x9E3779B9))

    # Flat state in tile-major order; `pix` tracks each ray's flat
    # tile-major pixel slot across sorts.
    seed = _to_tiles(seed, h, w).reshape(p)
    yy_t = _to_tiles(yy, h, w).reshape(p)
    xx_t = _to_tiles(xx, h, w).reshape(p)
    pix = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0).reshape(p)

    all_on = jnp.ones((p,), bool)
    seed, ju = rng.random_float(seed, all_on)
    seed, jv = rng.random_float(seed, all_on)
    u = (xx_t.astype(jnp.float32) + ju) / jnp.float32(w)
    v = ((jnp.float32(h - 1) - yy_t.astype(jnp.float32)) + jv) / jnp.float32(h)

    ray_o = jnp.broadcast_to(cam.origin, (p, 3))
    ray_d = _normalize(cam.lower_left_corner
                       + u[..., None] * cam.horizontal
                       + v[..., None] * cam.vertical
                       - cam.origin)

    color = jnp.zeros((p, 3), jnp.float32)
    atten = jnp.ones((p, 3), jnp.float32)
    sky_on = cam.sky_enabled > 0

    # --- Bounce 0: packet traversal over pixel tiles. ---
    res = _traverse_flat(scene, ray_o, ray_d, all_on, cfg, TILE)
    ray_o, ray_d, color, atten, seed, alive = _shade(
        res, ray_o, ray_d, color, atten, seed, all_on, sky_on, cfg)
    rays_traced = jnp.float32(p)

    # --- Bounces 1..max-1: sort -> bucketed packet traversal -> shade. ---
    def bounce_cond(c):
        return (c[7] < cfg.max_bounces) & jnp.any(c[5])

    def bounce_body(c):
        ray_o, ray_d, color, atten, seed, alive, pix, b, rays = c
        alive_count = jnp.sum(alive.astype(jnp.int32))
        rays = rays + alive_count.astype(jnp.float32)

        ray_o, ray_d, color, atten, seed, pix, alive = _sort_rays(
            scene, ray_o, ray_d, color, atten, seed, alive, pix)
        res = _traverse_bucketed(scene, ray_o, ray_d, alive, alive_count,
                                 cfg)
        ray_o, ray_d, color, atten, seed, alive = _shade(
            res, ray_o, ray_d, color, atten, seed, alive, sky_on, cfg)
        return ray_o, ray_d, color, atten, seed, alive, pix, b + 1, rays

    carry = (ray_o, ray_d, color, atten, seed, alive, pix, jnp.int32(1),
             rays_traced)
    (_, _, color, _, _, _, pix, bounces, rays) = jax.lax.while_loop(
        bounce_cond, bounce_body, carry)

    # Un-permute ray colors back to pixel slots.
    image = jnp.zeros((p, 3), jnp.float32).at[pix].set(
        color, unique_indices=True, mode="promise_in_bounds")

    stats = {"rays_traced": rays, "bounce_iters": bounces}
    return _from_tiles(image.reshape(p // TILE, TILE, 3), h, w), stats
