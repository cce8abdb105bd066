"""Packet path tracer: the TPU fast path.

Where ``kernels/tracer.py`` walks the BVH with a per-ray node pointer
(faithful to the GLSL thread-per-pixel model), this kernel walks it with a
**per-group** pointer: a group of rays descends as a unit into any node
*any* of its rays wants, and every ray in the group runs a dense
8-triangle Möller–Trumbore test at each visited leaf. Groups are 8x8 pixel
tiles for the primary bounce (the reference's workgroup shape,
``compute_dynamic_ray.comp:157``); scattered bounces fall back to per-ray
pointers (diffuse rays are so incoherent that a group's union walk visits
~20x more nodes than any single ray — measured, PERF_NOTES.md).

Layout rules (PERF_NOTES.md): every array keeps a large dimension
minormost. Packet-phase state is [G, NG] (lanes = group count, thousands);
bounce-phase state is flat [P]. Vectors are SoA component tuples
(kernels/vec.py). Node fetches gather one [*, 8] fat row per group; leaf
fetches gather one [*, 128] row carrying 8 triangles + materials, and the
MT test unrolls over the 8 cluster slots with a running closest-t min —
the same first-wins tie-breaking as the GLSL sequential loop.

Correctness does not depend on grouping: AABB tests are only a traversal
filter, and strict ``t < closest_t`` comparisons make the closest hit
independent of visit order — results match the per-ray tracer (and the
GLSL reference) to float precision.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracer_tpu.core.fast_types import (CLUSTER_SIZE, FastScene,
                                           SUBS_PER_ROW, TRI_STRIDE)
from raytracer_tpu.core.types import CameraUniforms, RenderConfig
from raytracer_tpu.kernels import vec
from raytracer_tpu.kernels.tracer import (TraversalResult, initial_seed,
                                          make_primary_rays, shade)

TILE_H = 8
TILE_W = 8
TILE = TILE_H * TILE_W          # primary-bounce group: one 8x8 pixel tile
# Tree steps per while-loop iteration (amortizes fixed per-iteration cost;
# larger values also multiply compile time of the unrolled MT graph).
import os as _os

TRAVERSE_UNROLL = int(_os.environ.get("RAYTPU_TRAVERSE_UNROLL", "2"))


def _leaf_rows(clusters):
    """Leaf-major view of the cluster table: [L, CLUSTER_SIZE * 16].

    The device table keeps 128-float rows at every CLUSTER_SIZE (Mosaic
    VMEM tiling — core/fast_types.py); for the XLA gather paths a free
    contiguous reshape regroups it so row index == leaf cid again.
    """
    if SUBS_PER_ROW == 1:
        return clusters
    return clusters.reshape(-1, CLUSTER_SIZE * TRI_STRIDE)


def _cluster_mt(crow, ray_o, ray_d, closest_t, gate, state, cfg):
    """Dense MT of every ray against one 128-float cluster row per group.

    Access pattern matters enormously on this backend: reshape+trailing-dim
    slices of the gathered row are ~84x faster than per-column extracts
    (PERF_NOTES.md), so triangle data is handled AoS ([N, 8, 16]) while the
    ray state stays SoA. MT edges and unit geometric normals are
    precomputed in the cluster record (pack time, core/fast_types.py); the
    closest-of-8 selection uses argmin + one-hot over the trailing 8-axis
    (argmin takes the lowest index on ties = GLSL's sequential first-wins).

    crow: f32[N, 128]; ray comps f32[..., N] (either [P] or [G, NG]);
    state = (nx, ny, nz, ar, ag, ab, mt) accumulators shaped like rays.
    """
    n = crow.shape[0]
    tris = crow.reshape(n, CLUSTER_SIZE, TRI_STRIDE)
    v0 = tris[..., 0:3]                        # [N, 8, 3]
    e1 = tris[..., 3:6]                        # precomputed v1 - v0
    e2 = tris[..., 6:9]                        # precomputed v2 - v0
    n_pre = tris[..., 13:16]                   # precomputed unit normal

    packet = ray_o[0].ndim == 2  # [G, NG] vs [P]
    if packet:
        ro = jnp.stack(ray_o, axis=-1)[:, :, None, :]   # [G, NG, 1, 3]
        rd = jnp.stack(ray_d, axis=-1)[:, :, None, :]
        tri_b = lambda x: x[None]                       # [1, N, 8, ...]
    else:
        ro = jnp.stack(ray_o, axis=-1)[:, None, :]      # [P, 1, 3]
        rd = jnp.stack(ray_d, axis=-1)[:, None, :]
        tri_b = lambda x: x

    pvec = jnp.cross(rd, tri_b(e2))
    det = jnp.sum(tri_b(e1) * pvec, axis=-1)            # [..., 8]
    ok = ~((det > -cfg.det_eps) & (det < cfg.det_eps))
    inv_det = 1.0 / jnp.where(ok, det, 1.0)
    s = ro - tri_b(v0)
    u = inv_det * jnp.sum(s * pvec, axis=-1)
    ok &= (u >= 0.0) & (u <= 1.0)
    qvec = jnp.cross(s, tri_b(e1))
    v = inv_det * jnp.sum(rd * qvec, axis=-1)
    ok &= (v >= 0.0) & (u + v <= 1.0)
    t = inv_det * jnp.sum(tri_b(e2) * qvec, axis=-1)
    ok &= (t > cfg.t_min) & (t < closest_t[..., None]) & gate[..., None]

    t_masked = jnp.where(ok, t, jnp.inf)
    best = jnp.argmin(t_masked, axis=-1)                # [...]
    best_t = jnp.take_along_axis(t_masked, best[..., None],
                                 axis=-1)[..., 0]
    upd = jnp.isfinite(best_t)

    # Select the winning triangle's normal + material via one-hot over the
    # 8-axis (ray-major selection from per-cluster data).
    onehot = (jax.lax.broadcasted_iota(
        jnp.int32, best.shape + (CLUSTER_SIZE,), best.ndim)
        == best[..., None])                              # [..., 8]

    def sel3(x):  # x: [N, 8, 3] -> [..., 3]
        return jnp.sum(jnp.where(onehot[..., None], tri_b(x), 0.0),
                       axis=-2)

    def sel1(x):  # x: [N, 8] -> [...]
        return jnp.sum(jnp.where(onehot, tri_b(x), 0.0), axis=-1)

    n_unit = sel3(n_pre)  # already unit length (pack-time normalize)
    if cfg.shading != "fixed_light":
        # C14 flips toward the ray; C12 keeps the raw winding normal.
        flip = jnp.sum(jnp.squeeze(rd, -2) * n_unit, axis=-1) > 0.0
        n_unit = jnp.where(flip[..., None], -n_unit, n_unit)
    alb = sel3(tris[..., 9:12])
    typ = sel1(tris[..., 12])

    nx, ny, nz, ar, ag, ab, mt = state
    closest_t = jnp.where(upd, best_t, closest_t)
    nx = jnp.where(upd, n_unit[..., 0], nx)
    ny = jnp.where(upd, n_unit[..., 1], ny)
    nz = jnp.where(upd, n_unit[..., 2], nz)
    ar = jnp.where(upd, alb[..., 0], ar)
    ag = jnp.where(upd, alb[..., 1], ag)
    ab = jnp.where(upd, alb[..., 2], ab)
    mt = jnp.where(upd, typ, mt)
    return closest_t, (nx, ny, nz, ar, ag, ab, mt)


def packet_traverse(scene: FastScene, ray_o: vec.V3, ray_d: vec.V3, active,
                    cfg: RenderConfig) -> TraversalResult:
    """Closest-hit for grouped rays.

    ray_o/ray_d: component tuples of f32[G, NG]; active: bool[G, NG].
    A group advances through the skip-link tree with one shared node
    pointer (scalar per group); fully inactive groups start at the
    sentinel and exit immediately. Returns flat [G*NG] results.
    """
    g, ng = ray_o[0].shape
    num_nodes = scene.num_nodes

    inv_d = (1.0 / ray_d[0], 1.0 / ray_d[1], 1.0 / ray_d[2])

    group_live = jnp.any(active, axis=0)                  # [NG]
    node = jnp.where(group_live, jnp.int32(0), num_nodes)
    closest_t = jnp.full((g, ng), cfg.t_max, jnp.float32)
    zero = jnp.zeros((g, ng), jnp.float32)
    state = (zero, zero, zero, zero, zero, zero, zero)

    def cond(c):
        return jnp.any(c[0] < num_nodes)

    def step(c):
        node, closest_t, state = c
        in_flight = node < num_nodes
        safe = jnp.where(in_flight, node, 0)

        rows = jnp.take(scene.nodes8, safe, axis=0)       # [NG, 8]
        skip = jax.lax.bitcast_convert_type(rows[:, 6], jnp.int32)
        leaf = jax.lax.bitcast_convert_type(rows[:, 7], jnp.int32)
        left = -leaf - 1  # internal nodes: col7 = -(left_child + 1)

        # Per-ray slab test against the group's node (AoS trailing-dim
        # math; contiguous row slices — see _cluster_mt layout note).
        bmin = rows[None, :, 0:3]                          # [1, NG, 3]
        bmax = rows[None, :, 3:6]
        ro3 = jnp.stack(ray_o, axis=-1)                    # [G, NG, 3]
        inv3 = jnp.stack(inv_d, axis=-1)
        t0s = (bmin - ro3) * inv3                          # [G, NG, 3]
        t1s = (bmax - ro3) * inv3
        t_enter = jnp.max(jnp.minimum(t0s, t1s), axis=-1)  # [G, NG]
        t_exit = jnp.min(jnp.maximum(t0s, t1s), axis=-1)
        ray_hit = ((t_exit > t_enter) & (t_exit > cfg.t_min)
                   & (t_enter < closest_t) & active)
        group_hit = jnp.any(ray_hit, axis=0) & in_flight   # [NG]

        is_leaf = leaf >= 0
        do_leaf = group_hit & is_leaf

        crow = jnp.take(_leaf_rows(scene.clusters),
                        jnp.where(do_leaf, leaf, 0),
                        axis=0)                            # [NG, 128]
        closest_t, state = _cluster_mt(
            crow, ray_o, ray_d, closest_t,
            do_leaf[None, :] & active, state, cfg)

        descend = group_hit & ~is_leaf
        node = jnp.where(in_flight, jnp.where(descend, left, skip),
                         node)
        return node, closest_t, state

    def body(c):
        for _ in range(TRAVERSE_UNROLL):
            c = step(c)
        return c

    node, closest_t, state = jax.lax.while_loop(
        cond, body, (node, closest_t, state))

    nx, ny, nz, ar, ag, ab, mt = (s.reshape(g * ng) for s in state)
    closest_t = closest_t.reshape(g * ng)
    hit = closest_t < cfg.t_max
    return TraversalResult(closest_t, hit, (nx, ny, nz), (ar, ag, ab), mt)


def ray_traverse_fast(scene: FastScene, ray_o: vec.V3, ray_d: vec.V3,
                      active, cfg: RenderConfig) -> TraversalResult:
    """Per-ray traversal over the packed tables, for incoherent bounce
    rays. Components are flat f32[P]."""
    p = ray_o[0].shape[0]
    num_nodes = scene.num_nodes
    inv_d = (1.0 / ray_d[0], 1.0 / ray_d[1], 1.0 / ray_d[2])

    node = jnp.where(active, jnp.int32(0), num_nodes)
    closest_t = jnp.full((p,), cfg.t_max, jnp.float32)
    zero = jnp.zeros((p,), jnp.float32)
    state = (zero, zero, zero, zero, zero, zero, zero)

    def cond(c):
        return jnp.any(c[0] < num_nodes)

    def step(c):
        node, closest_t, state = c
        in_flight = node < num_nodes
        safe = jnp.where(in_flight, node, 0)

        rows = jnp.take(scene.nodes8, safe, axis=0)        # [P, 8]
        skip = jax.lax.bitcast_convert_type(rows[:, 6], jnp.int32)
        leaf = jax.lax.bitcast_convert_type(rows[:, 7], jnp.int32)
        left = -leaf - 1  # internal nodes: col7 = -(left_child + 1)

        ro3 = jnp.stack(ray_o, axis=-1)                    # [P, 3]
        inv3 = jnp.stack(inv_d, axis=-1)
        t0s = (rows[:, 0:3] - ro3) * inv3
        t1s = (rows[:, 3:6] - ro3) * inv3
        t_enter = jnp.max(jnp.minimum(t0s, t1s), axis=-1)
        t_exit = jnp.min(jnp.maximum(t0s, t1s), axis=-1)
        ray_hit = ((t_exit > t_enter) & (t_exit > cfg.t_min)
                   & (t_enter < closest_t) & in_flight & active)

        is_leaf = leaf >= 0
        do_leaf = ray_hit & is_leaf

        crow = jnp.take(_leaf_rows(scene.clusters),
                        jnp.where(do_leaf, leaf, 0),
                        axis=0)                            # [P, 128]
        closest_t, state = _cluster_mt(
            crow, ray_o, ray_d, closest_t, do_leaf, state, cfg)

        descend = ray_hit & ~is_leaf
        node = jnp.where(in_flight, jnp.where(descend, left, skip),
                         node)
        return node, closest_t, state

    def body(c):
        for _ in range(TRAVERSE_UNROLL):
            c = step(c)
        return c

    node, closest_t, state = jax.lax.while_loop(
        cond, body, (node, closest_t, state))
    nx, ny, nz, ar, ag, ab, mt = state
    hit = closest_t < cfg.t_max
    return TraversalResult(closest_t, hit, (nx, ny, nz), (ar, ag, ab), mt)


def megakernel_bounces(scene: FastScene, ray_o, ray_d, color, atten, seed,
                       alive, sky_on, cfg: RenderConfig,
                       start_bounce: int = 1, pix=None):
    """Bounces as ONE fused loop with live-ray width compaction.

    Structure (each piece measured — PERF_NOTES.md):
    * megakernel: a ray that exits traversal is shaded (masked elementwise
      + RNG) and respawns into its next bounce in the same loop iteration,
      so the loop runs ~max-over-rays(total visits) instead of the
      round-based sum-over-bounces(max visits) (~3-4x);
    * compaction: average live occupancy over the loop is only ~4% (rays
      die to sky/absorption while a tail bounces on), so when the live
      count fits in a quarter width, live rays are cumsum-compacted into
      the prefix and the loop continues at width/4 (levels p, p/4, p/16,
      ...). Finished rays deposit their color by pixel id at each level
      boundary. Per-ray RNG streams are carried state, so reordering
      changes nothing.

    State encoding via the node pointer: < num_nodes -> traversing;
    == num_nodes -> traversal finished, shade pending; > num_nodes -> done.
    Returns (color_x, color_y, color_z, seed_full, rays_traced); colors are
    in the ORIGINAL ray order; seed is only meaningful where rays never
    entered (callers that need post-bounce seeds must not compact).
    """
    p = ray_o[0].shape[0]
    num_nodes = scene.num_nodes
    done = num_nodes + 1

    node = jnp.where(alive, jnp.int32(0), done)
    closest_t = jnp.full((p,), cfg.t_max, jnp.float32)
    zero = jnp.zeros((p,), jnp.float32)
    hitstate = (zero, zero, zero, zero, zero, zero, zero)
    bounce = jnp.full((p,), start_bounce, jnp.int32)
    rays_traced = jnp.sum(alive.astype(jnp.float32))
    if pix is None:  # deposit target per ray; callers pass a permutation
        pix = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0).reshape(p)

    # Width levels: p, p/r, p/r^2, ... (floor measured: 512-2048 beats
    # 8192 by ~1.7x at 720p; ratio/floor env-tunable).
    floor = int(_os.environ.get("RAYTPU_COMPACT_FLOOR", "1024"))
    # ratio < 2 would stop the level list from shrinking -> infinite loop.
    ratio = max(2, int(_os.environ.get("RAYTPU_COMPACT_RATIO", "2")))
    levels = [p]
    while levels[-1] // ratio >= min(floor, p):
        levels.append(levels[-1] // ratio)

    out = (jnp.zeros((p,), jnp.float32), jnp.zeros((p,), jnp.float32),
           jnp.zeros((p,), jnp.float32))

    state = (node, closest_t, hitstate, ray_o, ray_d, color, atten, seed,
             bounce, pix)
    for li, width in enumerate(levels):
        is_last = li == len(levels) - 1
        next_width = None if is_last else levels[li + 1]
        state, rays_traced = _mega_level(
            scene, state, rays_traced, sky_on, cfg, done,
            exit_width=next_width)
        # Deposit finished rays' colors; compact live rays for the next
        # level.
        (node, closest_t, hitstate, ray_o, ray_d, color, atten, seed,
         bounce, pix) = state
        live = node <= num_nodes
        deposit = ~live if not is_last else jnp.ones_like(live)
        didx = jnp.where(deposit, pix, p)  # p = dropped
        out = tuple(
            o.at[didx].add(c, mode="drop")
            for o, c in zip(out, color))
        if is_last:
            break
        pos = jnp.cumsum(live.astype(jnp.int32)) - 1
        live_count = jnp.sum(live.astype(jnp.int32))
        slots = jnp.where(live, pos, next_width)
        order = jnp.zeros((next_width,), jnp.int32).at[slots].set(
            jax.lax.broadcasted_iota(jnp.int32, (width, 1), 0).reshape(width),
            mode="drop")
        # One packed gather applies the permutation to all float state.
        fpack = jnp.stack(
            list(ray_o) + list(ray_d) + list(color) + list(atten)
            + [closest_t] + list(hitstate), axis=-1)        # [width, 20]
        fpack = jnp.take(fpack, order, axis=0)
        ipack = jnp.stack([node, jax.lax.bitcast_convert_type(
            seed, jnp.int32), bounce, pix], axis=-1)
        ipack = jnp.take(ipack, order, axis=0)
        # Exactly the first live_count slots are filled (cumsum compaction
        # is dense); everything past them is a clone of ray 0's state and
        # must be killed thoroughly: done node, dropped pixel id, zero
        # color. (`take(live, order)` is NOT a valid test — when ray 0 is
        # itself live at a boundary it marks every clone slot valid and
        # re-deposits ray 0's color once per clone.)
        valid = (jax.lax.broadcasted_iota(jnp.int32, (next_width, 1), 0)
                 .reshape(next_width) < live_count)
        node = jnp.where(valid, ipack[:, 0], done)
        seed = jax.lax.bitcast_convert_type(ipack[:, 1], jnp.uint32)
        bounce = ipack[:, 2]
        pix = jnp.where(valid, ipack[:, 3], p)  # p -> dropped on deposit
        ray_o = (fpack[:, 0], fpack[:, 1], fpack[:, 2])
        ray_d = (fpack[:, 3], fpack[:, 4], fpack[:, 5])
        vz = lambda x: jnp.where(valid, x, 0.0)
        color = (vz(fpack[:, 6]), vz(fpack[:, 7]), vz(fpack[:, 8]))
        atten = (fpack[:, 9], fpack[:, 10], fpack[:, 11])
        closest_t = fpack[:, 12]
        hitstate = tuple(fpack[:, 13 + j] for j in range(7))
        state = (node, closest_t, hitstate, ray_o, ray_d, color, atten,
                 seed, bounce, pix)

    return out[0], out[1], out[2], rays_traced


def _mega_level(scene, state, rays_traced, sky_on, cfg, done,
                exit_width):
    """Run the fused traverse+shade loop at one width until every ray is
    done, or (when exit_width is set) until live rays fit in exit_width."""
    num_nodes = scene.num_nodes

    def cond(c):
        state, rays, live_count = c
        pending = jnp.any(state[0] <= num_nodes)
        if exit_width is None:
            return pending
        return pending & (live_count > exit_width)

    def step(c):
        ((node, closest_t, hitstate, ray_o, ray_d, color, atten, seed,
          bounce, pix), rays, _) = c

        # --- traversal sub-step (rays with node < num_nodes) ---
        in_flight = node < num_nodes
        safe = jnp.where(in_flight, node, 0)
        rows = jnp.take(scene.nodes8, safe, axis=0)
        skip = jax.lax.bitcast_convert_type(rows[:, 6], jnp.int32)
        leaf = jax.lax.bitcast_convert_type(rows[:, 7], jnp.int32)
        left = -leaf - 1

        inv_d = (1.0 / ray_d[0], 1.0 / ray_d[1], 1.0 / ray_d[2])
        ro3 = jnp.stack(ray_o, axis=-1)
        inv3 = jnp.stack(inv_d, axis=-1)
        t0s = (rows[:, 0:3] - ro3) * inv3
        t1s = (rows[:, 3:6] - ro3) * inv3
        t_enter = jnp.max(jnp.minimum(t0s, t1s), axis=-1)
        t_exit = jnp.min(jnp.maximum(t0s, t1s), axis=-1)
        ray_hit = ((t_exit > t_enter) & (t_exit > cfg.t_min)
                   & (t_enter < closest_t) & in_flight)
        is_leaf = leaf >= 0
        do_leaf = ray_hit & is_leaf

        crow = jnp.take(_leaf_rows(scene.clusters),
                        jnp.where(do_leaf, leaf, 0),
                        axis=0)
        closest_t, hitstate = _cluster_mt(
            crow, ray_o, ray_d, closest_t, do_leaf, hitstate, cfg)

        descend = ray_hit & ~is_leaf
        node = jnp.where(in_flight,
                         jnp.where(descend, left, skip), node)

        # --- shade sub-step (rays whose traversal just finished) ---
        shading = node == num_nodes
        nx, ny, nz, ar, ag, ab, mt = hitstate
        res = TraversalResult(closest_t, closest_t < cfg.t_max,
                              (nx, ny, nz), (ar, ag, ab), mt)
        s_ray_o, s_ray_d, color, atten, seed, scattered = shade(
            res, ray_o, ray_d, color, atten, seed, shading, sky_on, cfg)
        ray_o = vec.where(shading, s_ray_o, ray_o)
        ray_d = vec.where(shading, s_ray_d, ray_d)

        respawn = shading & scattered & (bounce + 1 < cfg.max_bounces)
        bounce = jnp.where(shading, bounce + 1, bounce)
        rays = rays + jnp.sum(respawn.astype(jnp.float32))
        node = jnp.where(shading, jnp.where(respawn, 0, done), node)
        # Reset per-bounce hit state for respawned rays.
        closest_t = jnp.where(respawn, cfg.t_max, closest_t)
        live_count = jnp.sum((node <= num_nodes).astype(jnp.int32))
        return ((node, closest_t, hitstate, ray_o, ray_d, color, atten,
                 seed, bounce, pix), rays, live_count)

    def body(c):
        for _ in range(TRAVERSE_UNROLL):
            c = step(c)
        return c

    width = state[0].shape[0]
    carry = (state, rays_traced, jnp.int32(width))
    state, rays, _ = jax.lax.while_loop(cond, body, carry)
    return state, rays


def _tile_index(h, w):
    """Flat pixel index (row-major) for tile-major traversal order:
    position [ty, tx, iy, ix] <-> pixel (ty*8+iy, tx*8+ix)."""
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return yy, xx


def tail_merge_widths(cfg: RenderConfig, band_h: int, nb: int):
    """(handoff_width, merged_width) for the cross-band deep-round merge,
    or None when the merge cannot apply: single band, fixed-light tier,
    single-bounce, or a band too small to have deep levels. The handoff
    is the band ladder width nearest band_rays/4 (>= MIN_WIDTH); merged
    width = nb * handoff. RAYTPU_TAIL_MERGE=0 disables."""
    import os

    from raytracer_tpu.kernels.pallas_trace import BLOCK
    from raytracer_tpu.kernels.wavefront import (MIN_WIDTH, BBLOCK,
                                                 _round_widths)

    if (nb <= 1 or cfg.max_bounces <= 1 or cfg.shading == "fixed_light"
            or os.environ.get("RAYTPU_TAIL_MERGE", "1") == "0"):
        return None
    p = band_h * cfg.width
    grain = max(BLOCK, BBLOCK)
    p_pad = -(-p // grain) * grain
    widths = _round_widths(p_pad)
    target = max(MIN_WIDTH, p_pad // 4)
    cands = [w for w in widths[1:] if w <= target]
    if not cands:
        return None
    handoff = cands[0]
    return handoff, nb * handoff


def tail_merge_active(scene: FastScene, cfg: RenderConfig) -> bool:
    """True when render_linear_fast would route bounces through the
    packed wavefront engine (default pallas b0 + wave + fused on a
    wide-BVH scene) — the only path that can hand off band tails."""
    from raytracer_tpu.kernels.wavefront import WAVE_DEFAULT
    default_b0 = "pallas" if jax.default_backend() == "tpu" else "mega"
    bounce_default = "wave" if jax.default_backend() == "tpu" else "mega"
    return (getattr(scene, "nodes4", None) is not None
            and cfg.max_bounces > 1
            and cfg.shading != "fixed_light"
            and _os.environ.get("RAYTPU_B0", default_b0) == "pallas"
            and _os.environ.get("RAYTPU_BOUNCE", bounce_default) == "wave"
            and _os.environ.get("RAYTPU_WAVE", WAVE_DEFAULT) != "split")


def render_linear_fast(scene: FastScene, cam: CameraUniforms,
                       cfg: RenderConfig, sample_index: jnp.ndarray | int = 0,
                       y_offset: jnp.ndarray | int = 0,
                       global_height: int | None = None,
                       tail_handoff: int | None = None):
    """Hybrid fast frame.

    Bounce 0: packet traversal over 8x8 pixel tiles (coherent).
    Bounces 1+: per-ray traversal over the packed tables. Sampling and
    shading semantics are identical to tracer.render_linear.
    ``y_offset``/``global_height`` render a row band of a taller frame
    (multi-chip sharding).

    ``tail_handoff``: stop the wavefront ladder at this width and ALSO
    return band survivors (sf, si) with global pixel ids + bounces-left
    for the renderer's cross-band deep-round merge
    (kernels/wavefront.wavefront_tail). Only valid on the default
    pallas + wave path with a wide-BVH scene.
    """
    if cfg.height % TILE_H or cfg.width % TILE_W:
        raise ValueError("fast path needs resolution divisible by 8")
    h, w = cfg.height, cfg.width
    gh = global_height or h
    p = h * w

    yy, xx = _tile_index(h, w)
    yy = (yy + jnp.int32(y_offset)).reshape(p)
    xx = xx.reshape(p)
    pixel = (yy * w + xx).astype(jnp.uint32)

    seed = initial_seed(cam, cfg, pixel, sample_index)

    if cfg.shading == "fixed_light":
        from raytracer_tpu.kernels.tracer import fixed_light_color

        default_b0 = "pallas" if jax.default_backend() == "tpu" else "mega"
        if _os.environ.get("RAYTPU_B0", default_b0) == "pallas":
            # C12 tier through the Pallas traversal (same raster+pad
            # trick as the path-tracing branch below).
            from raytracer_tpu.kernels.pallas_trace import (
                BLOCK, pallas_traverse, pick_tile)
            from raytracer_tpu.kernels.wavefront import BBLOCK

            tile = pick_tile(h, w)
            grain = max(BLOCK, BBLOCK)
            p_pad = -(-p // grain) * grain
            i = jax.lax.broadcasted_iota(jnp.int32, (p_pad, 1),
                                         0).reshape(p_pad)
            i_mod = i % p  # pad tail wraps; dead either way
            alive = i < p
            if tile is not None:
                th, tw = tile
                per = th * tw
                t_id, off = i_mod // per, i_mod % per
                tiles_x = w // tw
                xx = (t_id % tiles_x) * tw + off % tw
                yy_local = (t_id // tiles_x) * th + off // tw
            else:
                xx = i_mod % w
                yy_local = i_mod // w
            yy = yy_local + jnp.int32(y_offset)
            pixel = (yy * w + xx).astype(jnp.uint32)
            seed2 = initial_seed(cam, cfg, pixel, sample_index)
            _, ray_o, ray_d = make_primary_rays(cam, cfg, seed2, xx, yy,
                                                gh, jitter=False)
            res = pallas_traverse(scene, ray_o, ray_d, alive, cfg)
            color = fixed_light_color(res)
            pix_local = jnp.where(i < p, yy_local * w + xx, jnp.int32(p))
            color = tuple(
                jnp.zeros((p,), jnp.float32)
                .at[pix_local].set(c, mode="drop") for c in color)
        else:
            seed, ray_o, ray_d = make_primary_rays(cam, cfg, seed, xx, yy,
                                                   gh, jitter=False)
            res = ray_traverse_fast(scene, ray_o, ray_d,
                                    jnp.ones((p,), bool), cfg)
            color = fixed_light_color(res)
        stats = {"rays_traced": jnp.float32(p), "bounce_iters": jnp.int32(1)}
        image = jnp.stack([c.reshape(h, w) for c in color], axis=-1)
        return image, stats

    # Default primary-bounce path: the Pallas per-tile kernel on real TPU
    # (measured 1.25x full-frame vs the XLA megakernel at 720p); the XLA
    # megakernel elsewhere (interpret-mode Pallas is a Python loop — fine
    # for the small explicit-parity tests, too slow as the CPU default).
    default_b0 = "pallas" if jax.default_backend() == "tpu" else "mega"
    b0 = _os.environ.get("RAYTPU_B0", default_b0)

    if b0 in ("pallas", "pwave"):
        # Primary traversal in the Pallas per-tile kernel. Ray order is
        # tile-major (consecutive BLOCK rays = one compact pixel tile);
        # pick_tile guarantees p % (th*tw) == 0, so this works even when
        # the frame doesn't divide the pad grain (e.g. 1080p): the pad
        # tail wraps to valid pixels as dead rays, and whole-dead pad
        # tiles exit the Pallas grid in one step. Only frames with no
        # dividing tile at all fall back to raster order. Results are
        # deposited back to raster order by pixel id either way.
        from raytracer_tpu.kernels.pallas_trace import (BLOCK,
                                                        pallas_traverse,
                                                        pick_tile)
        from raytracer_tpu.kernels.wavefront import BBLOCK

        tile = pick_tile(h, w)
        # Pad to the coarser of the primary/bounce tile grains (both
        # powers of two) so the same ray arrays feed both kernels.
        grain = max(BLOCK, BBLOCK)
        p_pad = -(-p // grain) * grain
        i = jax.lax.broadcasted_iota(jnp.int32, (p_pad, 1), 0).reshape(p_pad)
        i_mod = i % p  # pad tail wraps to valid pixels; dead either way
        alive = i < p
        if tile is not None:
            th, tw = tile
            per = th * tw
            t_id, off = i_mod // per, i_mod % per
            tiles_x = w // tw
            xx = (t_id % tiles_x) * tw + off % tw
            yy_local = (t_id // tiles_x) * th + off // tw
        else:
            xx = i_mod % w
            yy_local = i_mod // w
        yy = yy_local + jnp.int32(y_offset)
        pixel = (yy * w + xx).astype(jnp.uint32)
        seed = initial_seed(cam, cfg, pixel, sample_index)
        seed, ray_o, ray_d = make_primary_rays(cam, cfg, seed, xx, yy, gh)

        zero = jnp.zeros((p_pad,), jnp.float32)
        one = jnp.ones((p_pad,), jnp.float32)
        sky_on = cam.sky_enabled > 0
        # Pad rays carry an out-of-range pixel id; every deposit below
        # scatters with mode="drop".
        pix_local = jnp.where(i < p, yy_local * w + xx, jnp.int32(p))

        if (b0 == "pwave" and cfg.max_bounces > 1
                and getattr(scene, "nodes4", None) is not None):
            # A/B option, measured SLOWER than the default (6.73 vs 7.29
            # FPS flagship): bounce 0 inside the fused rounds — raygen
            # feeds wavefront_bounces(start_bounce=0), removing the XLA
            # bounce-0 shade, but the pd5-sorted S=16 round-0 walk loses
            # more than that saves vs the tile-major S=8 primary kernel
            # (184 Mrays/s). Kept for re-evaluation if tile sizes change.
            from raytracer_tpu.kernels.wavefront import wavefront_bounces

            cx, cy, cz, rays = wavefront_bounces(
                scene, ray_o, ray_d, (zero, zero, zero), (one, one, one),
                seed, alive, sky_on, cfg, start_bounce=0, pix=pix_local,
                dense_pix=True)
            color = tuple(c[:p] for c in (cx, cy, cz))
            stats = {"rays_traced": rays, "bounce_iters": jnp.int32(0)}
            image = jnp.stack([c.reshape(h, w) for c in color], axis=-1)
            return image, stats

        res = pallas_traverse(scene, ray_o, ray_d, alive, cfg)
        ray_o, ray_d, color, atten, seed, alive = shade(
            res, ray_o, ray_d, (zero, zero, zero), (one, one, one), seed,
            alive, sky_on, cfg)
        if cfg.max_bounces > 1:
            bounce_path = _os.environ.get(
                "RAYTPU_BOUNCE",
                "wave" if jax.default_backend() == "tpu" else "mega")
            if (bounce_path == "pmega"
                    and getattr(scene, "nodes4", None) is None):
                bounce_path = "wave"  # megakernel needs the BVH8 table
            if bounce_path == "pmega":
                # A/B option: one pd5 sort, then the whole bounce chain
                # inside a single Pallas call (kernels/pallas_mega.py).
                # Measured SLOWER than wavefront rounds at full frame
                # (2.75 vs 6.11 FPS at 720p): without in-kernel
                # compaction every tile re-walks until its last ray dies,
                # which swamps the per-round overhead savings. Kept for
                # the day the kernel gains occupancy compaction.
                from raytracer_tpu.kernels.pallas_mega import \
                    bounce_megakernel
                from raytracer_tpu.kernels.wavefront import (KEY_DEFAULT,
                                                             sort_key)

                smin = tuple(scene.nodes8[0, ax] for ax in range(3))
                smax = tuple(scene.nodes8[0, 3 + ax] for ax in range(3))
                key = sort_key(ray_o, ray_d, alive, smin, smax,
                               _os.environ.get("RAYTPU_SORT_KEY",
                                               KEY_DEFAULT))
                order = jnp.argsort(key)
                tk = lambda c: jnp.take(c, order)
                ray_o = tuple(tk(c) for c in ray_o)
                ray_d = tuple(tk(c) for c in ray_d)
                color = tuple(tk(c) for c in color)
                atten = tuple(tk(c) for c in atten)
                seed = tk(seed)
                alive_s = tk(alive)
                pix_s = tk(pix_local)

                blocks = tuple(
                    c.reshape(-1, 128)
                    for c in (*ray_o, *ray_d, *color, *atten)) + (
                    jax.lax.bitcast_convert_type(
                        seed, jnp.int32).reshape(-1, 128),
                    alive_s.astype(jnp.float32).reshape(-1, 128),
                    jnp.full((p_pad // 128, 128), 1 << 30, jnp.int32))
                num4 = jnp.asarray(scene.num_nodes4,
                                   jnp.int32).reshape(1)
                bcap = jnp.asarray(cfg.max_bounces - 1,
                                   jnp.int32).reshape(1)
                skyf = cam.sky_enabled.astype(jnp.int32).reshape(1)
                outs = bounce_megakernel(
                    scene.nodes4, scene.clusters, num4, blocks, bcap,
                    skyf, scene.nodes8[0, :6], 8,
                    float(cfg.fuzz), bool(cfg.emissive_emits),
                    t_min=float(cfg.t_min), t_max=float(cfg.t_max),
                    det_eps=float(cfg.det_eps),
                    interpret=jax.default_backend() != "tpu")
                cs = tuple(outs[6 + i].reshape(p_pad) for i in range(3))
                rays = jnp.sum(outs[15])
                cx, cy, cz = (
                    jnp.zeros((p_pad,), jnp.float32)
                    .at[pix_s].add(c, mode="drop") for c in cs)
            elif bounce_path == "wave":
                # Sorted wavefront rounds on the Pallas traversal
                # (kernels/wavefront.py) — measured 1.38x vs the XLA
                # megakernel at 720p; RAYTPU_BOUNCE=mega restores it
                # for A/B. (p_pad is a BLOCK multiple, so it is always a
                # BBLOCK multiple too.)
                from raytracer_tpu.kernels.wavefront import \
                    wavefront_bounces
                if tail_handoff is not None:
                    cx, cy, cz, rays, (tsf, tsi) = wavefront_bounces(
                        scene, ray_o, ray_d, color, atten, seed, alive,
                        sky_on, cfg, start_bounce=1, pix=pix_local,
                        handoff_width=tail_handoff, dense_pix=True)
                    # Survivor pixel ids go global for the cross-band
                    # merge; the pad sentinel (p) maps to gh*w so merged
                    # deposits still drop it.
                    pixg = jnp.where(tsi[1] >= p, jnp.int32(gh * w),
                                     tsi[1] + jnp.int32(y_offset) * w)
                    survivors = (tsf, tsi.at[1].set(pixg))
                    color = tuple(c[:p] for c in (cx, cy, cz))
                    rays = rays + jnp.float32(p)
                    stats = {"rays_traced": rays,
                             "bounce_iters": jnp.int32(0)}
                    image = jnp.stack([c.reshape(h, w) for c in color],
                                      axis=-1)
                    return image, stats, survivors
                cx, cy, cz, rays = wavefront_bounces(
                    scene, ray_o, ray_d, color, atten, seed, alive,
                    sky_on, cfg, start_bounce=1, pix=pix_local,
                    dense_pix=True)
            else:
                cx, cy, cz, rays = megakernel_bounces(
                    scene, ray_o, ray_d, color, atten, seed, alive,
                    sky_on, cfg, start_bounce=1, pix=pix_local)
            # Every ray deposited at its pixel id; pad-ray deposits landed
            # at the sentinel cell (index p) and are sliced away.
            color = tuple(c[:p] for c in (cx, cy, cz))
            rays = rays + jnp.float32(p)
        else:
            color = tuple(
                jnp.zeros((p,), jnp.float32)
                .at[pix_local].set(c, mode="drop")
                for c in color)
            rays = jnp.float32(p)
        stats = {"rays_traced": rays, "bounce_iters": jnp.int32(0)}
        image = jnp.stack([c.reshape(h, w) for c in color], axis=-1)
        return image, stats

    seed, ray_o, ray_d = make_primary_rays(cam, cfg, seed, xx, yy, gh)

    zero = jnp.zeros((p,), jnp.float32)
    one = jnp.ones((p,), jnp.float32)
    color = (zero, zero, zero)
    atten = (one, one, one)
    alive = jnp.ones((p,), bool)
    sky_on = cam.sky_enabled > 0

    if b0 == "mega":
        # Primaries through the compacting megakernel (measured ~1.3x
        # faster than the tile-packet phase at 720p once compaction + SAH
        # landed; RAYTPU_B0=packet restores the tile path for A/B).
        cx, cy, cz, rays = megakernel_bounces(
            scene, ray_o, ray_d, color, atten, seed, alive, sky_on, cfg,
            start_bounce=0)
        stats = {"rays_traced": rays, "bounce_iters": jnp.int32(0)}
        image = jnp.stack(
            [c.reshape(h, w) for c in (cx, cy, cz)], axis=-1)
        return image, stats

    # --- Bounce 0: packet traversal over pixel tiles. ---
    # [H, W] -> [TILE, NT]: lane dim = tile count (large), sublanes = the
    # 64 rays of a tile.
    def to_groups(a):
        return (a.reshape(h // TILE_H, TILE_H, w // TILE_W, TILE_W)
                .transpose(1, 3, 0, 2)
                .reshape(TILE, (h // TILE_H) * (w // TILE_W)))

    def from_groups(a):
        return (a.reshape(TILE_H, TILE_W, h // TILE_H, w // TILE_W)
                .transpose(2, 0, 3, 1)
                .reshape(p))

    g_o = tuple(to_groups(c.reshape(h, w)) for c in ray_o)
    g_d = tuple(to_groups(c.reshape(h, w)) for c in ray_d)
    g_active = to_groups(alive.reshape(h, w))
    res_g = packet_traverse(scene, g_o, g_d, g_active, cfg)
    res = TraversalResult(
        from_groups(res_g.closest_t),
        from_groups(res_g.hit),
        tuple(from_groups(c) for c in res_g.normal),
        tuple(from_groups(c) for c in res_g.mat_albedo),
        from_groups(res_g.mat_type),
    )
    ray_o, ray_d, color, atten, seed, alive = shade(
        res, ray_o, ray_d, color, atten, seed, alive, sky_on, cfg)

    # --- Bounces 1..max-1: fused megakernel (per-ray progression). ---
    if cfg.max_bounces > 1:
        cx, cy, cz, rays = megakernel_bounces(
            scene, ray_o, ray_d, color, atten, seed, alive, sky_on, cfg,
            start_bounce=1)
        # Rays that never entered the loop keep their bounce-0 color.
        color = (jnp.where(alive, cx, color[0]),
                 jnp.where(alive, cy, color[1]),
                 jnp.where(alive, cz, color[2]))
        rays = rays + jnp.float32(p)
    else:
        rays = jnp.float32(p)  # exhausted-at-cap rays stay black

    stats = {"rays_traced": rays, "bounce_iters": jnp.int32(0)}
    image = jnp.stack([c.reshape(h, w) for c in color], axis=-1)
    return image, stats
