"""On-device LBVH: Morton codes + sort + Karras radix tree, fully jitted.

The reference rebuilds its BVH on the CPU per scene edit (the Scene
Rebuild Thread's recursive median split, ``bvh/BVHBuilder.java:48-93``).
Here the *entire* scene build — instance transforms, Morton coding,
``jax.lax.sort`` ordering, binary radix hierarchy (Karras 2012),
range-min/max AABBs, escape links, cluster packing — runs as one jitted
XLA program on the TPU, so a live transform edit never round-trips
geometry through the host (BASELINE.json config #4).

Output is the same FastScene node/cluster table layout the packet tracer
consumes (core/fast_types.py): this tree is *not* the host builder's
median-split tree, just a valid BVH over the same triangles, so rendered
images agree to float tolerance while build latency drops from host
milliseconds to device microseconds.

Layout notes: triangles sort by 30-bit Morton codes of their AABB
centroids (10 bits/axis, tie-broken by index for a strict total order);
consecutive runs of CLUSTER_SIZE sorted triangles form the leaf clusters;
the radix tree is built over the L cluster keys. Internal node i covers
the sorted-cluster range [first[i], last[i]], so its AABB is a range
min/max answered by a sparse table (log L levels), and its escape link
resolves by pointer-jumping over parents — everything O(L log L) dense
vector work, no data-dependent recursion.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracer_tpu.core.fast_types import (CLUSTER_ROW, CLUSTER_SIZE,
                                           FastScene, TRI_STRIDE)
from raytracer_tpu.bvh.build import AABB_EPS


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of v so there are 2 zero bits between each
    (the classic Morton interleave helper)."""
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton30(x, y, z) -> jnp.ndarray:
    """x/y/z in [0, 1) -> interleaved 30-bit Morton code (u32)."""
    q = lambda a: jnp.clip(a * 1024.0, 0.0, 1023.0).astype(jnp.uint32)
    return (_expand_bits(q(x)) << 2) | (_expand_bits(q(y)) << 1) \
        | _expand_bits(q(z))


def _clz32(x: jnp.ndarray) -> jnp.ndarray:
    """Count leading zeros of u32 via bit smear + popcount."""
    x = x.astype(jnp.uint32)
    x = x | (x >> 1)
    x = x | (x >> 2)
    x = x | (x >> 4)
    x = x | (x >> 8)
    x = x | (x >> 16)
    # SWAR popcount.
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    pop = (x * jnp.uint32(0x01010101)) >> 24
    return (32 - pop).astype(jnp.int32)


def build_lbvh_tables(codes: jnp.ndarray):
    """Karras binary radix tree over L sorted, *distinct-by-tiebreak* keys.

    Returns (left, right, first, last, parent) for the L-1 internal nodes,
    with child encoding: value < L is an internal node id, value >= L is
    leaf id (value - (L-1) gives... see below — children use the global
    numbering internal 0..L-2, leaves L-1..2L-2).
    """
    l = codes.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (l - 1, 1), 0).reshape(l - 1)

    def delta(i, j):
        """Common-prefix length between keys i and j; -1 out of range.
        Duplicate codes tie-break on index (prefix + 32 + clz(i^j))."""
        valid = (j >= 0) & (j < l)
        j_s = jnp.clip(j, 0, l - 1)
        ci = codes[i]
        cj = codes[j_s]
        d = _clz32(ci ^ cj)
        tie = 32 + _clz32((i.astype(jnp.uint32)) ^ (j_s.astype(jnp.uint32)))
        d = jnp.where(ci == cj, tie, d)
        return jnp.where(valid, d, -1)

    # Direction of the node's range.
    d = jnp.sign(delta(idx, idx + 1) - delta(idx, idx - 1)).astype(jnp.int32)
    d = jnp.where(d == 0, 1, d)

    # Upper bound on range length (exponential search, 32 static steps).
    delta_min = delta(idx, idx - d)
    lmax = jnp.full_like(idx, 2)

    def grow(_, lmax):
        bigger = delta(idx, idx + lmax * d) > delta_min
        return jnp.where(bigger, lmax * 2, lmax)

    lmax = jax.lax.fori_loop(0, 32, grow, lmax)

    # Binary search the exact other end.
    length = jnp.zeros_like(idx)
    t = lmax // 2

    def shrink(carry):
        length, t = carry
        ok = delta(idx, idx + (length + t) * d) > delta_min
        length = jnp.where(ok, length + t, length)
        return length, t // 2

    length, _ = jax.lax.while_loop(lambda c: jnp.any(c[1] > 0), shrink,
                                   (length, t))
    j = idx + length * d  # other end of range

    # Binary search the split position (highest differing bit).
    delta_node = delta(idx, j)
    s = jnp.zeros_like(idx)
    t = (length + 1) // 2
    tpow = lmax // 2  # walk powers of two >= ceil(len/2) ... standard form:

    def split_step(carry):
        s, t = carry
        ok = delta(idx, idx + (s + t) * d) > delta_node
        s = jnp.where(ok, s + t, s)
        return s, (t + 1) // 2 * jnp.where(t > 1, 1, 0)

    s, _ = jax.lax.while_loop(lambda c: jnp.any(c[1] > 0), split_step,
                              (s, (length + 1) // 2))
    gamma = idx + s * d + jnp.minimum(d, 0)

    first = jnp.minimum(idx, j)
    last = jnp.maximum(idx, j)

    # Children: left covers [first, gamma], right covers [gamma+1, last].
    # Global ids: internal i -> i (0..L-2); leaf k -> (L-1) + k.
    left_is_leaf = first == gamma
    right_is_leaf = gamma + 1 == last
    left = jnp.where(left_is_leaf, (l - 1) + gamma, gamma)
    right = jnp.where(right_is_leaf, (l - 1) + gamma + 1, gamma + 1)

    # Parent pointers over all 2L-1 nodes.
    parent = jnp.full((2 * l - 1,), -1, jnp.int32)
    parent = parent.at[left].set(idx)
    parent = parent.at[right].set(idx)
    return left, right, first, last, parent


def _range_minmax(lo, hi, first, last):
    """Sparse-table range min/max over leaf AABBs.

    lo/hi: f32[L] per sorted-cluster bounds for ONE axis; first/last:
    i32[M-L] inclusive ranges. Returns (min, max) per range.
    """
    l = lo.shape[0]
    levels = max(1, (l - 1).bit_length())
    mins = [lo]
    maxs = [hi]
    for k in range(1, levels + 1):
        half = 1 << (k - 1)
        prev_min, prev_max = mins[-1], maxs[-1]
        shifted_min = jnp.concatenate(
            [prev_min[half:], jnp.full((half,), jnp.inf, lo.dtype)])
        shifted_max = jnp.concatenate(
            [prev_max[half:], jnp.full((half,), -jnp.inf, hi.dtype)])
        mins.append(jnp.minimum(prev_min, shifted_min))
        maxs.append(jnp.maximum(prev_max, shifted_max))

    # Largest power-of-two block <= span: k = floor(log2(span)).
    span = last - first + 1
    k = jnp.where(span > 1,
                  (31 - _clz32(span.astype(jnp.uint32))).astype(jnp.int32),
                  0)
    k = jnp.clip(k, 0, levels)

    table_min = jnp.stack(mins)   # [levels+1, L]
    table_max = jnp.stack(maxs)
    a_min = table_min[k, first]
    b_min = table_min[k, jnp.maximum(last - (1 << k) + 1, first)]
    a_max = table_max[k, first]
    b_max = table_max[k, jnp.maximum(last - (1 << k) + 1, first)]
    return jnp.minimum(a_min, b_min), jnp.maximum(a_max, b_max)


def build_fast_scene_device(verts: jnp.ndarray,
                            mats: jnp.ndarray) -> FastScene:
    """Jittable scene build: [T,3,3] verts + [T,4] mats -> FastScene.

    T must be a multiple of CLUSTER_SIZE (pad with degenerate zero
    triangles on the host — zero-area tris never hit). All steps are dense
    vector ops; safe under jit and on any backend.
    """
    t = verts.shape[0]
    assert t % CLUSTER_SIZE == 0, "pad triangle count to a cluster multiple"
    l = t // CLUSTER_SIZE
    m = 2 * l - 1

    # --- per-triangle AABBs (epsilon-padded) + centroids ---
    lo = verts.min(axis=1)
    hi = verts.max(axis=1)
    thin = (hi - lo) < AABB_EPS
    lo = jnp.where(thin, lo - AABB_EPS, lo)
    hi = jnp.where(thin, hi + AABB_EPS, hi)
    center = (lo + hi) * 0.5

    scene_lo = lo.min(axis=0)
    scene_hi = hi.max(axis=0)
    extent = jnp.maximum(scene_hi - scene_lo, 1e-12)
    u = (center - scene_lo) / extent

    codes = morton30(u[:, 0], u[:, 1], u[:, 2])

    # --- sort triangles by code ---
    order = jnp.argsort(codes)
    codes_sorted = jnp.take(codes, order, axis=0)
    lo_s = jnp.take(lo, order, axis=0)
    hi_s = jnp.take(hi, order, axis=0)

    # --- cluster leaves: runs of CLUSTER_SIZE sorted triangles ---
    cl_lo = lo_s.reshape(l, CLUSTER_SIZE, 3).min(axis=1)   # [L, 3]
    cl_hi = hi_s.reshape(l, CLUSTER_SIZE, 3).max(axis=1)
    cl_code = codes_sorted.reshape(l, CLUSTER_SIZE)[:, 0]

    # NOTE on assembly dtype: the link columns are raw int32 bit patterns.
    # Small positive ints bitcast to f32 DENORMALS and small negative ints
    # to NaN payloads; XLA:TPU flushes denormals to zero and canonicalizes
    # NaNs in f32 elementwise/concat ops, silently corrupting the links
    # (skip=0 everywhere -> the traversal loops forever and the worker
    # watchdog kills the chip). So the table is concatenated entirely in
    # i32 (bit-preserving) and bitcast to f32 once at the end; downstream
    # slices/gathers/DMAs preserve bits (all measured on the axon TPU).
    def as_i32(f):
        return jax.lax.bitcast_convert_type(f, jnp.int32)

    if l == 1:
        # Degenerate single-cluster scene: one leaf node.
        nodes8_i = jnp.concatenate([
            as_i32(cl_lo), as_i32(cl_hi),
            jnp.array([[1]], jnp.int32),
            jnp.array([[0]], jnp.int32),
        ], axis=1)
        nodes8 = jax.lax.bitcast_convert_type(nodes8_i, jnp.float32)
    else:
        left, right, first, last, parent = build_lbvh_tables(cl_code)

        # Internal AABBs via range min/max per axis.
        int_lo = []
        int_hi = []
        for ax in range(3):
            mn, mx = _range_minmax(cl_lo[:, ax], cl_hi[:, ax], first, last)
            int_lo.append(mn)
            int_hi.append(mx)
        int_lo = jnp.stack(int_lo, axis=1)   # [L-1, 3]
        int_hi = jnp.stack(int_hi, axis=1)

        # Escape links. Node numbering: internal 0..L-2 (root 0), leaves
        # L-1..2L-2. right-sibling of a left child = parent's right; a
        # right child escapes to its parent's escape -> resolve by
        # pointer jumping (log passes).
        node_right = jnp.concatenate(
            [right, jnp.zeros((l,), jnp.int32)])           # per node id
        is_left_child = jnp.zeros((m,), bool).at[left].set(True)
        escape = jnp.full((m,), m, jnp.int32)  # root & unresolved -> M

        def esc_pass(_, esc):
            par = parent
            par_esc = jnp.where(par >= 0, esc[jnp.maximum(par, 0)], m)
            sibling = jnp.where(par >= 0,
                                node_right[jnp.maximum(par, 0)], m)
            new = jnp.where(is_left_child, sibling, par_esc)
            new = jnp.where(par >= 0, new, m)
            return new

        # Depth of a Karras tree <= ~64 with index tie-breaks; escape of a
        # right child depends on ancestors only through chains of right
        # children, so depth passes converge.
        escape = jax.lax.fori_loop(0, 64, esc_pass, escape)

        # Assemble [M, 8] node rows: internal 0..L-2 then leaves.
        all_lo = jnp.concatenate([int_lo, cl_lo])          # [M, 3]
        all_hi = jnp.concatenate([int_hi, cl_hi])
        leaf_col = jnp.concatenate([
            -(left + 1),                                   # internal
            jax.lax.broadcasted_iota(jnp.int32, (l, 1), 0).reshape(l),
        ])
        nodes8_i = jnp.concatenate([
            as_i32(all_lo), as_i32(all_hi),
            escape[:, None], leaf_col[:, None],
        ], axis=1)
        nodes8 = jax.lax.bitcast_convert_type(nodes8_i, jnp.float32)

    # --- pack clusters: [L, 128] rows (v0 v1 v2 albedo type pad3) ---
    v_s = jnp.take(verts.reshape(t, 9), order, axis=0)
    m_s = jnp.take(mats, order, axis=0)
    row16 = jnp.concatenate([
        v_s, m_s, jnp.zeros((t, 3), jnp.float32)], axis=1)  # [T, 16]
    clusters = row16.reshape(l, CLUSTER_ROW)

    return FastScene(
        nodes8=nodes8,
        clusters=clusters,
        num_nodes=jnp.int32(m),
        num_triangles=jnp.int32(t),
    )


def pad_to_cluster_multiple(verts, mats):
    """Host-side helper: pad a triangle soup so T % CLUSTER_SIZE == 0
    (degenerate zero triangles never hit)."""
    import numpy as np

    t = verts.shape[0]
    pad = (-t) % CLUSTER_SIZE
    if pad:
        verts = np.concatenate(
            [verts, np.zeros((pad, 3, 3), np.float32)])
        mats = np.concatenate([mats, np.zeros((pad, 4), np.float32)])
    return verts, mats
