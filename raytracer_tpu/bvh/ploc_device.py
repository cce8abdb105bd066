"""On-device PLOC scene build: jitted agglomerative BVH for live edits.

The device twin of ``bvh/ploc.py`` (see its docstring for the algorithm
and the exp35 quality evidence: x0.89-0.92 visit events vs the host SAH
sweep, where the Karras LBVH tree sits at x1.72 — the exp31 live-edit
gap). Like ``bvh/lbvh.py`` everything here is dense vector work under
``jit`` — Morton sort, then two masked merge loops with
cumsum-compaction — so a live transform edit never round-trips geometry
through the host (reference analogue: the SRT CPU rebuild,
``renderer/SceneBuilder.java:38-118``).

Static-shape strategy (tri count T is padding-bucketed by the caller):

* leaf buffers are sized ``LCAP = T // 4``: the capped phase merges
  singletons until no mutual pair fits <= CLUSTER_SIZE (mean fill ~6.8,
  so live leaves L ~ T/7 << LCAP); a bounded force-fit valve
  (alternating-parity adjacent merges) guarantees L <= LCAP even on
  adversarial tie-heavy inputs, because mean fill < 4 implies a fitting
  adjacent pair exists;
* the unrestricted phase records internal nodes at creation index and
  remaps so the ROOT IS NODE 0 (the lbvh numbering: internal 0..L-2,
  leaf k -> (L-1)+k, both dynamic in the traced L); after 48 SA-driven
  iterations a forced-halving valve roots the tree within the static
  iteration bound, so the while_loops cannot leave a forest;
* dead rows carry inverted boxes and are unreachable from the root.

Member lists ride intrusive linked lists over item ids (<= CLUSTER_SIZE
steps to resolve, all gathers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracer_tpu.bvh.build import AABB_EPS
from raytracer_tpu.bvh.lbvh import morton30
from raytracer_tpu.core.fast_types import (CLUSTER_ROW, CLUSTER_SIZE,
                                           ROW_TRIS, FastScene,
                                           LEAF_CID_BITS, WIDE_WIDTH)

_BIG = 3.0e38

# Iteration bounds (see module docstring): SA-driven phases converge in
# ~18 (capped) / ~45 (to-root) iterations on two_humans; the caps only
# bound adversarial tie-heavy inputs where exact-equal SAs stall the
# mutual-pair rule.
_MAX_CAPPED = 40
_FORCE_AFTER = 48   # to-root phase: SA-driven iterations before forcing
_MAX_ROOT = 96      # >= _FORCE_AFTER + 2*log2(LCAP) + slack
WINDOW = 8


def _sa(lo, hi):
    d = jnp.maximum(hi - lo, 0.0)
    return d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]


def _shift_up(a, dlt, fill):
    """a[i] -> a[i+dlt], tail filled."""
    pad = jnp.full((dlt,) + a.shape[1:], fill, a.dtype)
    return jnp.concatenate([a[dlt:], pad])


def _shift_down(a, dlt, fill):
    pad = jnp.full((dlt,) + a.shape[1:], fill, a.dtype)
    return jnp.concatenate([pad, a[:-dlt]])


def _window_best(lo, hi, n, cnt=None, cap=0):
    """best_j[i] = lowest-union-SA neighbor of i within WINDOW among the
    first n slots (optionally only pairs whose counts sum <= cap).
    Returns (best_j i32[T] with -1 = none)."""
    t = lo.shape[0]
    idx = jnp.arange(t, dtype=jnp.int32)
    best_cost = jnp.full((t,), jnp.inf, jnp.float32)
    best_j = jnp.full((t,), -1, jnp.int32)
    for dlt in range(1, WINDOW + 1):
        nb_lo = _shift_up(lo, dlt, _BIG)
        nb_hi = _shift_up(hi, dlt, -_BIG)
        c = _sa(jnp.minimum(lo, nb_lo), jnp.maximum(hi, nb_hi))
        ok = (idx + dlt) < n
        if cnt is not None:
            ok &= (cnt + _shift_up(cnt, dlt, 1 << 20)) <= cap
        c = jnp.where(ok, c, jnp.inf)
        better = c < best_cost
        best_cost = jnp.where(better, c, best_cost)
        best_j = jnp.where(better, idx + dlt, best_j)
        cb = _shift_down(c, dlt, jnp.inf)
        better = cb < best_cost
        best_cost = jnp.where(better, cb, best_cost)
        best_j = jnp.where(better, idx - dlt, best_j)
    return best_j


def _mutual_left(best_j, n):
    """Mask of positions i that are the LEFT partner of a mutual best
    pair (i, best_j[i])."""
    t = best_j.shape[0]
    idx = jnp.arange(t, dtype=jnp.int32)
    bj = jnp.clip(best_j, 0, t - 1)
    return ((best_j >= 0) & (best_j[bj] == idx) & (idx < best_j)
            & (idx < n))


def _compact(keep, arrs, t):
    """Scatter-compact each array in ``arrs`` to the prefix of kept
    slots (dropped slots become zeros)."""
    new_pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    tgt = jnp.where(keep, new_pos, t)
    out = []
    for a in arrs:
        out.append(jnp.zeros_like(a).at[tgt].set(a, mode="drop"))
    return out


def build_fast_scene_device_ploc(verts: jnp.ndarray,
                                 mats: jnp.ndarray) -> FastScene:
    """Jittable PLOC scene build: [T,3,3] verts + [T,4] mats (T a
    multiple of ROW_TRIS) -> FastScene with variable-fill leaves."""
    assert CLUSTER_SIZE == 8, "device PLOC assumes 8-slot cluster rows"
    assert WIDE_WIDTH == 8, "device wide emit is 8-wide (like lbvh.py)"
    t = verts.shape[0]
    assert t % ROW_TRIS == 0, "pad triangle count to a cluster-row multiple"
    lcap = max(t // 4, 16)
    i32 = jnp.int32

    # --- AABBs + Morton sort (identical to bvh/lbvh.py) ---
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
    order = jnp.argsort(codes)
    lo_s = jnp.take(lo, order, axis=0)
    hi_s = jnp.take(hi, order, axis=0)

    # --- phase 1: capped agglomeration over singleton triangles ---
    idx_t = jnp.arange(t, dtype=i32)

    def phase1_body(carry):
        n, k, it, lo_, hi_, cnt, head, tail, nxt = carry
        best_j = _window_best(lo_, hi_, n, cnt=cnt, cap=CLUSTER_SIZE)
        mutual = _mutual_left(best_j, n)
        k2 = jnp.sum(mutual.astype(i32))
        bj = jnp.clip(best_j, 0, t - 1)
        # linked-list append j's members after i's
        nxt2 = nxt.at[jnp.where(mutual, tail, t)].set(
            head[bj], mode="drop")
        tail2 = jnp.where(mutual, tail[bj], tail)
        cnt2 = jnp.where(mutual, cnt + cnt[bj], cnt)
        lo2 = jnp.where(mutual[:, None], jnp.minimum(lo_, lo_[bj]), lo_)
        hi2 = jnp.where(mutual[:, None], jnp.maximum(hi_, hi_[bj]), hi_)
        dead = jnp.zeros((t,), bool).at[
            jnp.where(mutual, best_j, t)].set(True, mode="drop")
        keep = (idx_t < n) & ~dead
        lo3, hi3, cnt3, head3, tail3 = _compact(
            keep, (lo2, hi2, cnt2, head, tail2), t)
        n2 = jnp.sum(keep.astype(i32))
        return n2, k2, it + 1, lo3, hi3, cnt3, head3, tail3, nxt2

    def phase1_cond(carry):
        n, k, it, *_ = carry
        return (n > 1) & (k > 0) & (it < _MAX_CAPPED)

    init = (i32(t), i32(1), i32(0), lo_s, hi_s,
            jnp.ones((t,), i32), idx_t, idx_t, jnp.full((t,), -1, i32))
    n, _, _, c_lo, c_hi, c_cnt, c_head, c_tail, c_nxt = \
        jax.lax.while_loop(phase1_cond, phase1_body, init)

    # Force-fit valve: if tie-stalls left n > LCAP, merge adjacent
    # fitting pairs at alternating parity until n <= LCAP (guaranteed to
    # exist while mean fill < 4 — bvh/ploc.py docstring math).
    def force_body(carry):
        n, it, lo_, hi_, cnt, head, tail, nxt = carry
        parity = it & 1
        fits = (cnt + _shift_up(cnt, 1, 1 << 20)) <= CLUSTER_SIZE
        mutual = ((idx_t % 2 == parity) & ((idx_t + 1) < n) & fits
                  & (idx_t < n))
        bj = jnp.clip(idx_t + 1, 0, t - 1)
        nxt2 = nxt.at[jnp.where(mutual, tail, t)].set(
            head[bj], mode="drop")
        tail2 = jnp.where(mutual, tail[bj], tail)
        cnt2 = jnp.where(mutual, cnt + cnt[bj], cnt)
        lo2 = jnp.where(mutual[:, None], jnp.minimum(lo_, lo_[bj]), lo_)
        hi2 = jnp.where(mutual[:, None], jnp.maximum(hi_, hi_[bj]), hi_)
        dead = jnp.zeros((t,), bool).at[
            jnp.where(mutual, idx_t + 1, t)].set(True, mode="drop")
        keep = (idx_t < n) & ~dead
        lo3, hi3, cnt3, head3, tail3 = _compact(
            keep, (lo2, hi2, cnt2, head, tail2), t)
        n2 = jnp.sum(keep.astype(i32))
        return n2, it + 1, lo3, hi3, cnt3, head3, tail3, nxt2

    def force_cond(carry):
        n, it, *_ = carry
        return (n > lcap) & (it < 64)

    n, _, c_lo, c_hi, c_cnt, c_head, c_tail, c_nxt = jax.lax.while_loop(
        force_cond, force_body,
        (n, i32(0), c_lo, c_hi, c_cnt, c_head, c_tail, c_nxt))

    lc = n  # live leaf count (traced), <= lcap

    # --- leaf member resolution: chains are <= CLUSTER_SIZE long ---
    members = []
    cur = c_head[:lcap]
    alive = jnp.arange(lcap, dtype=i32) < lc
    for _ in range(CLUSTER_SIZE):
        members.append(jnp.where(alive & (cur >= 0), cur, -1))
        cur = jnp.where(cur >= 0, c_nxt[jnp.clip(cur, 0, t - 1)], -1)
    memidx = jnp.stack(members, axis=1)                    # [lcap, 8]

    # --- pack cluster rows: precomputed MT records in leaf order ---
    # (same 16-float record as bvh/lbvh.py / the host packers)
    v_s = jnp.take(verts.reshape(t, 9), order, axis=0)
    m_s = jnp.take(mats, order, axis=0)
    v0 = v_s[:, 0:3]
    e1 = v_s[:, 3:6] - v0
    e2 = v_s[:, 6:9] - v0
    nrm = jnp.cross(e1, e2)
    nlen = jnp.sqrt(jnp.sum(nrm * nrm, axis=-1, keepdims=True))
    nrm = jnp.where(nlen > 0.0, nrm / jnp.where(nlen > 0.0, nlen, 1.0),
                    0.0)
    row16 = jnp.concatenate([v0, e1, e2, m_s, nrm], axis=1)  # [T, 16]
    safe = jnp.clip(memidx, 0, t - 1)
    rec = row16[safe] * (memidx >= 0).astype(jnp.float32)[:, :, None]
    clusters = rec.reshape(lcap, CLUSTER_ROW)

    leaf_lo = c_lo[:lcap]
    leaf_hi = c_hi[:lcap]
    leaf_cnt = jnp.clip(c_cnt[:lcap], 1, CLUSTER_SIZE)

    # --- phase 2: unrestricted PLOC over the leaves up to the root ---
    idx_l = jnp.arange(lcap, dtype=i32)
    leaf_id = (lc - 1) + idx_l  # global ids (lbvh numbering), traced base

    def phase2_body(carry):
        (n2, it, node_id, lo_, hi_, created,
         rec_l, rec_r, rec_lo, rec_hi) = carry
        best_j = _window_best(lo_, hi_, n2)
        mutual = _mutual_left(best_j, n2)
        k = jnp.sum(mutual.astype(i32))
        # Tie-stall / convergence valve: after _FORCE_AFTER SA rounds (or
        # if no mutual pair emerged), merge adjacent pairs by parity —
        # halves n, so the loop always roots within _MAX_ROOT.
        forced = (k == 0) | (it >= _FORCE_AFTER)
        fmask = (idx_l % 2 == (it & 1)) & ((idx_l + 1) < n2) & (idx_l < n2)
        mutual = jnp.where(forced, fmask, mutual)
        best_j = jnp.where(forced, idx_l + 1, best_j)
        bj = jnp.clip(best_j, 0, lcap - 1)
        # record the merge at creation index
        cidx = created + jnp.cumsum(mutual.astype(i32)) - 1
        tgt = jnp.where(mutual, cidx, lcap)
        u_lo = jnp.minimum(lo_, lo_[bj])
        u_hi = jnp.maximum(hi_, hi_[bj])
        rec_l = rec_l.at[tgt].set(node_id, mode="drop")
        rec_r = rec_r.at[tgt].set(node_id[bj], mode="drop")
        rec_lo = rec_lo.at[tgt].set(u_lo, mode="drop")
        rec_hi = rec_hi.at[tgt].set(u_hi, mode="drop")
        created2 = created + jnp.sum(mutual.astype(i32))
        node_id2 = jnp.where(mutual, cidx, node_id)  # creation ids < lc-1
        lo2 = jnp.where(mutual[:, None], u_lo, lo_)
        hi2 = jnp.where(mutual[:, None], u_hi, hi_)
        dead = jnp.zeros((lcap,), bool).at[
            jnp.where(mutual, best_j, lcap)].set(True, mode="drop")
        keep = (idx_l < n2) & ~dead
        node_id3, lo3, hi3 = _compact(keep, (node_id2, lo2, hi2), lcap)
        n3 = jnp.sum(keep.astype(i32))
        return (n3, it + 1, node_id3, lo3, hi3, created2,
                rec_l, rec_r, rec_lo, rec_hi)

    def phase2_cond(carry):
        n2, it = carry[0], carry[1]
        return (n2 > 1) & (it < _MAX_ROOT)

    zero_i = jnp.zeros((lcap,), i32)
    zero_v = jnp.zeros((lcap, 3), jnp.float32)
    (_, _, _, _, _, created, rec_l, rec_r, rec_lo, rec_hi) = \
        jax.lax.while_loop(
            phase2_cond, phase2_body,
            (lc, i32(0), leaf_id, leaf_lo, leaf_hi, i32(0),
             zero_i, zero_i, zero_v, zero_v))

    # Remap creation index c -> internal id (lc-2) - c (root = 0).
    # Recorded child values: creation ids (< lc-1) or leaf ids (>= lc-1).
    def remap(x):
        return jnp.where(x >= lc - 1, x, (lc - 2) - x)

    fin = (lc - 2) - idx_l
    validc = idx_l < (lc - 1)
    tgt = jnp.where(validc, fin, lcap)
    left = jnp.zeros((lcap,), i32).at[tgt].set(remap(rec_l), mode="drop")
    right = jnp.zeros((lcap,), i32).at[tgt].set(remap(rec_r), mode="drop")
    int_lo = jnp.zeros((lcap, 3), jnp.float32).at[tgt].set(
        rec_lo, mode="drop")
    int_hi = jnp.zeros((lcap, 3), jnp.float32).at[tgt].set(
        rec_hi, mode="drop")

    # --- binary node table (lbvh layout: internal 0..lc-2, leaves
    # (lc-1)+k at rows; static buffers sized mcap) ---
    mcap = 2 * lcap
    m_live = 2 * lc - 1
    idx_m = jnp.arange(mcap, dtype=i32)

    parent = jnp.full((mcap,), -1, i32)
    src_valid = jnp.where(validc, left, mcap)
    parent = parent.at[src_valid].set(idx_l, mode="drop")
    src_valid = jnp.where(validc, right, mcap)
    parent = parent.at[src_valid].set(idx_l, mode="drop")

    # Escape links by pointer doubling (same recurrence as bvh/lbvh.py).
    node_right = jnp.zeros((mcap,), i32).at[:lcap].set(right)
    is_left = jnp.zeros((mcap,), bool).at[
        jnp.where(validc, left, mcap)].set(True, mode="drop")
    escape = jnp.where(is_left,
                       node_right[jnp.clip(parent, 0, mcap - 1)],
                       m_live)
    resolved = is_left | (parent < 0)
    jump = jnp.where(resolved, -1, parent)

    def esc_dbl(_, c):
        esc, jmp = c
        j = jnp.clip(jmp, 0, mcap - 1)
        live = jmp >= 0
        take = live & (jmp[j] < 0)
        esc = jnp.where(take, esc[j], esc)
        jmp = jnp.where(live, jnp.where(take, -1, jmp[j]), -1)
        return esc, jmp

    escape, _ = jax.lax.fori_loop(0, 7, esc_dbl, (escape, jump))

    # Bounds + col7 per node id. Internal i at row i; leaf k at row
    # (lc-1)+k (dynamic scatter).
    all_lo = jnp.full((mcap, 3), _BIG, jnp.float32).at[:lcap].set(
        jnp.where(validc[:, None], int_lo, _BIG))
    all_hi = jnp.full((mcap, 3), -_BIG, jnp.float32).at[:lcap].set(
        jnp.where(validc[:, None], int_hi, -_BIG))
    leaf_rows = jnp.where(idx_l < lc, (lc - 1) + idx_l, mcap)
    all_lo = all_lo.at[leaf_rows].set(leaf_lo, mode="drop")
    all_hi = all_hi.at[leaf_rows].set(leaf_hi, mode="drop")
    col7 = jnp.zeros((mcap,), i32).at[:lcap].set(-(left + 1))
    col7 = col7.at[leaf_rows].set(idx_l, mode="drop")  # leaf -> cluster id
    escape = jnp.where(idx_m < m_live, escape, m_live)

    def as_i32(f):
        return jax.lax.bitcast_convert_type(f, i32)

    # i32 assembly + single bitcast (CLAUDE.md: f32 ops corrupt link bits)
    nodes8_i = jnp.concatenate([
        as_i32(all_lo), as_i32(all_hi), escape[:, None], col7[:, None],
    ], axis=1)
    nodes8 = jax.lax.bitcast_convert_type(nodes8_i, jnp.float32)

    # --- 8-wide emit (lbvh.emit_wide_device generalized to a traced
    # leaf base + count-encoded leaf metas) ---
    jump2 = parent
    depth = (parent >= 0).astype(i32)

    def dbl(_, c):
        jmp, dep = c
        safe2 = jnp.clip(jmp, 0, mcap - 1)
        dep = dep + jnp.where(jmp >= 0, dep[safe2], 0)
        jmp = jnp.where(jmp >= 0, jmp[safe2], -1)
        return jmp, dep

    _, depth = jax.lax.fori_loop(0, 7, dbl, (jump2, depth))
    w = (depth[:lcap] % 3 == 0) & validc
    wide_id = jnp.cumsum(w.astype(i32)) - 1

    slot_cols = []
    for s in range(8):
        cur = idx_l
        at_leaf = jnp.zeros((lcap,), bool)
        valid = jnp.ones((lcap,), bool)
        for kbit in (2, 1, 0):
            bit = (s >> kbit) & 1
            if bit:
                valid = valid & ~at_leaf
            safe2 = jnp.clip(cur, 0, lcap - 1)
            child = right[safe2] if bit else left[safe2]
            cur = jnp.where(at_leaf, cur, child)
            at_leaf = cur >= (lc - 1)
        cid = cur - (lc - 1)
        cnt_enc = (jnp.clip(leaf_cnt[jnp.clip(cid, 0, lcap - 1)], 1,
                            CLUSTER_SIZE) - 1) << LEAF_CID_BITS
        meta = jnp.where(
            at_leaf,
            -(cid | cnt_enc) - 1,
            wide_id[jnp.clip(cur, 0, lcap - 1)] + 1)
        meta = jnp.where(valid, meta, 0).astype(jnp.float32)
        lo_c = all_lo[jnp.clip(jnp.where(at_leaf, (lc - 1) + cid, cur),
                               0, mcap - 1)]
        hi_c = all_hi[jnp.clip(jnp.where(at_leaf, (lc - 1) + cid, cur),
                               0, mcap - 1)]
        slot_cols.append(jnp.concatenate(
            [lo_c, hi_c, meta[:, None],
             jnp.zeros((lcap, 9), jnp.float32)], axis=1))

    rows = jnp.stack(slot_cols, axis=1).reshape(lcap, 128)
    nodes_wide = jnp.zeros((lcap, 128), jnp.float32).at[
        jnp.where(w, wide_id, lcap)].set(rows, mode="drop")
    n_wide = jnp.sum(w.astype(i32))

    return FastScene(
        nodes8=nodes8,
        clusters=clusters,
        num_nodes=m_live,
        num_triangles=jnp.int32(t),
        nodes4=nodes_wide,
        num_nodes4=n_wide,
    )
