"""Per-frame device BVH refit over a fixed high-quality topology.

The round-4 live-edit finding (exp37): a full on-device rebuild pays
either for tree QUALITY (device PLOC: renders 118.6 ms/frame but costs
1220 ms/frame to build) or for build SPEED (Karras LBVH: 62 ms build but
renders 148.2 ms — the exp31/exp35 quality gap). The classic production
answer is to stop rebuilding topology per edit at all:

* **capture** (host, once per instance set): build one good tree over
  the transformed soup (host binned-SAH/PLOC), then extract everything
  the per-frame program needs as static arrays — the triangle->leaf-slot
  assignment, the pre-order skip/col7 link columns (bit-exact), the
  leaf-rank range [first, last] covered by every node row, and the wide
  table's per-slot binary-row map + static metas;
* **refit** (device, one jitted program per edit): re-transform the
  base-space slot vertices with the new instance parameters, recompute
  leaf AABBs, answer every internal AABB as a sparse-table range
  min/max over leaf ranks (O(L log L) dense vector work, the same
  machinery as bvh/lbvh.py), and reassemble the node/cluster tables.
  No sort, no Karras loops, no agglomeration — topology is data.

Why ranges work for ANY host tree: every HostBVH is a pre-order flatten
with skip links, so node row i's subtree is exactly rows [i, skip[i]),
and the leaves inside it are CONTIGUOUS in leaf-rank (row) order.

Rigid scale+translate edits keep the captured topology exactly as good
as at capture time for the moved instance's subtree; quality under large
cross-instance motion degrades gracefully and can be refreshed with a
background recapture (RAYTPU_REFIT_REFRESH, scene/device_builder.py) —
the same async-SRT architecture as the reference's rebuild thread
(``VulkanApp.java:242-304``), with the per-edit critical path fully
on-device.

Reference analogue: the CPU SRT rebuild, ``renderer/SceneBuilder.java:
38-118`` — which re-runs the full recursive build per edit; this path
replaces it with O(edit) device work.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.bvh.build import AABB_EPS, build_bvh
from raytracer_tpu.bvh.bvh4 import collapse4
from raytracer_tpu.bvh.lbvh import _range_minmax
from raytracer_tpu.core.fast_types import (CLUSTER_ROW, CLUSTER_SIZE,
                                           WIDE_WIDTH, FastScene)
from raytracer_tpu.utils.log import get_logger

_log = get_logger("srt")

_BIG = np.float32(1e30)
_MIN_CAPACITY = 64


def _bucket(n: int) -> int:
    c = _MIN_CAPACITY
    while c < n:
        c *= 2
    return c


@jax.jit
def _refit_program(v_base, inst_slot, slot_valid, skip_col, col7_col,
                   first, last, row_valid, wide_rows, wide_meta,
                   params, num_nodes, n_wide, num_tris):
    """One edit -> FastScene. All-array args: uploaded once per capture
    (static tables) or per frame (``params`` f32[I, 10] = scale3 pos3
    color3 mtype — ONE host->device put per edit, exp24's lesson).

    Shapes: v_base f32[S, 9] base-space slot verts (S = lcap * 8),
    inst_slot i32[S], slot_valid f32[S], skip/col7 i32[mcap],
    first/last i32[mcap] leaf-rank ranges, row_valid f32[mcap],
    wide_rows i32[R4, 8], wide_meta f32[R4, 8].
    """
    s = v_base.shape[0]
    lcap = s // CLUSTER_SIZE
    mcap = skip_col.shape[0]

    sc = params[inst_slot, 0:3]
    po = params[inst_slot, 3:6]
    col = params[inst_slot, 6:9]
    mt = params[inst_slot, 9]

    v = v_base.reshape(s, 3, 3) * sc[:, None, :] + po[:, None, :]

    # Per-triangle AABBs (triangle_aabbs semantics: epsilon-padded thin
    # axes); invalid slots are neutral elements of the leaf min/max.
    lo_t = v.min(axis=1)
    hi_t = v.max(axis=1)
    thin = (hi_t - lo_t) < AABB_EPS
    lo_t = jnp.where(thin, lo_t - AABB_EPS, lo_t)
    hi_t = jnp.where(thin, hi_t + AABB_EPS, hi_t)
    live = slot_valid[:, None] > 0.0
    lo_t = jnp.where(live, lo_t, _BIG)
    hi_t = jnp.where(live, hi_t, -_BIG)
    leaf_lo = lo_t.reshape(lcap, CLUSTER_SIZE, 3).min(axis=1)  # rank order
    leaf_hi = hi_t.reshape(lcap, CLUSTER_SIZE, 3).max(axis=1)

    # Every node row's AABB is a range min/max over leaf ranks (leaf rows
    # have first == last == their own rank).
    row_lo = []
    row_hi = []
    for ax in range(3):
        mn, mx = _range_minmax(leaf_lo[:, ax], leaf_hi[:, ax], first, last)
        row_lo.append(mn)
        row_hi.append(mx)
    row_lo = jnp.stack(row_lo, axis=1)                         # [mcap, 3]
    row_hi = jnp.stack(row_hi, axis=1)
    rv = row_valid[:, None] > 0.0
    row_lo = jnp.where(rv, row_lo, _BIG)
    row_hi = jnp.where(rv, row_hi, -_BIG)

    # i32 assembly + single bitcast (CLAUDE.md invariant: f32 elementwise
    # ops flush denormal / canonicalize NaN link bit patterns).
    def as_i32(f):
        return jax.lax.bitcast_convert_type(f, jnp.int32)

    nodes8_i = jnp.concatenate([
        as_i32(row_lo), as_i32(row_hi),
        skip_col[:, None], col7_col[:, None],
    ], axis=1)
    nodes8 = jax.lax.bitcast_convert_type(nodes8_i, jnp.float32)

    # Wide table: slot bounds gather through the static binary-row map;
    # metas are static floats (leaf counts don't change under refit).
    r4 = wide_rows.shape[0]
    wr = jnp.clip(wide_rows, 0, mcap - 1)
    wv = (wide_rows >= 0).astype(jnp.float32)[:, :, None]
    wlo = row_lo[wr] * wv                                      # [R4, 8, 3]
    whi = row_hi[wr] * wv
    slots = jnp.concatenate([
        wlo, whi, wide_meta[:, :, None],
        jnp.zeros((r4, WIDE_WIDTH, 9), jnp.float32)], axis=2)
    nodes4 = slots.reshape(r4, 128)

    # Cluster records: the same precomputed MT layout as every packer
    # (v0 e1 e2 albedo type unit-normal, core/fast_types.py).
    v0 = v[:, 0]
    e1 = v[:, 1] - v0
    e2 = v[:, 2] - v0
    nrm = jnp.cross(e1, e2)
    nlen = jnp.sqrt(jnp.sum(nrm * nrm, axis=-1, keepdims=True))
    nrm = jnp.where(nlen > 0.0, nrm / jnp.where(nlen > 0.0, nlen, 1.0), 0.0)
    row16 = jnp.concatenate(
        [v0, e1, e2, col, mt[:, None], nrm], axis=1) * slot_valid[:, None]
    clusters = row16.reshape(-1, CLUSTER_ROW)

    return FastScene(
        nodes8=nodes8,
        clusters=clusters,
        num_nodes=num_nodes,
        num_triangles=num_tris,
        nodes4=nodes4,
        num_nodes4=n_wide,
    )


def _pack_params(params: Sequence[tuple]) -> np.ndarray:
    """[(scale3, pos3, color3, mtype), ...] -> f32[I, 10]."""
    out = np.zeros((len(params), 10), np.float32)
    for i, (scale, pos, color, mtype) in enumerate(params):
        out[i, 0:3] = np.asarray(scale, np.float32).reshape(3)
        out[i, 3:6] = np.asarray(pos, np.float32).reshape(3)
        out[i, 6:9] = np.asarray(color, np.float32).reshape(3)
        out[i, 9] = np.float32(np.asarray(mtype).reshape(()))
    return out


@dataclasses.dataclass
class RefitScene:
    """Captured topology + device tables; ``refit(params)`` per edit."""

    tables: tuple            # device-resident static arrays (jnp)
    n_instances: int
    num_triangles: int
    edits: int = 0           # refits served since capture (refresh policy)

    def refit(self, params: Sequence[tuple]) -> FastScene:
        """params: per-instance (scale3, pos3, color3, mtype) — must match
        the captured instance count/order."""
        assert len(params) == self.n_instances
        self.edits += 1
        p = jnp.asarray(_pack_params(params))
        return _refit_program(*self.tables[:10], p, *self.tables[10:])


def capture_refit(meshes: Sequence[np.ndarray], params: Sequence[tuple],
                  method: str | None = None) -> RefitScene:
    """Host topology capture: one good tree, everything else static.

    Args:
      meshes: per-instance base-space f32[Ti, 3, 3] triangle arrays.
      params: per-instance (scale3, pos3, color3, mtype) at capture time
        (topology quality is anchored to this pose).
      method: host split policy; default RAYTPU_REFIT_TOPO (falls back
        to "ploc" — 0.2-0.4 s captures; "sah" trades ~25x capture time
        for the best steady-state walk, r4b).
    """
    if method is None:
        method = os.environ.get("RAYTPU_REFIT_TOPO", "ploc")
    import time

    t0 = time.perf_counter()
    counts = [int(m.shape[0]) for m in meshes]
    n = int(sum(counts))
    if n == 0:
        raise ValueError("refit capture needs a non-empty scene")
    base = np.concatenate([np.asarray(m, np.float32).reshape(-1, 3, 3)
                           for m in meshes])
    tri_inst = np.repeat(np.arange(len(meshes), dtype=np.int32), counts)
    p = _pack_params(params)
    verts0 = (base * p[tri_inst, 0:3][:, None, :]
              + p[tri_inst, 3:6][:, None, :]).astype(np.float32)

    bvh = build_bvh(verts0, leaf_size=CLUSTER_SIZE, method=method)
    m = bvh.num_nodes
    leaf_mask = bvh.node_tri >= 0
    num_leaves = int(leaf_mask.sum())
    if num_leaves < 2:
        raise ValueError("refit capture needs >= 2 leaves")

    mcap = _bucket(m)
    lcap = _bucket(num_leaves)

    # Static link columns (exactly the host builder's encoding).
    skip_col = np.full(mcap, m, np.int32)
    skip_col[:m] = bvh.node_skip
    col7_col = np.zeros(mcap, np.int32)
    internal = np.nonzero(~leaf_mask)[0]
    col7 = np.empty(m, np.int32)
    col7[leaf_mask] = np.arange(num_leaves, dtype=np.int32)
    col7[internal] = -(internal.astype(np.int32) + 1 + 1)
    col7_col[:m] = col7
    row_valid = np.zeros(mcap, np.float32)
    row_valid[:m] = 1.0

    # Leaf-rank ranges per row: pre-order subtree = rows [i, skip[i]),
    # whose leaves are contiguous in rank; leaf rows cover themselves.
    prefix = np.cumsum(leaf_mask.astype(np.int64))             # [m]
    first = np.zeros(mcap, np.int32)
    last = np.zeros(mcap, np.int32)
    rank = (prefix - 1).astype(np.int32)
    first[:m] = np.where(leaf_mask, rank, prefix.astype(np.int32))
    skip_idx = np.clip(bvh.node_skip.astype(np.int64) - 1, 0, m - 1)
    last[:m] = np.where(leaf_mask, rank,
                        (prefix[skip_idx] - 1).astype(np.int32))

    # Triangle -> leaf-slot assignment (cluster rows are leaf-rank order,
    # matching the host packers' cid assignment).
    s_cap = lcap * CLUSTER_SIZE
    slot_tri = np.full(s_cap, -1, np.int64)
    leaf_rows = np.nonzero(leaf_mask)[0]
    starts = bvh.node_tri[leaf_rows].astype(np.int64)
    ntris = bvh.node_ntri[leaf_rows].astype(np.int64)
    for t in range(CLUSTER_SIZE):
        has = ntris > t
        slot_tri[np.arange(num_leaves) * CLUSTER_SIZE + t] = np.where(
            has, bvh.order[np.where(has, starts + t, 0)], -1)
    valid = slot_tri >= 0
    safe = np.where(valid, slot_tri, 0)
    v_base = base.reshape(-1, 9)[safe] * valid[:, None]
    inst_slot = np.where(valid, tri_inst[safe], 0).astype(np.int32)

    # Wide table statics via the host collapse (+ per-slot binary rows).
    nodes8_host = np.zeros((mcap, 8), np.float32)
    nodes8_host[:, 0:3] = _BIG
    nodes8_host[:, 3:6] = -_BIG
    nodes8_host[:m, 0:3] = bvh.node_min
    nodes8_host[:m, 3:6] = bvh.node_max
    nodes8_host[:, 6] = skip_col.view(np.float32)
    nodes8_host[:, 7] = col7_col.view(np.float32)
    ccounts = bvh.node_ntri[leaf_mask].astype(np.int32)
    if os.environ.get("RAYTPU_LEAF_COUNTS", "1") == "0":
        ccounts = None
    assert WIDE_WIDTH == 8, "refit wide capture assumes 8-wide tables"
    nodes4, n4, slot_rows = collapse4(
        nodes8_host, m, width=WIDE_WIDTH, cluster_counts=ccounts,
        return_slots=True)
    r4cap = _bucket(nodes4.shape[0])
    wide_rows = np.full((r4cap, WIDE_WIDTH), -1, np.int32)
    wide_rows[:n4] = slot_rows
    wide_meta = np.zeros((r4cap, WIDE_WIDTH), np.float32)
    wide_meta[:nodes4.shape[0]] = nodes4.reshape(
        -1, WIDE_WIDTH, 16)[:, :, 6]

    tables = (
        jnp.asarray(v_base.astype(np.float32)),
        jnp.asarray(inst_slot),
        jnp.asarray(valid.astype(np.float32)),
        jnp.asarray(skip_col),
        jnp.asarray(col7_col),
        jnp.asarray(first),
        jnp.asarray(last),
        jnp.asarray(row_valid),
        jnp.asarray(wide_rows),
        jnp.asarray(wide_meta),
        # trailing scalars feed the jit AFTER params (RefitScene.refit
        # splices params between tables[:10] and these)
    )
    scene_scalars = (jnp.int32(m), jnp.int32(n4), jnp.int32(n))
    _log.info("refit capture (%s): %d tris, %d leaves, %d nodes, "
              "%d wide in %.1f ms", method, n, num_leaves, m, n4,
              (time.perf_counter() - t0) * 1e3)

    rs = RefitScene(tables=tables + scene_scalars,
                    n_instances=len(meshes), num_triangles=n)
    return rs
