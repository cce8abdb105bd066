"""Two-level instanced BVH: cached per-mesh SAH trees + jitted TLAS refit.

The live-edit rebuild problem, solved the way production ray tracers do
(TLAS/BLAS), shaped by two measured facts:

* exp31 (TPU): the per-frame on-device LBVH rebuild costs ~55 ms at 97.8k
  tris AND its Morton tree renders 1.53x slower than the host SAH tree
  (184 vs 120 ms/frame render-only) — live-edit scenes were paying twice.
* The reference's only instance edits are scale-then-translate
  (``renderer/SceneBuilder.java:172-174``; rotation explicitly deferred,
  ``scene/ModelInstance.java:22-23``). An axis-aligned scale + translate
  maps an AABB to an AABB *exactly* — so a mesh-space SAH tree's boxes can
  be transformed on-device without any quality loss or refit slack.

So: each distinct mesh gets ONE host SAH build (native builder, cached in
mesh space, device-resident — the BLAS). A scene edit runs one small
jitted program that scales/translates the node boxes and triangle records,
re-bakes instance color/material, offsets the link columns, and grafts the
per-instance tables under a tiny top level (the TLAS). Per-edit work is
dense elementwise math over ~the table sizes — no sort, no hierarchy
build — and tree quality is exactly the host SAH path's.

Both production table layouts are emitted:

* binary ``nodes8`` (skip links): instance blocks are laid out pre-order
  behind a right-leaning chain of K-1 top internals T_0..T_{K-2}
  (T_j's children: left = instance j, right = T_{j+1}). Pre-order means
  T_j's left child is literally the next row, preserving the kernels'
  ``left = node + 1`` invariant, and every local skip — including the
  local past-the-end sentinel M_j — maps to global as ``skip + off_j``
  with no case split (the row after block j IS T_{j+1} / the global end).
* wide ``nodes4`` (one 8-child node per 128-float row): instance tables
  concatenated behind 1 top row (K <= 8) or a root row + ceil(K/8) group
  rows (K <= 64); child metas offset per instance (internal ids by the
  row offset, leaf cluster ids by the cluster offset).

Link-column arithmetic notes: nodes8 link columns are bitcast-i32 — all
offset math happens in i32 and the table is bitcast to f32 once
(CLAUDE.md denormal/NaN rule). Wide metas are float-encoded EXACT ints
(|meta| < 2^23): they are converted (not bitcast) to i32, offset, and
converted back — convert of an exact int is lossless.

Falls back behind :class:`raytracer_tpu.scene.device_builder
.DeviceSceneBuilder` (RAYTPU_DEVICE_BUILD=instanced|lbvh).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Sequence

import jax
import numpy as np

from raytracer_tpu.core.fast_types import (CLUSTER_ROW, CLUSTER_SIZE,
                                           FastScene, LEAF_CID_BITS,
                                           LEAF_CID_MASK, TRI_STRIDE,
                                           WIDE_ROWS, WIDE_WIDTH)
from raytracer_tpu.utils.log import get_logger

_log = get_logger("srt")

# SMEM traversal stack bound shared with the collapse (bvh/bvh4.py).
from raytracer_tpu.bvh.bvh4 import STACK_CAP

_MIN_CAPACITY = 64
MAX_INSTANCES = 64  # 2 TLAS levels of 8; beyond this use the LBVH path


def _bucket(n: int) -> int:
    c = _MIN_CAPACITY
    while c < n:
        c *= 2
    return c


@dataclasses.dataclass(frozen=True)
class MeshBLAS:
    """Device-resident mesh-space acceleration tables (built once)."""

    bin_lo: Any      # f32[M, 3]
    bin_hi: Any      # f32[M, 3]
    bin_skip: Any    # i32[M]  local skip (sentinel M = escape the mesh)
    bin_col7: Any    # i32[M]  local leaf cid >= 0 / -(left+1) internal
    wide: Any        # f32[W, 128] mesh-space wide table, local metas
    rec: Any         # f32[L, 8, 9] per-cluster v0|e1|e2 records (padded)
    num_nodes: int   # M
    num_wide: int    # W
    num_clusters: int  # L
    num_triangles: int
    wide_depth: int  # wide-tree depth (stack-bound bookkeeping)


def prep_mesh_blas(verts: np.ndarray) -> MeshBLAS:
    """One-time host SAH build of a mesh-space BLAS (then device-put)."""
    import jax.numpy as jnp

    from raytracer_tpu.bvh.build import build_bvh
    from raytracer_tpu.bvh.bvh4 import collapse4

    verts = np.asarray(verts, np.float32)
    t = verts.shape[0]
    assert t > 0, "prep_mesh_blas needs a non-empty mesh"
    bvh = build_bvh(verts, leaf_size=CLUSTER_SIZE)
    m = bvh.num_nodes

    leaf_mask = bvh.node_tri >= 0
    num_leaves = int(leaf_mask.sum())
    leaf_ids = np.empty(m, np.int32)
    leaf_ids[leaf_mask] = np.arange(num_leaves, dtype=np.int32)
    internal = np.nonzero(~leaf_mask)[0]
    leaf_ids[internal] = -(internal.astype(np.int32) + 1 + 1)

    nodes8 = np.zeros((m, 8), np.float32)
    nodes8[:, 0:3] = bvh.node_min
    nodes8[:, 3:6] = bvh.node_max
    nodes8[:, 6] = bvh.node_skip.astype(np.int32).view(np.float32)
    nodes8[:, 7] = leaf_ids.view(np.float32)

    counts = bvh.node_ntri[leaf_mask].astype(np.int32)
    wide, n_wide, depth = collapse4(nodes8, m, width=WIDE_WIDTH,
                                    cluster_counts=counts,
                                    return_depth=True)

    # Mesh-space cluster records: v0 | e1 | e2 per triangle, grouped in
    # leaf order, padded to 8 with zero (degenerate, never-hit) rows.
    # The transform-time record pack recomputes normals and bakes the
    # instance material (combine_instanced).
    ordered = verts[bvh.order].reshape(-1, 9)
    rec = np.zeros((num_leaves, CLUSTER_SIZE, 9), np.float32)
    leaf_nodes = np.nonzero(leaf_mask)[0]
    for li, node in enumerate(leaf_nodes):
        start = int(bvh.node_tri[node])
        count = int(bvh.node_ntri[node])
        v9 = ordered[start:start + count]
        rec[li, :count, 0:3] = v9[:, 0:3]
        rec[li, :count, 3:6] = v9[:, 3:6] - v9[:, 0:3]
        rec[li, :count, 6:9] = v9[:, 6:9] - v9[:, 0:3]

    return MeshBLAS(
        bin_lo=jnp.asarray(bvh.node_min),
        bin_hi=jnp.asarray(bvh.node_max),
        bin_skip=jnp.asarray(bvh.node_skip.astype(np.int32)),
        bin_col7=jnp.asarray(leaf_ids),
        wide=jnp.asarray(wide.reshape(-1, WIDE_WIDTH, 16)[:n_wide]),
        rec=jnp.asarray(rec),
        num_nodes=m,
        num_wide=int(n_wide),
        num_clusters=num_leaves,
        num_triangles=t,
        wide_depth=int(depth),
    )


def _tlas_plan(k: int):
    """Static wide-TLAS shape: list of (row slots -> child row ids) levels.

    k <= 8: one top row whose slots are the instance roots. k <= 64: a
    root row over ceil(k/8) group rows over the instances. Returns
    (n_top_rows, groups) where groups[g] = list of instance indices."""
    if k <= WIDE_WIDTH:
        return 1, [list(range(k))]
    groups = [list(range(g, min(g + WIDE_WIDTH, k)))
              for g in range(0, k, WIDE_WIDTH)]
    assert len(groups) <= WIDE_WIDTH, "MAX_INSTANCES guard failed"
    return 1 + len(groups), groups


def _transform_bounds(lo, hi, scale, pos):
    """Exact AABB image under x -> x*scale + pos (sign-safe)."""
    a = lo * scale
    b = hi * scale
    import jax.numpy as jnp

    return jnp.minimum(a, b) + pos, jnp.maximum(a, b) + pos


@functools.partial(jax.jit, static_argnames=("statics",))
def _combine(blas_arrays, params, statics):
    """The jitted TLAS refit. ``blas_arrays``: tuple per instance of
    (bin_lo, bin_hi, bin_skip, bin_col7, wide[W,8,16], rec[L,8,9]);
    ``params``: tuple per instance of (scale3, pos3, color3, mtype);
    ``statics``: (tuple of (M, W, L, T) per instance, node_cap, wide_cap,
    cluster_cap)."""
    import jax
    import jax.numpy as jnp

    shapes, node_cap, wide_cap, cluster_cap = statics
    k = len(blas_arrays)
    ms = [s[0] for s in shapes]
    ws = [s[1] for s in shapes]
    ls = [s[2] for s in shapes]

    # Binary layout: T_0, B_0, T_1, B_1, ..., T_{k-2}, B_{k-2}, B_{k-1}
    # (T_j = chain internal, B_j = instance j's block).
    boffs = []
    row = 0
    for j in range(k):
        if j <= k - 2:
            row += 1  # T_j sits immediately before B_j (left = node + 1)
        boffs.append(row)
        row += ms[j]
    m_total = row

    n_top_wide, groups = _tlas_plan(k)
    woffs = []
    wrow = n_top_wide
    for j in range(k):
        woffs.append(wrow)
        wrow += ws[j]
    w_total = wrow

    cloffs = []
    crow = 0
    for j in range(k):
        cloffs.append(crow)
        crow += ls[j]
    l_total = crow

    i32 = jnp.int32
    ib = jax.lax.bitcast_convert_type

    # --- per-instance transformed pieces ---
    root_lo, root_hi = [], []
    bin_lo_t, bin_hi_t, bin_skip_g, bin_col7_g = [], [], [], []
    wide_rows = []
    cluster_rows = []
    for j, (arrs, (scale, pos, color, mtype)) in enumerate(
            zip(blas_arrays, params)):
        blo, bhi, bskip, bcol7, wide, rec = arrs
        lo_t, hi_t = _transform_bounds(blo, bhi, scale, pos)
        root_lo.append(lo_t[0])
        root_hi.append(hi_t[0])
        bin_lo_t.append(lo_t)
        bin_hi_t.append(hi_t)
        # Local skip -> global: + block offset (the sentinel M_j lands on
        # T_{j+1} / the global end by construction — see module docstring).
        bin_skip_g.append(bskip + i32(boffs[j]))
        # col7: leaf cid += cluster offset; internal -(left+1) -> left
        # shifts by the block offset, i.e. col7 -= boffs[j].
        bin_col7_g.append(jnp.where(bcol7 >= 0, bcol7 + i32(cloffs[j]),
                                    bcol7 - i32(boffs[j])))

        # Wide table: transform slot bounds, offset slot metas.
        wlo, whi = _transform_bounds(wide[:, :, 0:3], wide[:, :, 3:6],
                                     scale, pos)
        meta = wide[:, :, 6].astype(i32)  # exact int floats -> lossless
        enc = -meta - 1
        cid = enc & i32(LEAF_CID_MASK)
        cnt_bits = enc & ~i32(LEAF_CID_MASK)
        leaf_meta = -((cid + i32(cloffs[j])) | cnt_bits) - 1
        meta_g = jnp.where(meta > 0, meta + i32(woffs[j]),
                           jnp.where(meta < 0, leaf_meta, 0))
        w_j = wide.shape[0]
        # One wide node = WIDE_ROWS consecutive 128-float table rows
        # (1 at width 8, 2 at width 16 — core/fast_types.py).
        wide_rows.append(jnp.concatenate([
            wlo, whi, meta_g.astype(jnp.float32)[:, :, None],
            jnp.zeros((w_j, WIDE_WIDTH, 9), jnp.float32)], axis=2
        ).reshape(w_j * WIDE_ROWS, 128))

        # Cluster records: v0*s+p | e1*s | e2*s | albedo | type | normal.
        l_j = rec.shape[0]
        flat = rec.reshape(l_j * CLUSTER_SIZE, 9)
        v0 = flat[:, 0:3] * scale + pos
        e1 = flat[:, 3:6] * scale
        e2 = flat[:, 6:9] * scale
        nrm = jnp.cross(e1, e2)
        nlen = jnp.sqrt(jnp.sum(nrm * nrm, axis=-1, keepdims=True))
        nrm = jnp.where(nlen > 0.0,
                        nrm / jnp.where(nlen > 0.0, nlen, 1.0), 0.0)
        # Padding rows have e1 == e2 == 0 in mesh space and stay
        # degenerate after the affine map (det == 0 -> never hit).
        mcol = jnp.broadcast_to(mtype, (l_j * CLUSTER_SIZE, 1))
        ccol = jnp.broadcast_to(color, (l_j * CLUSTER_SIZE, 3))
        row16 = jnp.concatenate([v0, e1, e2, ccol, mcol, nrm], axis=1)
        cluster_rows.append(row16.reshape(l_j, CLUSTER_SIZE * TRI_STRIDE))

    root_lo = jnp.stack(root_lo)   # [K, 3]
    root_hi = jnp.stack(root_hi)

    # --- binary TLAS chain rows ---
    # T_j covers instances j..K-1: suffix unions.
    suf_lo = [root_lo[k - 1]]
    suf_hi = [root_hi[k - 1]]
    for j in range(k - 2, -1, -1):
        suf_lo.append(jnp.minimum(root_lo[j], suf_lo[-1]))
        suf_hi.append(jnp.maximum(root_hi[j], suf_hi[-1]))
    suf_lo = suf_lo[::-1]
    suf_hi = suf_hi[::-1]

    bin_parts_lo, bin_parts_hi, bin_parts_skip, bin_parts_col7 = \
        [], [], [], []
    for j in range(k):
        if j <= k - 2:
            bin_parts_lo.append(suf_lo[j][None, :])
            bin_parts_hi.append(suf_hi[j][None, :])
            # T_j's subtree reaches the global end: skip = M_total.
            bin_parts_skip.append(jnp.full((1,), m_total, i32))
            # left child = instance j's root = the very next row.
            bin_parts_col7.append(jnp.full((1,), -(boffs[j] + 1), i32))
        bin_parts_lo.append(bin_lo_t[j])
        bin_parts_hi.append(bin_hi_t[j])
        bin_parts_skip.append(bin_skip_g[j])
        bin_parts_col7.append(bin_col7_g[j])

    all_lo = jnp.concatenate(bin_parts_lo)
    all_hi = jnp.concatenate(bin_parts_hi)
    all_skip = jnp.concatenate(bin_parts_skip)
    all_col7 = jnp.concatenate(bin_parts_col7)

    pad = node_cap - m_total
    big = jnp.float32(1e30)
    nodes8_i = jnp.concatenate([
        ib(all_lo, i32), ib(all_hi, i32),
        all_skip[:, None], all_col7[:, None]], axis=1)
    if pad:
        pad_row = jnp.concatenate([
            ib(jnp.full((pad, 3), big), i32),
            ib(jnp.full((pad, 3), -big), i32),
            jnp.full((pad, 1), m_total, i32),
            jnp.zeros((pad, 1), i32)], axis=1)
        nodes8_i = jnp.concatenate([nodes8_i, pad_row])
    nodes8 = ib(nodes8_i, jnp.float32)

    # --- wide TLAS rows ---
    def wide_row(child_lo, child_hi, child_meta):
        n = child_lo.shape[0]
        slots_lo = jnp.concatenate(
            [child_lo, jnp.zeros((WIDE_WIDTH - n, 3), jnp.float32)])
        slots_hi = jnp.concatenate(
            [child_hi, jnp.zeros((WIDE_WIDTH - n, 3), jnp.float32)])
        metas = jnp.concatenate(
            [child_meta, jnp.zeros((WIDE_WIDTH - n,), jnp.float32)])
        return jnp.concatenate(
            [slots_lo, slots_hi, metas[:, None],
             jnp.zeros((WIDE_WIDTH, 9), jnp.float32)],
            axis=1).reshape(WIDE_ROWS, 128)

    top_rows = []
    if n_top_wide == 1:
        metas = jnp.asarray([float(woffs[j] + 1) for j in range(k)],
                            jnp.float32)
        top_rows.append(wide_row(root_lo, root_hi, metas))
    else:
        # Root (row 0) points at group rows 1..G; group g covers its
        # instances.
        g_lo = jnp.stack([jnp.min(root_lo[g[0]:g[-1] + 1], axis=0)
                          for g in groups])
        g_hi = jnp.stack([jnp.max(root_hi[g[0]:g[-1] + 1], axis=0)
                          for g in groups])
        root_metas = jnp.asarray([float(1 + g + 1)
                                  for g in range(len(groups))], jnp.float32)
        top_rows.append(wide_row(g_lo, g_hi, root_metas))
        for g in groups:
            metas = jnp.asarray([float(woffs[j] + 1) for j in g],
                                jnp.float32)
            top_rows.append(wide_row(root_lo[g[0]:g[-1] + 1],
                                     root_hi[g[0]:g[-1] + 1], metas))

    nodes4 = jnp.concatenate(top_rows + wide_rows)
    wpad = wide_cap - w_total
    if wpad:
        nodes4 = jnp.concatenate(
            [nodes4, jnp.zeros((wpad * WIDE_ROWS, 128), jnp.float32)])

    # Flat [l_total, CLUSTER_SIZE*16] leaf records in global cid order,
    # regrouped into 128-float table rows (SUBS_PER_ROW consecutive
    # leaves per row — core/fast_types.py). cluster_cap is a power of
    # two, so always SUBS_PER_ROW-divisible.
    clusters = jnp.concatenate(cluster_rows)
    cpad = cluster_cap - l_total
    if cpad:
        clusters = jnp.concatenate(
            [clusters,
             jnp.zeros((cpad, CLUSTER_SIZE * TRI_STRIDE), jnp.float32)])
    clusters = clusters.reshape(-1, CLUSTER_ROW)

    return nodes8, nodes4, clusters, jnp.int32(m_total), jnp.int32(w_total)


def combine_instanced(blases: Sequence[MeshBLAS], params) -> FastScene:
    """params: per instance (scale f32[3], pos f32[3], color f32[3],
    mtype f32 scalar) — device arrays or floats."""
    k = len(blases)
    assert 1 <= k <= MAX_INSTANCES
    n_top_wide, _ = _tlas_plan(k)
    # Stack bound: the TLAS adds 1-2 wide levels above every BLAS.
    worst = (WIDE_WIDTH - 1) * (max(b.wide_depth for b in blases)
                                + n_top_wide) + 1
    if worst > STACK_CAP:
        raise ValueError(f"instanced wide depth needs {worst} stack slots "
                         f"> STACK_CAP {STACK_CAP}")

    m_total = (k - 1) + sum(b.num_nodes for b in blases)
    w_total = n_top_wide + sum(b.num_wide for b in blases)
    l_total = sum(b.num_clusters for b in blases)
    assert l_total <= (1 << LEAF_CID_BITS)
    statics = (
        tuple((b.num_nodes, b.num_wide, b.num_clusters, b.num_triangles)
              for b in blases),
        _bucket(m_total), _bucket(w_total), _bucket(l_total),
    )
    blas_arrays = tuple(
        (b.bin_lo, b.bin_hi, b.bin_skip, b.bin_col7, b.wide, b.rec)
        for b in blases)
    nodes8, nodes4, clusters, m_tot, w_tot = _combine(
        blas_arrays, tuple(params), statics)
    import jax.numpy as jnp

    return FastScene(
        nodes8=nodes8,
        clusters=clusters,
        num_nodes=m_tot,
        num_triangles=jnp.int32(sum(b.num_triangles for b in blases)),
        nodes4=nodes4,
        num_nodes4=w_tot,
    )
