"""Binary BVH -> wide-BVH collapse (host side; production width is 8).

The Pallas traversal pays per-*visit* scalar costs (node-row DMA wait,
SMEM loads, loop overhead) while extra vector slab tests are nearly free
(exp14). A 4-wide node tests 4 child boxes per visit for ~the cost of a
binary node's 1, roughly halving visit counts (exp15: primaries 2.3x,
sorted bounce-1 1.2x on the flagship scene).

Collapse (the standard wide-BVH construction, cf. Wald et al., "Getting
rid of packets"/'08-style SIMD BVHs): take a binary internal node's two
children and repeatedly expand the largest-surface-area internal slot
until 4 slots are filled or all are leaves.

Layout: one wide node = width x 16 floats = width children x [min(3)
max(3) meta pad9]; at the production width 8 that is ONE node per
128-float row (the proven SMEM-DMA shape, kernels/pallas_trace.py), at
width 4 two nodes per row. meta is a float-encoded exact int: > 0
internal (wide id + 1), < 0 leaf (-(cid | (count-1 << LEAF_CID_BITS))-1
— cluster id plus its live-triangle count so the kernels can skip the
padded half of underfull clusters), 0 empty slot; |meta| < 2^23 stays
exact in f32.
The production width is single-sourced as
``core.fast_types.WIDE_WIDTH`` — the traversal kernel's row indexing
(row == wide node id) is only valid at width 8.

Reference analogue: the flat pre-order binary layout mirrors
``BVHFlattener.java``; the 4-wide collapse has no reference counterpart
(the GPU walks per-thread stacks, compute_dynamic_ray.comp:157).
"""

from __future__ import annotations

import numpy as np

NODE4_FLOATS = 64
PACK_LANES = 128


# SMEM traversal stack bound (kernels/pallas_trace.STACK4_CAP /
# kernels/pallas_mega.STACK_CAP): each visit pops 1 and pushes at most
# `width` entries, so the stack never exceeds (width-1)*depth + 1. The
# collapse asserts the built tree respects it — a degenerate tree would
# otherwise silently overwrite SMEM past the stack.
STACK_CAP = 256


def collapse4(nodes8: np.ndarray, num_nodes: int, width: int = 4,
              cluster_counts: np.ndarray | None = None,
              return_depth: bool = False,
              return_slots: bool = False):
    """Collapse pre-order binary ``nodes8`` into BVH-``width`` arrays.

    Args:
      nodes8: f32[M, 8] binary nodes — bounds + bitcast-i32 skip/col7
        (col7 >= 0 leaf cluster id; < 0 -> left child = -(col7)-1).
      num_nodes: valid prefix length.
      width: children per wide node (4 -> two 64-float nodes per row,
        8 -> one 128-float node per row; production uses 8, see
        ``core.fast_types.WIDE_WIDTH``).
      cluster_counts: optional i32[L] live-triangle count per cluster id
        (1..CLUSTER_SIZE). Encoded into the leaf metas so the traversal
        kernels skip the padded half of underfull clusters (mean flagship
        occupancy is ~6/8); omitted -> counts encode as CLUSTER_SIZE.
      return_depth: also return the wide-tree depth (max_depth + 1) so a
        caller that grafts this table under extra levels (the instanced
        TLAS, scene/instanced.py) can re-check the SMEM stack bound.
      return_slots: also return i32[n_wide, width] of the BINARY node row
        each slot's bounds came from (-1 = empty slot) — the static
        topology map the per-frame device refit gathers fresh AABBs
        through (scene/refit.py).
    Returns:
      (packed f32[R, 128], n_wide[, depth][, slot_rows]):
      R = ceil(n_wide*width/16).
    """
    nodes = np.asarray(nodes8)[:num_nodes]
    links = nodes[:, 6:8].view(np.int32)
    skip, col7 = links[:, 0], links[:, 1]

    def area(b):
        d = np.maximum(b[3:6] - b[0:3], 0.0)
        return 2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

    out = []      # wide id -> list of ('leaf'|'int', id, bounds)
    b2q = {}      # binary internal id -> wide id
    depth = {}    # binary internal id -> wide-tree depth
    max_depth = 0
    pending = []

    def create(b):
        nonlocal max_depth
        if b in b2q:
            return b2q[b]
        my = len(out)
        b2q[b] = my
        d_my = depth.get(b, 0)
        max_depth = max(max_depth, d_my)
        left = b + 1
        slots = [left, skip[left]]
        while len(slots) < width:
            best, best_a = -1, -1.0
            for i, s in enumerate(slots):
                if col7[s] < 0 and area(nodes[s]) > best_a:
                    best, best_a = i, area(nodes[s])
            if best < 0:
                break
            s = slots.pop(best)
            slots.extend([s + 1, skip[s + 1]])
        ent = []
        for s in slots:
            if col7[s] >= 0:
                ent.append(("leaf", int(col7[s]), nodes[s, :6], int(s)))
            else:
                ent.append(("int", int(s), nodes[s, :6], int(s)))
                depth[int(s)] = d_my + 1
                pending.append(int(s))
        out.append(ent)
        return my

    if col7[0] >= 0:
        out.append([("leaf", int(col7[0]), nodes[0, :6], 0)])
    else:
        create(0)
        while pending:
            create(pending.pop())

    # SMEM stack safety (ADVICE r2): worst-case stack occupancy during the
    # kernel's depth-first walk.
    worst_sp = (width - 1) * (max_depth + 1) + 1
    if worst_sp > STACK_CAP:
        raise ValueError(
            f"wide-BVH depth {max_depth + 1} would need {worst_sp} stack "
            f"slots > STACK_CAP {STACK_CAP}; refuse to build a table that "
            "can overflow the kernel's SMEM stack")

    n4 = len(out)
    node_floats = 16 * width
    arr = np.zeros((n4, node_floats), np.float32)
    from raytracer_tpu.core.fast_types import CLUSTER_SIZE, LEAF_CID_BITS

    def leaf_meta(cid):
        cnt = (CLUSTER_SIZE if cluster_counts is None
               else int(cluster_counts[cid]))
        assert 1 <= cnt <= CLUSTER_SIZE and cid < (1 << LEAF_CID_BITS)
        return -((cid | ((cnt - 1) << LEAF_CID_BITS)) + 1)

    for qid, ent in enumerate(out):
        for c, e in enumerate(ent):
            base = 16 * c
            arr[qid, base:base + 6] = e[2]
            arr[qid, base + 6] = (leaf_meta(e[1]) if e[0] == "leaf"
                                  else b2q[e[1]] + 1)
        # remaining slots keep meta == 0 (empty)
    if node_floats <= PACK_LANES:
        per_row = PACK_LANES // node_floats  # 2 for width 4, 1 for width 8
        rows = -(-n4 // per_row)
        packed = np.zeros((rows, PACK_LANES), np.float32)
        packed.reshape(rows * per_row, node_floats)[:n4] = arr
    else:
        # Width 16: one node spans node_floats/128 consecutive table rows
        # (node i at rows i*rpn .. i*rpn+rpn-1 — the kernels DMA rpn rows
        # per visit).
        rpn = node_floats // PACK_LANES
        packed = arr.reshape(n4 * rpn, PACK_LANES)
    ret = (packed, n4)
    if return_depth:
        ret = ret + (max_depth + 1,)
    if return_slots:
        slot_rows = np.full((n4, width), -1, np.int32)
        for qid, ent in enumerate(out):
            for c, e in enumerate(ent):
                slot_rows[qid, c] = e[3]
        ret = ret + (slot_rows,)
    return ret if len(ret) > 2 else (packed, n4)
