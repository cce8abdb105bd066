"""Host-side BVH build + pre-order flatten (NumPy).

Capability-parity with the reference CPU pipeline
(``bvh/BVHBuilder.java:48-93`` recursive median split;
``bvh/BVHFlattener.java:51-90`` pre-order DFS flatten with the
internal(data=left, count=right) / leaf(data=-(tri+1), count=-1) encoding),
with two deliberate design changes:

* **Deterministic split axis**: longest axis of the node's AABB instead of
  the reference's random axis per node (``BVHBuilder.java:53``) — the
  reference even ships an unused ``AABB.getLongestAxis`` (``AABB.java:53``).
  Reproducible trees make golden-image tests possible.
* **No duplicated leaves**: the reference wraps a single remaining triangle
  in a BVHNode with left==right, which flattens the same triangle into the
  vertex buffer twice (``BVHBuilder.java:60-62`` + ``BVHFlattener.java:76-86``).
  We emit a real leaf, giving exactly ``2T-1`` nodes and ``T`` stored
  triangles for T input triangles.
* **Skip links**: each node also gets a pre-order escape index so device
  traversal needs no stack (see ``core/types.FlatBVH``).

Leaves hold ``leaf_size`` triangles (default 1 == reference). Larger leaves
trade tree depth for dense vectorized triangle tests — the TPU-friendly
two-level shape (see kernels/).
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np

from raytracer_tpu.core.types import FlatBVH
from raytracer_tpu.utils.log import get_logger

_log = get_logger("bvh")

# Degenerate-axis epsilon for triangle AABBs (reference Triangle.java:61-71).
AABB_EPS = 1e-4


@dataclasses.dataclass
class HostBVH:
    """NumPy result of a build: flat nodes + triangle reordering."""

    node_min: np.ndarray    # f32[M, 3]
    node_max: np.ndarray    # f32[M, 3]
    node_tri: np.ndarray    # i32[M]  first-tri index for leaves, -1 internal
    node_ntri: np.ndarray   # i32[M]  triangles in leaf, 0 for internal
    node_skip: np.ndarray   # i32[M]
    node_data: np.ndarray   # i32[M]  reference encoding (valid iff leaf_size==1)
    node_count: np.ndarray  # i32[M]
    order: np.ndarray       # i64[T]  flattened position -> original tri index

    @property
    def num_nodes(self) -> int:
        return self.node_min.shape[0]

    def to_flat(self) -> FlatBVH:
        import jax.numpy as jnp

        return FlatBVH(
            node_min=jnp.asarray(self.node_min),
            node_max=jnp.asarray(self.node_max),
            node_tri=jnp.asarray(self.node_tri),
            node_skip=jnp.asarray(self.node_skip),
            node_data=jnp.asarray(self.node_data),
            node_count=jnp.asarray(self.node_count),
        )


def triangle_aabbs(tris: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-triangle AABBs with epsilon padding on degenerate axes."""
    lo = tris.min(axis=1)
    hi = tris.max(axis=1)
    thin = (hi - lo) < AABB_EPS
    lo = np.where(thin, lo - AABB_EPS, lo)
    hi = np.where(thin, hi + AABB_EPS, hi)
    return lo.astype(np.float32), hi.astype(np.float32)


def build_bvh(tris: np.ndarray, leaf_size: int = 1,
              method: str | None = None) -> HostBVH:
    """Build + flatten in one pass.

    Args:
      tris: f32[T, 3, 3] triangle soup (already instance-transformed).
      leaf_size: max triangles per leaf.
      method: split policy override ("sah"/"sbvh"/"ploc"/"median");
        defaults to the RAYTPU_BVH env knob (callers like the refit
        topology capture pick their own default, scene/refit.py).
    Returns:
      HostBVH whose ``order`` reorders triangles into flattened (leaf) order,
      the analogue of ``BVHFlattener.flattenedTriangles``.

    Uses the C++ builder (native/raytpu_native.cpp) when available; the
    NumPy implementation below is the reference/fallback. RAYTPU_NATIVE=0
    disables the native path.
    """
    import os

    if method is None:
        method = os.environ.get("RAYTPU_BVH", "sah")
    if os.environ.get("RAYTPU_NATIVE", "1") != "0" and len(tris):
        try:
            from raytracer_tpu import native_bridge

            # Binned SAH by default when native is available (same layout,
            # ~1.5-2x fewer node visits); RAYTPU_BVH=median restores the
            # NumPy-identical reference split.
            bvh = native_bridge.build_bvh(np.asarray(tris, np.float32),
                                          leaf_size, method=method)
            if bvh is not None:
                return bvh
        except Exception:
            _log.exception("native BVH build failed; using NumPy")
    if method == "ploc" and len(tris):
        # NumPy fallback of the capped-leaf PLOC (bvh/ploc.py; the native
        # builder above emits the identical tree): exp35 measured
        # x0.89-0.92 visit events vs the SAH sweep — per r3f, visit
        # events are the TPU frame cost.
        try:
            from raytracer_tpu.bvh.ploc import build_bvh_ploc

            return build_bvh_ploc(tris, leaf_size=leaf_size)
        except Exception:
            _log.exception("PLOC build failed; falling back to median")
    return build_bvh_numpy(tris, leaf_size)


def build_bvh_numpy(tris: np.ndarray, leaf_size: int = 1) -> HostBVH:
    """Pure-NumPy reference implementation."""
    t0 = time.perf_counter()
    tris = np.asarray(tris, np.float32)
    n = tris.shape[0]
    if n == 0:
        raise ValueError("cannot build BVH from empty triangle list")

    lo, hi = triangle_aabbs(tris)
    centers = (lo + hi) * 0.5

    # Subtree node count for a segment of k tris, following the actual
    # median-split recursion (k -> k//2, k-k//2, leaf at k <= leaf_size).
    import functools

    @functools.lru_cache(maxsize=None)
    def subtree_nodes(k: int) -> int:
        if k <= leaf_size:
            return 1
        return 1 + subtree_nodes(k // 2) + subtree_nodes(k - k // 2)

    m = subtree_nodes(n)
    node_min = np.empty((m, 3), np.float32)
    node_max = np.empty((m, 3), np.float32)
    node_tri = np.full(m, -1, np.int32)
    node_ntri = np.zeros(m, np.int32)
    node_skip = np.empty(m, np.int32)
    node_data = np.empty(m, np.int32)
    node_count = np.empty(m, np.int32)
    order = np.empty(n, np.int64)

    idx = np.arange(n)  # mutable permutation of triangle ids
    next_node = 0
    next_tri = 0

    # Explicit stack of (start, end, skip_index); LIFO pop order gives
    # pre-order DFS emission (left subtree immediately after its parent).
    stack: list[tuple[int, int, int]] = [(0, n, m)]
    while stack:
        start, end, skip = stack.pop()
        my = next_node
        next_node += 1
        seg = idx[start:end]
        node_min[my] = lo[seg].min(axis=0)
        node_max[my] = hi[seg].max(axis=0)
        node_skip[my] = skip
        k = end - start

        if k <= leaf_size:
            node_tri[my] = next_tri
            node_ntri[my] = k
            order[next_tri:next_tri + k] = seg
            # Reference leaf encoding (single-tri leaves).
            node_data[my] = -(next_tri + 1)
            node_count[my] = -1
            next_tri += k
            continue

        ext = node_max[my] - node_min[my]
        axis = int(np.argmax(ext))
        if k == 2:
            # Direct compare (reference BVHBuilder.java:63-71).
            if centers[seg[0], axis] > centers[seg[1], axis]:
                idx[start], idx[start + 1] = idx[start + 1], idx[start]
        else:
            # Median split: partial sort by AABB center along axis.
            mid_off = k // 2
            part = np.argpartition(centers[seg, axis], mid_off)
            idx[start:end] = seg[part]
        mid = start + k // 2

        left_nodes = subtree_nodes(mid - start)
        right_index = my + 1 + left_nodes
        node_data[my] = my + 1
        node_count[my] = right_index
        # Push right first so left pops first (pre-order).
        stack.append((mid, end, skip))
        stack.append((start, mid, right_index))

    assert next_node == m and next_tri == n
    _log.debug("BVH build: %d tris -> %d nodes in %.2f ms",
               n, m, (time.perf_counter() - t0) * 1e3)
    return HostBVH(node_min, node_max, node_tri, node_ntri, node_skip,
                   node_data, node_count, order)
