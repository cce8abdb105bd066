"""Packed scene layout for the packet (tile) tracer.

Motivated by measured TPU gather behaviour (PERF_NOTES.md): gathers are
row-rate limited and ~4x faster on tables under ~16k rows, and rows up to
~128 floats are nearly free. So the fast path packs:

* ``nodes8`` f32[M, 8]: bbox min(3) + max(3) + bitcast<i32> skip link +
  bitcast<i32> leaf/cluster id (-1 for internal). leaf_size=8 keeps
  M = 2*ceil(T/8)-1 under 16k rows for 50k-triangle scenes.
* ``clusters`` f32[L, 128]: 8 triangles x 16 floats each
  (v0.xyz, v1.xyz, v2.xyz, albedo.rgb, material type, 3 pad) — one fat-row
  gather fetches geometry *and* shading data for a whole leaf.

This is the TPU answer to the reference's three separate SSBOs
(vertex/material/BVH, ``engine/VulkanEngine.java:335-359``).
"""

from __future__ import annotations

import dataclasses
from typing import Any

from raytracer_tpu.core.types import _register

Array = Any

CLUSTER_SIZE = 8      # triangles per leaf
TRI_STRIDE = 16       # floats per packed triangle
CLUSTER_ROW = CLUSTER_SIZE * TRI_STRIDE  # 128


@_register
@dataclasses.dataclass
class FastScene:
    """Device-resident packed scene for the packet tracer.

    ``nodes4`` (optional) is the 4-wide collapse of the same tree
    (bvh/bvh4.py): f32[Rpad, 128], two 64-float BVH4 nodes per row.
    Host builds provide it (the Pallas traversal is ~2x faster on it);
    the on-device LBVH rebuild leaves it None and traversal falls back
    to the binary packed path.
    """

    nodes8: Array        # f32[Mpad, 8]
    clusters: Array      # f32[Lpad, 128]
    num_nodes: Array     # i32 scalar
    num_triangles: Array  # i32 scalar
    nodes4: Array | None = None   # f32[Rpad, 128] or None
    num_nodes4: Array | None = None  # i32 scalar or None

    @property
    def node_capacity(self) -> int:
        return self.nodes8.shape[0]
