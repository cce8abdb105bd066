"""Packed scene layout for the packet (tile) tracer.

Motivated by measured TPU gather behaviour (PERF_NOTES.md): gathers are
row-rate limited and ~4x faster on tables under ~16k rows, and rows up to
~128 floats are nearly free. So the fast path packs:

* ``nodes8`` f32[M, 8]: bbox min(3) + max(3) + bitcast<i32> skip link +
  bitcast<i32> leaf/cluster id (-1 for internal). leaf_size=8 keeps
  M = 2*ceil(T/8)-1 under 16k rows for 50k-triangle scenes.
* ``clusters`` f32[L, 128]: 8 triangles x 16 floats each
  (v0.xyz, e1.xyz, e2.xyz, albedo.rgb, material type, n.xyz) — one fat-row
  gather fetches geometry *and* shading data for a whole leaf. The MT edge
  vectors e1 = v1-v0, e2 = v2-v0 and the *unit geometric normal*
  n = normalize(cross(e1, e2)) are precomputed at pack time: a leaf visit
  in the Pallas kernels previously spent ~20 scalar ops per triangle
  recomputing them (subs + cross + sqrt + div) — per-visit scalar cost is
  the traversal's bottleneck (PERF_NOTES.md). Degenerate padding
  triangles pack as all-zeros (det == 0, never hit).

This is the TPU answer to the reference's three separate SSBOs
(vertex/material/BVH, ``engine/VulkanEngine.java:335-359``).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

from raytracer_tpu.core.types import _register

Array = Any

# Triangles per leaf cluster. exp33 (cid-sorted bounce-1 tiles, measured
# per-op costs): the vectorized MT test's lane waste dominates the walk
# so hard that THINNER leaves win despite more node visits — modeled
# walk cost 0.79x at 4, 0.67x at 2 vs the long-standing 8. Import-time
# env knob (like RAYTPU_TRAVERSE) for TPU A/Bs; all packers, kernels and
# the LBVH derive shapes from it.
CLUSTER_SIZE = int(os.environ.get("RAYTPU_CLUSTER", "8"))
assert CLUSTER_SIZE in (2, 4, 8), "kernel halving logic assumes 2/4/8"
TRI_STRIDE = 16       # floats per packed triangle
# The clusters TABLE keeps 128-float rows (8 triangles) at every
# CLUSTER_SIZE: Mosaic cannot slice a VMEM-resident table at lane widths
# below the 128 tiling (measured: "Slice shape along dimension 1 must be
# aligned to tiling (128), but is 64"), so a thin leaf is a SUBCLUSTER of
# a shared row — row = cid >> SUB_SHIFT, first slot = (cid & SUB_MASK) *
# CLUSTER_SIZE. Leaves stay packed consecutively in cid order, so the
# table bytes are identical to CLUSTER_SIZE=8 and the per-visit DMA shape
# ([1, 128]) never changes; at CLUSTER_SIZE=8 everything reduces to the
# historical one-leaf-per-row layout.
ROW_TRIS = 8
CLUSTER_ROW = ROW_TRIS * TRI_STRIDE  # 128 always
SUBS_PER_ROW = ROW_TRIS // CLUSTER_SIZE
SUB_SHIFT = SUBS_PER_ROW.bit_length() - 1
SUB_MASK = SUBS_PER_ROW - 1
# Children per wide-BVH node (single source; bvh/bvh4.py builds it and
# kernels/pallas_trace.py + kernels/pallas_mega.py consume it). The r3f
# thin-leaf A/B measured that per-VISIT fixed cost dominates the walk
# (T=2's 4x fewer MT lane-tests still lost 19% frame-level because total
# visit events grew 1.36x), which flips exp28's BVH16 verdict: x0.74
# visits at x1.49 (nearly free) vector slab ops should WIN. Env knob for
# the TPU A/B: at 16, one node = 16 children x 16 floats = TWO 128-float
# table rows (node i at packed rows 2i, 2i+1); the on-device LBVH wide
# emit stays 8-wide only (bvh/lbvh.py), so live-edit device rebuilds
# require the default.
WIDE_WIDTH = int(os.environ.get("RAYTPU_WIDE", "8"))
assert WIDE_WIDTH in (8, 16), "kernels support widths 8 and 16"
# Packed table rows per wide node (1 at width 8, 2 at width 16).
WIDE_ROWS = (WIDE_WIDTH * 16) // 128
# Wide-table leaf metas pack (cluster id | (count-1) << LEAF_CID_BITS):
# the live-triangle count lets the traversal kernels skip the padded
# second half of underfull clusters (flagship mean occupancy ~6/8).
# 20 id bits + 3 count bits keep |meta| < 2^23 — exact as f32.
LEAF_CID_BITS = 20
LEAF_CID_MASK = (1 << LEAF_CID_BITS) - 1


@_register
@dataclasses.dataclass
class FastScene:
    """Device-resident packed scene for the packet tracer.

    ``nodes4`` (historical name; the table is ``WIDE_WIDTH``-wide, i.e.
    8-wide in production) is the wide collapse of the same tree
    (bvh/bvh4.py): f32[Rpad, 128], ONE 8-child node per 128-float row,
    child meta floats encoding >0 internal wide id + 1 / <0
    -((cid | (count-1 << LEAF_CID_BITS)) + 1) / 0 empty. Host builds and the on-device LBVH
    rebuild (bvh/lbvh.py wide emit) both provide it; when absent the
    Pallas traversal falls back to the binary packed path.
    """

    nodes8: Array        # f32[Mpad, 8]
    clusters: Array      # f32[Lpad, 128]
    num_nodes: Array     # i32 scalar
    num_triangles: Array  # i32 scalar
    nodes4: Array | None = None   # f32[Rpad, 128] wide-BVH table or None
    num_nodes4: Array | None = None  # i32 scalar or None

    @property
    def node_capacity(self) -> int:
        return self.nodes8.shape[0]
