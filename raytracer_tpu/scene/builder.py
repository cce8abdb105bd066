"""Scene build pipeline: instances -> transformed soup -> BVH -> GpuScene.

The TPU-native Scene Rebuild Thread ("SRT", reference
``renderer/SceneBuilder.java:38-118``): per instance, load the .obj,
scale-then-translate every vertex, bake the instance color + material type
per triangle, then build one unified BVH over everything, reorder triangles
into flattened order, and pack device buffers.

Differences from the reference:
* failed model loads are skipped with a warning (same policy,
  ``SceneBuilder.java:55-58``), empty scenes yield a valid 0-triangle scene
  (dummy-buffer analogue of ``VulkanEngine.java:362-364``);
* device buffers are padded to power-of-two *capacity buckets* so that jit
  recompiles happen only when a scene outgrows its bucket, never on ordinary
  edits (the reference re-binds descriptor sets instead,
  ``VulkanEngine.java:318-373``).
"""

from __future__ import annotations

import os
import time
from typing import Sequence

import numpy as np

from raytracer_tpu.bvh.build import build_bvh
from raytracer_tpu.core.types import FlatBVH, GpuScene
from raytracer_tpu.scene.objloader import load_obj
from raytracer_tpu.scene.scene import ModelInstance
from raytracer_tpu.utils.log import get_logger

_log = get_logger("srt")

_MIN_CAPACITY = 64
_BIG = np.float32(1e30)


def _bucket(n: int) -> int:
    """Smallest power-of-two capacity >= n (minimum 64)."""
    c = _MIN_CAPACITY
    while c < n:
        c *= 2
    return c


def gather_triangles(
    instances: Sequence[ModelInstance],
) -> tuple[np.ndarray, np.ndarray]:
    """Load + transform all instances -> (verts f32[T,3,3], mats f32[T,4])."""
    all_verts = []
    all_mats = []
    for i, inst in enumerate(instances):
        try:
            tris = load_obj(inst.model_path)
        except Exception as e:  # skip-and-continue policy
            _log.warning("failed to load model %s (%s): %s",
                         inst.display_name, inst.model_path, e)
            continue
        if tris.shape[0] == 0:
            continue
        tris = inst.transform(tris)
        mat = np.empty((tris.shape[0], 4), np.float32)
        mat[:, 0:3] = np.asarray(inst.color, np.float32)
        mat[:, 3] = inst.material_type
        all_verts.append(tris.astype(np.float32))
        all_mats.append(mat)
        _log.debug("instance [%d] %s: %d triangles", i, inst.display_name,
                   tris.shape[0])
    if not all_verts:
        return np.zeros((0, 3, 3), np.float32), np.zeros((0, 4), np.float32)
    return np.concatenate(all_verts), np.concatenate(all_mats)


def build_gpu_scene(
    instances: Sequence[ModelInstance],
    leaf_size: int = 1,
    device=None,
) -> GpuScene:
    """Full SRT pass -> device-resident GpuScene pytree."""
    verts, mats = gather_triangles(instances)
    return build_gpu_scene_from_arrays(verts, mats, leaf_size=leaf_size,
                                       device=device)


def build_gpu_scene_from_arrays(
    verts: np.ndarray,
    mats: np.ndarray,
    leaf_size: int = 1,
    device=None,
) -> GpuScene:
    """Pack an already-transformed triangle soup into a device scene."""
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    verts = np.asarray(verts, np.float32)
    mats = np.asarray(mats, np.float32)
    n = verts.shape[0]

    if n == 0:
        # Valid empty scene: one unreachable leaf (inverted AABB never hits),
        # one degenerate triangle.
        tcap = _MIN_CAPACITY
        mcap = _MIN_CAPACITY
        host = dict(
            node_min=np.full((mcap, 3), _BIG, np.float32),
            node_max=np.full((mcap, 3), -_BIG, np.float32),
            node_tri=np.zeros(mcap, np.int32),
            node_skip=np.ones(mcap, np.int32),
            node_data=np.full(mcap, -1, np.int32),
            node_count=np.full(mcap, -1, np.int32),
        )
        tri_verts = np.zeros((tcap, 3, 3), np.float32)
        materials = np.zeros((tcap, 4), np.float32)
        num_tris, num_nodes = 0, 1
    else:
        bvh = build_bvh(verts, leaf_size=leaf_size)
        # SBVH trees duplicate straddling triangles (order repeats ids),
        # so the flattened buffers are sized by reference count.
        n_refs = len(bvh.order)
        tcap = _bucket(n_refs)
        mcap = _bucket(bvh.num_nodes)

        tri_verts = np.zeros((tcap, 3, 3), np.float32)
        tri_verts[:n_refs] = verts[bvh.order]
        materials = np.zeros((tcap, 4), np.float32)
        materials[:n_refs] = mats[bvh.order]

        host = dict(
            node_min=np.full((mcap, 3), _BIG, np.float32),
            node_max=np.full((mcap, 3), -_BIG, np.float32),
            node_tri=np.zeros(mcap, np.int32),
            node_skip=np.full(mcap, bvh.num_nodes, np.int32),
            node_data=np.full(mcap, -1, np.int32),
            node_count=np.full(mcap, -1, np.int32),
        )
        host["node_min"][:bvh.num_nodes] = bvh.node_min
        host["node_max"][:bvh.num_nodes] = bvh.node_max
        host["node_tri"][:bvh.num_nodes] = bvh.node_tri
        host["node_skip"][:bvh.num_nodes] = bvh.node_skip
        host["node_data"][:bvh.num_nodes] = bvh.node_data
        host["node_count"][:bvh.num_nodes] = bvh.node_count
        num_tris, num_nodes = n_refs, bvh.num_nodes

    put = (lambda x: jax.device_put(jnp.asarray(x), device)) if device \
        else (lambda x: jnp.asarray(x))
    scene = GpuScene(
        bvh=FlatBVH(**{k: put(v) for k, v in host.items()}),
        tri_verts=put(tri_verts),
        materials=put(materials),
        num_triangles=put(np.int32(num_tris)),
        num_nodes=put(np.int32(num_nodes)),
    )
    _log.info("scene built: %d tris, %d nodes (caps %d/%d) in %.1f ms",
              num_tris, num_nodes, tcap, mcap,
              (time.perf_counter() - t0) * 1e3)
    return scene


def pack_tri_records(v9: np.ndarray, m4: np.ndarray) -> np.ndarray:
    """[T,9] verts + [T,4] mats -> [T,16] packed cluster records.

    Record layout (core/fast_types.py): v0, e1=v1-v0, e2=v2-v0, albedo,
    type, unit geometric normal normalize(cross(e1,e2)). Precomputing the
    MT edges + normal at pack time removes ~20 scalar ops per triangle
    from every Pallas leaf visit. All f32 (matches in-kernel arithmetic).
    """
    v9 = np.asarray(v9, np.float32)
    m4 = np.asarray(m4, np.float32)
    v0 = v9[:, 0:3]
    e1 = v9[:, 3:6] - v0
    e2 = v9[:, 6:9] - v0
    nrm = np.cross(e1, e2).astype(np.float32)
    nlen = np.sqrt((nrm * nrm).sum(-1, keepdims=True, dtype=np.float32))
    nrm = np.where(nlen > 0.0, nrm / np.where(nlen > 0.0, nlen, 1.0), 0.0)
    return np.concatenate(
        [v0, e1, e2, m4[:, 0:3], m4[:, 3:4], nrm.astype(np.float32)],
        axis=1).astype(np.float32)


def build_fast_scene(instances: Sequence[ModelInstance], device=None):
    verts, mats = gather_triangles(instances)
    return build_fast_scene_from_arrays(verts, mats, device=device)


def build_fast_scene_from_arrays(verts: np.ndarray, mats: np.ndarray,
                                 device=None):
    """Pack a triangle soup into the packet-tracer layout (FastScene).

    leaf_size = CLUSTER_SIZE (8): each leaf's triangles are packed into one
    128-float row carrying vertices + baked material, so a leaf visit is a
    single fat-row gather (PERF_NOTES.md).
    """
    import jax
    import jax.numpy as jnp

    from raytracer_tpu.core.fast_types import (
        CLUSTER_ROW, CLUSTER_SIZE, SUBS_PER_ROW, FastScene, TRI_STRIDE)

    t0 = time.perf_counter()
    verts = np.asarray(verts, np.float32)
    mats = np.asarray(mats, np.float32)
    n = verts.shape[0]

    if n == 0:
        mcap = _MIN_CAPACITY
        nodes8 = np.zeros((mcap, 8), np.float32)
        nodes8[:, 0:3] = _BIG
        nodes8[:, 3:6] = -_BIG
        nodes8[:, 6] = np.full((), 1, np.int32).view(np.float32)  # skip
        nodes8[:, 7] = np.full((), 0, np.int32).view(np.float32)  # leaf 0
        # Match the non-empty minimum bucket's TABLE shape (lcap leaves =
        # lcap // SUBS_PER_ROW rows) so empty and minimum scenes share a
        # jit executable at every CLUSTER_SIZE (ADVICE r3).
        clusters = np.zeros((_MIN_CAPACITY // SUBS_PER_ROW, CLUSTER_ROW),
                            np.float32)
        num_nodes = 1
    else:
        bvh = build_bvh(verts, leaf_size=CLUSTER_SIZE)
        m = bvh.num_nodes
        mcap = _bucket(m)
        num_leaves = int((bvh.node_tri >= 0).sum())
        lcap = _bucket(num_leaves)

        # col7 encoding: leaves -> dense cluster id (>= 0); internal ->
        # -(left_child + 1) (pre-order: left = node + 1).
        leaf_mask = bvh.node_tri >= 0
        leaf_ids = np.empty(m, np.int32)
        leaf_ids[leaf_mask] = np.arange(num_leaves, dtype=np.int32)
        internal = np.nonzero(~leaf_mask)[0]
        leaf_ids[internal] = -(internal.astype(np.int32) + 1 + 1)

        nodes8 = np.zeros((mcap, 8), np.float32)
        nodes8[:, 0:3] = _BIG
        nodes8[:, 3:6] = -_BIG
        nodes8[:m, 0:3] = bvh.node_min
        nodes8[:m, 3:6] = bvh.node_max
        skips = np.full(mcap, m, np.int32)
        skips[:m] = bvh.node_skip
        nodes8[:, 6] = skips.view(np.float32)
        lids = np.zeros(mcap, np.int32)
        lids[:m] = leaf_ids
        nodes8[:, 7] = lids.view(np.float32)

        # Pack clusters: flat [L, CLUSTER_SIZE tris x 16 floats] in leaf
        # order, reshaped below into 128-float table rows (SUBS_PER_ROW
        # consecutive leaves per row — core/fast_types.py). Padding
        # triangles are degenerate (zeros -> det == 0 -> never hit).
        clusters = np.zeros((lcap, CLUSTER_SIZE * TRI_STRIDE), np.float32)
        packed = False
        if os.environ.get("RAYTPU_NATIVE", "1") != "0":
            try:
                from raytracer_tpu import native_bridge

                if native_bridge.available():
                    lib = native_bridge._load()
                    lids_scratch = np.empty(m, np.int32)
                    lib.rt_pack_clusters(
                        np.ascontiguousarray(verts).reshape(-1),
                        np.ascontiguousarray(mats).reshape(-1),
                        n, bvh.order, bvh.node_tri, bvh.node_ntri, m,
                        CLUSTER_SIZE, TRI_STRIDE, clusters.reshape(-1),
                        lids_scratch)
                    packed = True
            except Exception:
                _log.exception("native cluster packing failed; using NumPy")
        if not packed:
            ordered_v = verts[bvh.order]          # [n_refs, 3, 3]
            ordered_m = mats[bvh.order]           # [n_refs, 4]
            records = pack_tri_records(ordered_v.reshape(-1, 9), ordered_m)
            leaf_nodes = np.nonzero(leaf_mask)[0]
            for li, node in enumerate(leaf_nodes):
                start = int(bvh.node_tri[node])
                count = int(bvh.node_ntri[node])
                row = clusters[li].reshape(CLUSTER_SIZE, TRI_STRIDE)
                row[:count] = records[start:start + count]
        # lcap is a power of two >= 64, so always SUBS_PER_ROW-divisible.
        clusters = clusters.reshape(-1, CLUSTER_ROW)
        num_nodes = m

    # 4-wide collapse of the same tree (bvh/bvh4.py) — the Pallas
    # traversal's fast layout. Row capacity is bucketed like the binary
    # table so scene edits inside a bucket reuse the compiled executable.
    from raytracer_tpu.bvh.bvh4 import collapse4
    from raytracer_tpu.core.fast_types import WIDE_WIDTH

    # Per-cluster live-triangle counts (leaf-id order = leaf_mask order):
    # encoded in the wide leaf metas so the kernels skip padded halves.
    # RAYTPU_LEAF_COUNTS=0 encodes full counts instead (A/B: kernels then
    # always run both half-clusters).
    counts = (bvh.node_ntri[leaf_mask].astype(np.int32)
              if n else np.ones(1, np.int32))
    if os.environ.get("RAYTPU_LEAF_COUNTS", "1") == "0":
        counts = None
    nodes4, n4 = collapse4(nodes8, num_nodes, width=WIDE_WIDTH,
                           cluster_counts=counts)
    r4cap = _bucket(nodes4.shape[0])
    nodes4 = np.concatenate(
        [nodes4, np.zeros((r4cap - nodes4.shape[0], nodes4.shape[1]),
                          np.float32)]) if nodes4.shape[0] < r4cap else nodes4

    put = (lambda x: jax.device_put(jnp.asarray(x), device)) if device \
        else (lambda x: jnp.asarray(x))
    fs = FastScene(
        nodes8=put(nodes8),
        clusters=put(clusters),
        num_nodes=put(np.int32(num_nodes)),
        num_triangles=put(np.int32(n)),
        nodes4=put(nodes4),
        num_nodes4=put(np.int32(n4)),
    )
    _log.info("fast scene packed: %d tris, %d nodes in %.1f ms",
              n, num_nodes, (time.perf_counter() - t0) * 1e3)
    return fs
