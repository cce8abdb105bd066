"""BVH build/flatten invariants (SURVEY.md §4 test plan items)."""

import numpy as np
import pytest

from raytracer_tpu.bvh.build import build_bvh, triangle_aabbs
from raytracer_tpu.utils import assets


def _random_tris(n, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-10, 10, (n, 1, 3))
    offsets = rng.uniform(-0.5, 0.5, (n, 3, 3))
    return (centers + offsets).astype(np.float32)


@pytest.mark.parametrize("n", [1, 2, 3, 7, 14, 100, 1001])
def test_node_count_invariant(n):
    bvh = build_bvh(_random_tris(n))
    # Real leaves (no reference-style duplication): exactly 2n-1 nodes.
    assert bvh.num_nodes == 2 * n - 1
    leaves = bvh.node_tri >= 0
    assert leaves.sum() == n
    # Every triangle appears exactly once, leaf order == `order` mapping.
    tri_starts = np.sort(bvh.node_tri[leaves])
    np.testing.assert_array_equal(tri_starts, np.arange(n))
    assert sorted(bvh.order.tolist()) == list(range(n))


def test_leaf_encoding_roundtrip():
    """Reference encoding: leaf data = -(tri+1), count = -1; internal
    data = left = own+1 (pre-order), count = right."""
    bvh = build_bvh(_random_tris(33))
    for i in range(bvh.num_nodes):
        if bvh.node_count[i] < 0:  # leaf
            assert bvh.node_count[i] == -1
            tri = -(int(bvh.node_data[i]) + 1)
            assert tri == bvh.node_tri[i]
        else:
            assert bvh.node_data[i] == i + 1  # pre-order adjacency
            assert bvh.node_count[i] > i + 1
            assert bvh.node_tri[i] == -1


def test_aabb_containment():
    tris = _random_tris(200, seed=3)
    bvh = build_bvh(tris)
    lo, hi = triangle_aabbs(tris)
    eps = 1e-5
    for i in range(bvh.num_nodes):
        if bvh.node_count[i] >= 0:  # internal: contains both children
            for c in (int(bvh.node_data[i]), int(bvh.node_count[i])):
                assert (bvh.node_min[i] <= bvh.node_min[c] + eps).all()
                assert (bvh.node_max[i] >= bvh.node_max[c] - eps).all()
        else:  # leaf: contains its triangle's padded AABB
            t = bvh.order[int(bvh.node_tri[i])]
            assert (bvh.node_min[i] <= lo[t] + eps).all()
            assert (bvh.node_max[i] >= hi[t] - eps).all()


def test_skip_links():
    """skip[i] = first pre-order node outside i's subtree."""
    bvh = build_bvh(_random_tris(77, seed=5))
    m = bvh.num_nodes

    def subtree_end(i):
        # End of subtree in pre-order = i + subtree size.
        if bvh.node_count[i] < 0:
            return i + 1
        return subtree_end(int(bvh.node_count[i]))

    import sys
    sys.setrecursionlimit(10000)
    for i in range(m):
        assert bvh.node_skip[i] == subtree_end(i)
    assert bvh.node_skip[0] == m


def test_skip_walk_visits_same_leaves_as_stack_walk():
    """Stackless traversal visits exactly the pre-order node sequence the
    reference's push-right-pop-left stack visits (assuming all AABBs hit —
    the structural equivalence; pruning is tested via render parity)."""
    bvh = build_bvh(_random_tris(50, seed=9))

    stack_order = []
    stack = [0]
    while stack:
        i = stack.pop()
        stack_order.append(i)
        if bvh.node_count[i] >= 0:
            stack.append(int(bvh.node_count[i]))
            stack.append(int(bvh.node_data[i]))

    skip_order = []
    i = 0
    m = bvh.num_nodes
    while i < m:
        skip_order.append(i)
        i = i + 1 if bvh.node_count[i] >= 0 else int(bvh.node_skip[i])

    assert skip_order == stack_order


def test_leaf_size_bucketing():
    tris = _random_tris(100, seed=11)
    bvh = build_bvh(tris, leaf_size=8)
    leaves = bvh.node_tri >= 0
    assert (bvh.node_ntri[leaves] <= 8).all()
    assert bvh.node_ntri[leaves].sum() == 100
    assert sorted(bvh.order.tolist()) == list(range(100))


def test_degenerate_axis_padding():
    """Axis-aligned flat plane gets an epsilon-padded AABB
    (reference Triangle.java:61-71)."""
    plane = assets.make_ground_plane()
    lo, hi = triangle_aabbs(plane)
    assert (hi[:, 1] - lo[:, 1] > 0).all()  # y extent padded


def _ploc_bvh(n=300, seed=7, leaf_size=8):
    from raytracer_tpu.bvh.ploc import build_bvh_ploc

    tris = _random_tris(n, seed=seed)
    return tris, build_bvh_ploc(tris, leaf_size=leaf_size)


def test_ploc_invariants():
    """PLOC build (bvh/ploc.py): order is a permutation, leaves cover all
    triangles exactly once with 1..leaf_size fill, skip links are exact
    pre-order escapes, internal AABBs contain their children."""
    tris, bvh = _ploc_bvh()
    n = tris.shape[0]
    assert sorted(bvh.order.tolist()) == list(range(n))
    leaf = bvh.node_ntri > 0
    counts = bvh.node_ntri[leaf]
    assert counts.min() >= 1 and counts.max() <= 8
    assert counts.sum() == n
    starts = np.sort(bvh.node_tri[leaf])
    assert starts[0] == 0
    assert (np.diff(starts) == counts[np.argsort(bvh.node_tri[leaf])][:-1]
            ).all()  # leaves tile [0, n) contiguously

    # Skip links: skip[i] = end of i's pre-order subtree.
    import sys
    sys.setrecursionlimit(10000)

    def subtree_end(i):
        if bvh.node_count[i] < 0:
            return i + 1
        return subtree_end(int(bvh.node_count[i]))

    m = bvh.num_nodes
    for i in range(m):
        assert bvh.node_skip[i] == subtree_end(i)

    # Containment.
    lo, hi = triangle_aabbs(tris)
    eps = 1e-5
    for i in range(m):
        if bvh.node_count[i] >= 0:
            for c in (int(bvh.node_data[i]), int(bvh.node_count[i])):
                assert (bvh.node_min[i] <= bvh.node_min[c] + eps).all()
                assert (bvh.node_max[i] >= bvh.node_max[c] - eps).all()
        else:
            s = int(bvh.node_tri[i])
            for t in bvh.order[s:s + int(bvh.node_ntri[i])]:
                assert (bvh.node_min[i] <= lo[t] + eps).all()
                assert (bvh.node_max[i] >= hi[t] - eps).all()


def test_ploc_renders_same_image(monkeypatch):
    """RAYTPU_BVH=ploc scene renders the same image as the default
    builder (different tree, same closest hits)."""
    import jax.numpy as jnp

    from raytracer_tpu.core.camera import Camera
    from raytracer_tpu.core.types import RenderConfig
    from raytracer_tpu.kernels.packet import render_linear_fast
    from raytracer_tpu.scene.builder import build_fast_scene_from_arrays

    tris = assets.make_terrain(n=12)
    mats = np.zeros((tris.shape[0], 4), np.float32)
    mats[:, 0:3] = 0.6
    ref_scene = build_fast_scene_from_arrays(tris, mats)
    monkeypatch.setenv("RAYTPU_BVH", "ploc")
    ploc_scene = build_fast_scene_from_arrays(tris, mats)

    cfg = RenderConfig(width=32, height=24, max_bounces=3,
                       rng_mode="reference")
    cam = Camera(origin=(0.0, 30.0, 80.0), look_at=(0.0, 0.0, 0.0),
                 vfov_deg=40.0, aspect_ratio=32 / 24)
    a, _ = render_linear_fast(ref_scene, cam.uniforms(), cfg)
    b, _ = render_linear_fast(ploc_scene, cam.uniforms(), cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    assert np.asarray(a).max() > 0
