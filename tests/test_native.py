"""Native (C++) runtime parity with the Python/NumPy reference paths."""

import numpy as np
import pytest

from raytracer_tpu import native_bridge
from raytracer_tpu.bvh.build import build_bvh_numpy
from raytracer_tpu.scene.objloader import load_obj_python
from raytracer_tpu.utils import assets

pytestmark = pytest.mark.skipif(not native_bridge.available(),
                                reason="native lib not built")


def test_obj_parity(tmp_path):
    tris = assets.make_icosphere(2, 3.0)
    p = str(tmp_path / "s.obj")
    assets.write_obj(p, tris)
    a = native_bridge.load_obj(p)
    b = load_obj_python(p)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_obj_face_forms(tmp_path):
    p = str(tmp_path / "forms.obj")
    with open(p, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
                "f 1/1/1 2/1/1 3/1/1\nf 1//1 3//1 4//1\nf -4 -3 -2 -1\n")
    a = native_bridge.load_obj(p)
    b = load_obj_python(p)
    np.testing.assert_allclose(a, b, atol=1e-6)
    assert a.shape[0] == 4


def test_obj_missing_file():
    with pytest.raises(FileNotFoundError):
        native_bridge.load_obj("/nonexistent/x.obj")


@pytest.mark.parametrize("n,leaf", [(1, 1), (2, 1), (100, 1), (100, 8),
                                    (1000, 8)])
def test_bvh_structural_parity(n, leaf):
    rng = np.random.default_rng(3)
    tris = (rng.uniform(-10, 10, (n, 1, 3))
            + rng.uniform(-0.5, 0.5, (n, 3, 3))).astype(np.float32)
    a = native_bridge.build_bvh(tris, leaf)
    b = build_bvh_numpy(tris, leaf)
    assert a.num_nodes == b.num_nodes
    # Same AABBs and skip links node-for-node imply identical topology.
    np.testing.assert_allclose(a.node_min, b.node_min, atol=1e-6)
    np.testing.assert_allclose(a.node_max, b.node_max, atol=1e-6)
    np.testing.assert_array_equal(a.node_skip, b.node_skip)
    np.testing.assert_array_equal(a.node_ntri, b.node_ntri)
    assert sorted(a.order.tolist()) == list(range(n))


def test_sbvh_structure_and_render_parity():
    """SBVH (spatial splits, rt_build_bvh_sbvh): duplicated references
    must keep every triangle covered, the pre-order walk valid, and the
    rendered image identical to the plain-SAH tree (strict closest-t is
    order- and duplication-invariant)."""
    import os

    import numpy as np

    from raytracer_tpu.core.camera import Camera
    from raytracer_tpu.core.types import RenderConfig
    from raytracer_tpu.kernels.packet import render_linear_fast
    from raytracer_tpu.scene.builder import build_fast_scene_from_arrays

    rng = np.random.default_rng(7)
    # Long thin random triangles: plenty of straddlers so spatial splits
    # actually fire.
    base = rng.uniform(-10, 10, (600, 1, 3)).astype(np.float32)
    span = rng.normal(size=(600, 3, 3)).astype(np.float32)
    span[:, :, 0] *= 8.0  # stretch along x
    tris = (base + span * 0.5).astype(np.float32)
    b = native_bridge.build_bvh(tris, 8, method="sbvh")
    n = tris.shape[0]
    assert len(b.order) >= n
    covered = np.zeros(n, bool)
    covered[b.order] = True
    assert covered.all()
    assert int(b.node_ntri[b.node_tri >= 0].sum()) == len(b.order)
    # Pre-order skip-walk visits every node once.
    m, i, cnt = b.num_nodes, 0, 0
    while i < m and cnt <= 2 * m:
        i = i + 1 if b.node_tri[i] < 0 else b.node_skip[i]
        cnt += 1
    assert cnt == m

    mats = np.zeros((n, 4), np.float32)
    mats[:, 0:3] = (0.7, 0.6, 0.5)
    os.environ["RAYTPU_BVH"] = "sah"
    try:
        s1 = build_fast_scene_from_arrays(tris, mats)
        os.environ["RAYTPU_BVH"] = "sbvh"
        s2 = build_fast_scene_from_arrays(tris, mats)
    finally:
        os.environ.pop("RAYTPU_BVH", None)
    cfg = RenderConfig(width=32, height=24, max_bounces=2)
    cam = Camera(origin=(0, 5, 40), look_at=(0, 0, 0), vfov_deg=45,
                 aspect_ratio=32 / 24)
    a, _ = render_linear_fast(s1, cam.uniforms(), cfg)
    bimg, _ = render_linear_fast(s2, cam.uniforms(), cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(bimg), atol=2e-5)


def test_bvh_renders_identically():
    """A scene built through the native pipeline must render the same image
    as the NumPy pipeline."""
    import os

    from raytracer_tpu.core.camera import Camera
    from raytracer_tpu.core.types import RenderConfig
    from raytracer_tpu.kernels.packet import render_linear_fast
    from raytracer_tpu.scene.builder import build_fast_scene_from_arrays

    tris = assets.make_icosphere(1, 4.0)
    mats = np.zeros((tris.shape[0], 4), np.float32)
    mats[:, 0:3] = (0.8, 0.3, 0.2)

    scene_native = build_fast_scene_from_arrays(tris, mats)
    os.environ["RAYTPU_NATIVE"] = "0"
    try:
        scene_py = build_fast_scene_from_arrays(tris, mats)
    finally:
        os.environ.pop("RAYTPU_NATIVE")

    cfg = RenderConfig(width=32, height=24)
    cam = Camera(origin=(0, 2, 18), look_at=(0, 0, 0), vfov_deg=40,
                 aspect_ratio=32 / 24)
    a, _ = render_linear_fast(scene_native, cam.uniforms(), cfg)
    b, _ = render_linear_fast(scene_py, cam.uniforms(), cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_native_ploc_matches_numpy():
    """rt_build_bvh_ploc replicates bvh/ploc.py exactly (same Morton
    quantization, candidate scan order, strict-< tie-breaks) — the trees
    must be IDENTICAL, not merely equivalent."""
    from raytracer_tpu import native_bridge
    from raytracer_tpu.bvh.ploc import build_bvh_ploc

    if not native_bridge.available():
        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(11)
    scenes = [rng.normal(size=(300, 3, 3)).astype(np.float32) * 5,
              assets.make_terrain(n=20).astype(np.float32)]
    for tris in scenes:
        a = build_bvh_ploc(tris, leaf_size=8)
        b = native_bridge.build_bvh(tris, leaf_size=8, method="ploc")
        assert a.num_nodes == b.num_nodes
        np.testing.assert_array_equal(a.node_skip, b.node_skip)
        np.testing.assert_array_equal(a.node_tri, b.node_tri)
        np.testing.assert_array_equal(a.node_ntri, b.node_ntri)
        np.testing.assert_array_equal(a.order, b.order)
        np.testing.assert_array_equal(a.node_min, b.node_min)
        np.testing.assert_array_equal(a.node_max, b.node_max)
