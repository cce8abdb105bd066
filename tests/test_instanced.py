"""Two-level instanced BVH (scene/instanced.py): structure + parity.

The instanced path must be indistinguishable from a host build of the
same transformed scene except in tree topology (per-instance SAH trees
under a TLAS vs one joint SAH tree): same closest hits, so images agree
to float tolerance; both the binary skip-link table and the wide table
must be structurally valid DFS layouts covering every cluster once.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from raytracer_tpu.core.camera import Camera
from raytracer_tpu.core.fast_types import LEAF_CID_BITS, LEAF_CID_MASK
from raytracer_tpu.core.types import RenderConfig
from raytracer_tpu.kernels.packet import render_linear_fast
from raytracer_tpu.scene.builder import build_fast_scene, gather_triangles
from raytracer_tpu.scene.device_builder import DeviceSceneBuilder
from raytracer_tpu.scene.instanced import (combine_instanced,
                                           prep_mesh_blas)
from raytracer_tpu.scene.scene import ModelInstance
from raytracer_tpu.utils.assets import asset_path


def _instances(k=2):
    """k instances across 2 distinct meshes, varied transforms/materials."""
    out = [
        ModelInstance(model_path=asset_path("cube.obj"), display_name="c0",
                      position=(0.0, -6.0, 0.0), scale=(4.0, 4.0, 4.0),
                      color=(0.8, 0.3, 0.3), material_type=0.0),
        ModelInstance(model_path=asset_path("ground_plane.obj"),
                      display_name="g",
                      position=(0.0, -10.0, 0.0), scale=(150.0, 1.0, 150.0),
                      color=(0.5, 0.5, 0.5), material_type=0.0),
    ]
    rng = np.random.default_rng(7)
    while len(out) < k:
        i = len(out)
        out.append(ModelInstance(
            model_path=asset_path("cube.obj"), display_name=f"c{i}",
            position=tuple(rng.uniform(-20, 20, 3).astype(float)),
            scale=(float(rng.uniform(0.5, 3.0)),) * 3,
            color=(0.3, 0.6, 0.8), material_type=1.0))
    return out[:k]


def _build_instanced(instances):
    builder = DeviceSceneBuilder()
    blases = [builder._blas(i.model_path) for i in instances]
    return combine_instanced(blases, [builder._params(i)
                                      for i in instances])


def _walk_binary(scene):
    """Skip-walk the binary table: returns (visit order, leaf cids)."""
    m = int(scene.num_nodes)
    nodes = np.asarray(scene.nodes8)
    skip = nodes[:, 6].view(np.int32)
    col7 = nodes[:, 7].view(np.int32)
    visited, leaves = [], []
    i, guard = 0, 0
    while i < m and guard <= 10 * m:
        visited.append(i)
        if col7[i] >= 0:
            leaves.append(int(col7[i]))
            i = skip[i]
        else:
            i = -col7[i] - 1
        guard += 1
    return visited, leaves, nodes, skip, col7, m


@pytest.mark.parametrize("k", [1, 2, 3, 10])
def test_binary_table_structure(k):
    scene = _build_instanced(_instances(k))
    visited, leaves, nodes, skip, col7, m = _walk_binary(scene)
    # DFS visits every row exactly once; every cluster appears once.
    assert sorted(visited) == list(range(m))
    assert sorted(leaves) == sorted(set(leaves))
    # Parent boxes contain left children (spot containment invariant).
    for i in range(m):
        if col7[i] < 0:
            lc = -col7[i] - 1
            assert lc == i + 1  # pre-order invariant the kernels exploit
            assert (nodes[i, 0:3] <= nodes[lc, 0:3] + 1e-4).all()
            assert (nodes[i, 3:6] >= nodes[lc, 3:6] - 1e-4).all()


@pytest.mark.parametrize("k", [1, 2, 10])
def test_wide_table_structure(k):
    scene = _build_instanced(_instances(k))
    table = np.asarray(scene.nodes4)
    n_wide = int(scene.num_nodes4)
    seen, visited = [], set()
    stack = [0]
    while stack:
        r = stack.pop()
        assert 0 <= r < n_wide and r not in visited
        visited.add(r)
        node = table[r].reshape(8, 16)
        for s in range(8):
            meta = int(node[s, 6])
            if meta == 0:
                continue
            if meta > 0:
                stack.append(meta - 1)
            else:
                seen.append((-meta - 1) & LEAF_CID_MASK)
    # Every cluster exactly once, every emitted row reachable.
    assert sorted(seen) == sorted(set(seen))
    assert len(visited) == n_wide
    _, leaves, *_ = _walk_binary(scene)
    assert sorted(seen) == sorted(leaves)


@pytest.mark.parametrize("bounces,path", [(1, "binary"), (4, "wide")])
def test_instanced_renders_like_host(monkeypatch, bounces, path):
    """Image parity with a host SAH build of the same transformed soup —
    through the binary megakernel AND the wide-table wavefront path."""
    instances = _instances(3)
    host = build_fast_scene(instances)
    inst = _build_instanced(instances)
    assert int(inst.num_triangles) == int(host.num_triangles)

    if path == "wide":
        monkeypatch.setenv("RAYTPU_B0", "pallas")
        monkeypatch.setenv("RAYTPU_BOUNCE", "wave")
    else:
        monkeypatch.setenv("RAYTPU_B0", "mega")
        monkeypatch.setenv("RAYTPU_BOUNCE", "mega")
    cfg = RenderConfig(width=64, height=32, max_bounces=bounces)
    cam = Camera(origin=(-10.0, 6.0, 30.0), look_at=(0.0, -6.0, 0.0),
                 vfov_deg=40.0, aspect_ratio=2.0)
    a, _ = render_linear_fast(host, cam.uniforms(), cfg)
    b, _ = render_linear_fast(inst, cam.uniforms(), cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_negative_scale_bounds():
    """A mirrored instance still produces valid (lo <= hi) boxes and
    renders (the transform helper min/maxes the scaled corners)."""
    inst = [ModelInstance(model_path=asset_path("cube.obj"),
                          display_name="m", position=(0.0, -6.0, 0.0),
                          scale=(-4.0, 4.0, 4.0),
                          color=(0.8, 0.3, 0.3), material_type=0.0)]
    scene = _build_instanced(inst)
    nodes = np.asarray(scene.nodes8)[: int(scene.num_nodes)]
    assert (nodes[:, 0:3] <= nodes[:, 3:6] + 1e-6).all()
    host = build_fast_scene(inst)
    cfg = RenderConfig(width=32, height=24, max_bounces=1)
    cam = Camera(origin=(-10.0, 6.0, 30.0), look_at=(0.0, -6.0, 0.0),
                 vfov_deg=40.0, aspect_ratio=32 / 24)
    a, _ = render_linear_fast(host, cam.uniforms(), cfg)
    b, _ = render_linear_fast(scene, cam.uniforms(), cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_param_edit_reuses_executable():
    """Moving an instance must not retrace the combine program (the
    whole point of the TLAS refit), and the same pose must reproduce the
    same tables bit-for-bit."""
    from raytracer_tpu.scene.instanced import _combine

    builder = DeviceSceneBuilder()
    base = _instances(2)
    moved = [base[0],
             ModelInstance(model_path=base[1].model_path,
                           display_name="g",
                           position=(5.0, -10.0, 2.0),
                           scale=base[1].scale, color=base[1].color,
                           material_type=base[1].material_type)]
    before = _combine._cache_size()
    s1 = builder.build(base)
    mid = _combine._cache_size()
    s2 = builder.build(moved)
    s3 = builder.build(base)
    assert _combine._cache_size() == mid  # edits reuse the executable
    # At most one new trace for this instance set (zero if an earlier
    # test already compiled the same shapes — the cache is module-wide).
    assert mid - before <= 1
    np.testing.assert_array_equal(np.asarray(s1.nodes4),
                                  np.asarray(s3.nodes4))
    assert (np.asarray(s1.nodes8) != np.asarray(s2.nodes8)).any()


def test_builder_mode_fallback(monkeypatch):
    """RAYTPU_DEVICE_BUILD=lbvh keeps the Morton path; both modes render
    the same image."""
    instances = _instances(2)
    builder = DeviceSceneBuilder()
    monkeypatch.setenv("RAYTPU_DEVICE_BUILD", "lbvh")
    lb = builder.build(instances)
    monkeypatch.setenv("RAYTPU_DEVICE_BUILD", "instanced")
    ins = builder.build(instances)
    cfg = RenderConfig(width=32, height=24, max_bounces=2)
    cam = Camera(origin=(-10.0, 6.0, 30.0), look_at=(0.0, -6.0, 0.0),
                 vfov_deg=40.0, aspect_ratio=32 / 24)
    a, _ = render_linear_fast(lb, cam.uniforms(), cfg)
    b, _ = render_linear_fast(ins, cam.uniforms(), cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)
