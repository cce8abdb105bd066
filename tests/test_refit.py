"""Captured-topology device refit (scene/refit.py).

The round-4 live-edit path: one host topology capture per instance set,
then every edit is a single jitted AABB-refit/repack program. These tests
pin (a) capture-time parity with the host builder (bit-exact links,
float-tolerance bounds/records), (b) image parity of an EDITED refit
scene against a full host rebuild at the new pose with the same topology
method (same geometry + any valid BVH => same nearest hits), and (c) jit
stability across edits.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from raytracer_tpu.core.camera import Camera
from raytracer_tpu.core.types import RenderConfig
from raytracer_tpu.kernels.packet import render_linear_fast
from raytracer_tpu.scene.builder import build_fast_scene_from_arrays
from raytracer_tpu.scene.refit import capture_refit, _refit_program
from raytracer_tpu.utils import assets


def _meshes_params():
    tris = assets.make_terrain(n=24)  # ~1k tris
    meshes = [tris, tris[: tris.shape[0] // 2]]
    params = [((1.0, 1.0, 1.0), (0.0, 0.0, 0.0), (0.7, 0.6, 0.5), 0.0),
              ((2.0, 1.5, 1.0), (5.0, 1.0, -3.0), (0.5, 0.6, 0.7), 1.0)]
    return meshes, params


def _host_arrays(meshes, params):
    verts = np.concatenate([
        m * np.asarray(p[0], np.float32) + np.asarray(p[1], np.float32)
        for m, p in zip(meshes, params)]).astype(np.float32)
    mats = np.concatenate([
        np.tile(np.asarray(list(p[2]) + [p[3]], np.float32),
                (m.shape[0], 1))
        for m, p in zip(meshes, params)])
    return verts, mats


@pytest.mark.parametrize("method", ["ploc", "sah"])
def test_capture_parity_with_host_builder(method, monkeypatch):
    """At capture params the refit output IS the host builder's scene:
    link columns bit-exact, bounds/records to f32 tolerance."""
    meshes, params = _meshes_params()
    cap = capture_refit(meshes, params, method=method)
    fs = cap.refit(params)

    verts, mats = _host_arrays(meshes, params)
    monkeypatch.setenv("RAYTPU_BVH", method)
    host = build_fast_scene_from_arrays(verts, mats)

    a8 = np.asarray(fs.nodes8)
    b8 = np.asarray(host.nodes8)
    assert a8.shape == b8.shape
    assert (a8[:, 6:8].view(np.int32) == b8[:, 6:8].view(np.int32)).all()
    np.testing.assert_allclose(a8[:, :6], b8[:, :6], atol=1e-5)
    np.testing.assert_allclose(np.asarray(fs.clusters),
                               np.asarray(host.clusters), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fs.nodes4),
                               np.asarray(host.nodes4), atol=1e-5)
    assert int(fs.num_nodes) == int(host.num_nodes)
    assert int(fs.num_nodes4) == int(host.num_nodes4)
    assert int(fs.num_triangles) == int(host.num_triangles)


def test_edited_refit_renders_like_full_rebuild(monkeypatch):
    """Drag an instance, refit, render: same geometry under a (different
    but) valid BVH must produce the same image as a full host rebuild."""
    meshes, params = _meshes_params()
    cap = capture_refit(meshes, params, method="ploc")
    moved = list(params)
    moved[1] = ((2.0, 1.5, 1.0), (8.5, 2.0, -1.0), (0.5, 0.6, 0.7), 1.0)
    fs = cap.refit(moved)

    verts, mats = _host_arrays(meshes, moved)
    monkeypatch.setenv("RAYTPU_BVH", "ploc")
    host = build_fast_scene_from_arrays(verts, mats)

    cfg = RenderConfig(width=32, height=24, max_bounces=3)
    cam = Camera(origin=(0.0, 18.0, 55.0), look_at=(0.0, 0.0, 0.0),
                 vfov_deg=45.0, aspect_ratio=32 / 24)
    a, _ = render_linear_fast(fs, cam.uniforms(), cfg)
    b, _ = render_linear_fast(host, cam.uniforms(), cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_refit_is_edit_stable():
    """Edits reuse ONE compiled executable (cache delta 0) — the whole
    point of the refit path."""
    meshes, params = _meshes_params()
    cap = capture_refit(meshes, params, method="ploc")
    cap.refit(params)
    n0 = _refit_program._cache_size()
    moved = list(params)
    for dx in (1.0, 2.0, 3.0):
        moved[1] = ((2.0, 1.5, 1.0), (5.0 + dx, 1.0, -3.0),
                    (0.5, 0.6, 0.7), 1.0)
        fs = cap.refit(moved)
    assert _refit_program._cache_size() == n0
    assert int(fs.num_triangles) == sum(m.shape[0] for m in meshes)


def test_refit_containment_invariants():
    """After an edit every wide slot's box contains its subtree's leaf
    boxes (walk the static metas; boxes refit, topology fixed)."""
    meshes, params = _meshes_params()
    cap = capture_refit(meshes, params, method="ploc")
    moved = list(params)
    moved[0] = ((1.0, 1.0, 1.0), (-4.0, 3.0, 2.0), (0.7, 0.6, 0.5), 0.0)
    fs = cap.refit(moved)

    table = np.asarray(fs.nodes4).reshape(-1, 8, 16)
    n_wide = int(fs.num_nodes4)
    eps = 1e-4
    for row in range(n_wide):
        for s in range(8):
            meta = int(table[row, s, 6])
            if meta > 0:  # internal: child row's slot boxes fit in mine
                child = meta - 1
                for cs in range(8):
                    if table[child, cs, 6] == 0.0:
                        continue
                    assert (table[child, cs, 0:3]
                            >= table[row, s, 0:3] - eps).all()
                    assert (table[child, cs, 3:6]
                            <= table[row, s, 3:6] + eps).all()


def test_device_builder_refit_mode(monkeypatch, tmp_path):
    """DeviceSceneBuilder routes refit mode and serves edits from the
    captured topology (one capture, many refits)."""
    from raytracer_tpu.scene.device_builder import DeviceSceneBuilder
    from raytracer_tpu.scene.scene import ModelInstance

    monkeypatch.setenv("RAYTPU_DEVICE_BUILD", "refit")
    # A mesh big enough for >= 2 leaves so the capture path actually
    # runs (a 2-tri plane collapses to one leaf -> LBVH fallback).
    path = str(tmp_path / "terrain.obj")
    assets.write_obj(path, assets.make_terrain(n=12))
    builder = DeviceSceneBuilder()
    instances = [
        ModelInstance(model_path=path, display_name="a",
                      position=(0.0, -5.0, 0.0), scale=(30.0, 1.0, 30.0),
                      color=(0.5, 0.5, 0.5)),
        ModelInstance(model_path=path, display_name="b",
                      position=(0.0, 5.0, 0.0), scale=(10.0, 1.0, 10.0),
                      color=(0.8, 0.2, 0.2)),
    ]
    s1 = builder.build(instances)
    assert len(builder._refit_cache) == 1
    import dataclasses as dc

    moved = list(instances)
    moved[1] = dc.replace(moved[1], position=(3.0, 5.0, 1.0))
    s2 = builder.build(moved)
    assert len(builder._refit_cache) == 1
    cap = next(iter(builder._refit_cache.values()))
    assert cap.edits == 2
    assert int(s1.num_triangles) == int(s2.num_triangles)
    # the edit actually moved boxes
    a = np.asarray(s1.nodes8)[:, :6]
    b = np.asarray(s2.nodes8)[:, :6]
    assert np.abs(a - b).max() > 0.5


def test_device_builder_tiny_scene_falls_back(monkeypatch):
    """A < 2-leaf scene can't capture: refit mode logs at info and falls
    back to the LBVH path (no ERROR traceback, ADVICE r4)."""
    from raytracer_tpu.scene.device_builder import DeviceSceneBuilder
    from raytracer_tpu.scene.scene import ModelInstance
    from raytracer_tpu.utils.assets import asset_path

    monkeypatch.setenv("RAYTPU_DEVICE_BUILD", "refit")
    path = asset_path("ground_plane.obj")
    builder = DeviceSceneBuilder()
    s = builder.build([
        ModelInstance(model_path=path, display_name="a",
                      position=(0.0, -5.0, 0.0), scale=(30.0, 1.0, 30.0),
                      color=(0.5, 0.5, 0.5)),
    ])
    assert not builder._refit_cache
    assert int(s.num_triangles) == 2
