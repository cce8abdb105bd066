"""Camera math, obj loading, scene graph, PNG io."""

import math
import os

import numpy as np
import pytest

from raytracer_tpu.core.camera import Camera, default_camera
from raytracer_tpu.scene.objloader import load_obj
from raytracer_tpu.scene.scene import ModelInstance, Scene
from raytracer_tpu.utils import assets
from raytracer_tpu.utils.png import read_png, write_png


def test_camera_viewport_math():
    """Verify against the reference formulas (scene/Camera.java:44-68) at
    the default pose (VulkanApp.java:132-138)."""
    cam = default_camera(1280, 720)
    theta = math.radians(20.0)
    h = math.tan(theta / 2.0)
    vh = 2.0 * h
    vw = (1280.0 / 720.0) * vh

    origin = np.array([-25.0, 30.0, 140.0])
    w = origin / np.linalg.norm(origin)  # lookAt = 0
    u = np.cross([0, 1, 0], w)
    u /= np.linalg.norm(u)
    v = np.cross(w, u)

    np.testing.assert_allclose(cam.horizontal, u * vw, rtol=1e-12)
    np.testing.assert_allclose(cam.vertical, v * vh, rtol=1e-12)
    np.testing.assert_allclose(
        cam.lower_left_corner, origin - u * vw / 2 - v * vh / 2 - w,
        rtol=1e-12)


def test_camera_moves_and_accumulation():
    cam = default_camera()
    cam.increment_frame_count()
    cam.increment_frame_count()
    assert cam.frame_count == 2
    before = cam.origin.copy()
    cam.move("W")  # -6.5 z, resets accumulation (VulkanApp.java:756)
    np.testing.assert_allclose(cam.origin, before + [0, 0, -6.5])
    assert cam.frame_count == 0
    cam.move("Q")
    np.testing.assert_allclose(cam.origin, before + [0, 3.5, -6.5])


def test_camera_uniforms_shapes():
    u = default_camera().uniforms(sky_enabled=False, exposure=1.5)
    assert u.origin.shape == (3,)
    assert int(u.sky_enabled) == 0
    assert float(u.exposure) == 1.5


def test_obj_loader_procedural_roundtrip(tmp_path):
    tris = assets.make_cube()
    p = str(tmp_path / "cube.obj")
    assets.write_obj(p, tris)
    loaded = load_obj(p)
    assert loaded.shape == (12, 3, 3)
    np.testing.assert_allclose(loaded, tris, atol=1e-5)


def test_obj_loader_face_forms(tmp_path):
    p = str(tmp_path / "forms.obj")
    with open(p, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
                "vn 0 0 1\nvt 0 0\n"
                "f 1/1/1 2/1/1 3/1/1\n"   # v/vt/vn
                "f 1//1 3//1 4//1\n"      # v//vn
                "f -4 -3 -2 -1\n")        # negative indices, quad (fan x2)
    tris = load_obj(p)
    assert tris.shape[0] == 4


@pytest.mark.skipif(not os.path.exists("/root/reference/objects/cube.obj"),
                    reason="reference assets not mounted")
def test_obj_loader_reference_assets():
    assert load_obj(assets.asset_path("cube.obj")).shape[0] == 12
    assert load_obj(assets.asset_path("ground_plane.obj")).shape[0] == 2
    # Moon.obj holds 384 quad faces -> 768 triangles after fan
    # triangulation (same as aiProcess_Triangulate).
    assert load_obj(assets.asset_path("Moon.obj")).shape[0] == 768
    # FinalBaseMesh: 24,459 faces (SURVEY.md C17), mostly quads ->
    # 48,918 triangles post-triangulation: the ~49k-tri benchmark mesh.
    assert load_obj(assets.asset_path("FinalBaseMesh.obj")).shape[0] == 48918


def test_scene_snapshot_isolation():
    s = Scene()
    inst = ModelInstance("a.obj", position=(1, 2, 3))
    s.add_instance(inst)
    snap = s.create_snapshot()
    s.remove_at(0)
    assert len(s) == 0 and len(snap) == 1
    assert snap[0].position == (1.0, 2.0, 3.0)


def test_scene_json_roundtrip(tmp_path):
    s = Scene([ModelInstance("m.obj", display_name="M", position=(1, 0, 0),
                             scale=(2, 2, 2), color=(1, 0, 0),
                             material_type=2.0)])
    p = str(tmp_path / "scene.json")
    s.save_json(p)
    s2 = Scene.load_json(p)
    assert s2.get_instances()[0] == s.get_instances()[0]


def test_instance_transform_order():
    """Scale-then-translate (SceneBuilder.java:172-174)."""
    inst = ModelInstance("x.obj", position=(10, 0, 0), scale=(2, 2, 2))
    v = np.array([[[1.0, 1.0, 1.0]] * 3], np.float32)
    out = inst.transform(v)
    np.testing.assert_allclose(out[0, 0], [12.0, 2.0, 2.0])


def test_png_roundtrip(tmp_path):
    img = (np.arange(24 * 32 * 3, dtype=np.uint32) % 256).astype(
        np.uint8).reshape(24, 32, 3)
    p = str(tmp_path / "t.png")
    write_png(p, img)
    np.testing.assert_array_equal(read_png(p), img)


def test_terrain_triangle_count():
    tris = assets.make_terrain(n=158)
    assert tris.shape[0] == 2 * 157 * 157  # 49,298 — benchmark-class
