"""C12 tier parity: the fixed-light shading mode vs the scalar oracle.

The reference's first kernel (shaders/compute.comp:196-204) shades with a
fixed light direction normalize(1,1,1), intensity max(0,n·l)*0.8+0.2 on the
raw winding normal, and a black background — with no AA jitter and no RNG.
Both tracer back-ends must reproduce the oracle transliteration exactly.
"""

import numpy as np

from raytracer_tpu.core.camera import Camera
from raytracer_tpu.core.types import RenderConfig
from raytracer_tpu.kernels.packet import render_linear_fast
from raytracer_tpu.kernels.tracer import render_linear
from raytracer_tpu.scene.builder import (build_fast_scene_from_arrays,
                                         build_gpu_scene_from_arrays)
from raytracer_tpu.testing import cpu_reference as oracle
from raytracer_tpu.utils import assets

W, H = 16, 16


def _arrays():
    cube = assets.make_cube() * 4.0 + np.array([0, -6, 0], np.float32)
    plane = (assets.make_ground_plane() * np.array([150, 1, 150], np.float32)
             + np.array([0, -10, 0], np.float32))
    verts = np.concatenate([plane, cube]).astype(np.float32)
    mats = np.zeros((verts.shape[0], 4), np.float32)
    mats[:2, 0:3] = (0.5, 0.5, 0.5)
    mats[2:, 0:3] = (1.0, 0.2, 0.2)
    return verts, mats


def _cam():
    return Camera(origin=(-10.0, 6.0, 30.0), look_at=(0.0, -6.0, 0.0),
                  vfov_deg=40.0, aspect_ratio=W / H)


def _oracle_image(verts, mats, cam):
    scene = build_gpu_scene_from_arrays(verts, mats)
    cam_dict = {
        "origin": cam.origin.astype(np.float32),
        "lower_left_corner": cam.lower_left_corner.astype(np.float32),
        "horizontal": cam.horizontal.astype(np.float32),
        "vertical": cam.vertical.astype(np.float32),
    }
    return oracle.render_image_fixed_light(
        oracle.scene_to_numpy(scene), cam_dict, W, H)


def test_fixed_light_wavefront_parity():
    verts, mats = _arrays()
    cam = _cam()
    scene = build_gpu_scene_from_arrays(verts, mats)
    cfg = RenderConfig(width=W, height=H, kernel="wavefront",
                       shading="fixed_light", rng_mode="reference")
    got, stats = render_linear(scene, cam.uniforms(), cfg)
    want = _oracle_image(verts, mats, cam)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)
    assert float(stats["rays_traced"]) == W * H  # exactly one ray per pixel
    # The mode actually lights the scene: ambient floor is 0.2 * albedo.
    assert np.asarray(got).max() > 0.15


def test_fixed_light_packet_parity():
    verts, mats = _arrays()
    cam = _cam()
    scene = build_fast_scene_from_arrays(verts, mats)
    cfg = RenderConfig(width=W, height=H, kernel="packet",
                       shading="fixed_light", rng_mode="reference")
    got, _ = render_linear_fast(scene, cam.uniforms(), cfg)
    want = _oracle_image(verts, mats, cam)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_fixed_light_pallas_parity(monkeypatch):
    """The C12 tier through the Pallas traversal (incl. padded raster
    fallback) must match the per-ray XLA path against the oracle."""
    verts, mats = _arrays()
    cam = _cam()
    scene = build_fast_scene_from_arrays(verts, mats)
    cfg = RenderConfig(width=W, height=H, kernel="packet",
                       shading="fixed_light", rng_mode="reference")
    monkeypatch.setenv("RAYTPU_B0", "pallas")
    got, stats = render_linear_fast(scene, cam.uniforms(), cfg)
    want = _oracle_image(verts, mats, cam)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)
    assert float(stats["rays_traced"]) == W * H


def test_fixed_light_background_is_black_even_with_sky_flag():
    verts, mats = _arrays()
    cam = Camera(origin=(0.0, 50.0, 200.0), look_at=(0.0, 200.0, 150.0),
                 vfov_deg=30.0, aspect_ratio=W / H)  # aimed at empty sky
    scene = build_gpu_scene_from_arrays(verts, mats)
    cfg = RenderConfig(width=W, height=H, kernel="wavefront",
                       shading="fixed_light")
    got, _ = render_linear(scene, cam.uniforms(sky_enabled=True), cfg)
    assert float(np.abs(np.asarray(got)).max()) == 0.0
