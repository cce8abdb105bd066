"""Kernel parity: vectorized TPU tracer vs scalar CPU oracle.

The oracle (testing/cpu_reference.py) transliterates the GLSL megakernel
per pixel, including stack-based traversal with the reference node encoding
and exact RNG stream consumption. The wavefront tracer must reproduce it
per-channel within 1e-5 (the BASELINE acceptance metric budget is 1e-3
against the real GPU; tracer-vs-oracle should be nearly exact since both
are float32 with identical operation order).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from raytracer_tpu.core.camera import Camera
from raytracer_tpu.core.types import RenderConfig
from raytracer_tpu.kernels.tracer import render_linear
from raytracer_tpu.scene.builder import build_gpu_scene_from_arrays
from raytracer_tpu.testing import cpu_reference as oracle
from raytracer_tpu.utils import assets

W, H = 16, 12


def _scene(mat_plane=0.0, mat_cube=0.0, cube_color=(1.0, 0.2, 0.2),
           plane_color=(0.5, 0.5, 0.5)):
    cube = assets.make_cube() * 4.0 + np.array([0, -6, 0], np.float32)
    plane = (assets.make_ground_plane() * np.array([150, 1, 150], np.float32)
             + np.array([0, -10, 0], np.float32))
    verts = np.concatenate([plane, cube])
    mats = np.zeros((verts.shape[0], 4), np.float32)
    mats[:2, 0:3] = plane_color
    mats[:2, 3] = mat_plane
    mats[2:, 0:3] = cube_color
    mats[2:, 3] = mat_cube
    return build_gpu_scene_from_arrays(verts, mats)


def _cam_dict(cam: Camera) -> dict:
    return {
        "origin": cam.origin.astype(np.float32),
        "lower_left_corner": cam.lower_left_corner.astype(np.float32),
        "horizontal": cam.horizontal.astype(np.float32),
        "vertical": cam.vertical.astype(np.float32),
    }


def _compare(scene, sky=True, emissive_emits=True, max_bounces=10,
             atol=2e-5):
    # Close-in pose so the 4-unit cube covers a solid fraction of the tiny
    # frame (the reference's default pose leaves it sub-pixel at 16x12).
    cam = Camera(origin=(-10.0, 6.0, 30.0), look_at=(0.0, -6.0, 0.0),
                 vfov_deg=40.0, aspect_ratio=W / H)
    cfg = RenderConfig(width=W, height=H, max_bounces=max_bounces,
                       rng_mode="reference", emissive_emits=emissive_emits)
    uni = cam.uniforms(sky_enabled=sky)
    got, stats = render_linear(scene, uni, cfg)
    got = np.asarray(got)

    want = oracle.render_image(
        oracle.scene_to_numpy(scene), _cam_dict(cam), W, H,
        max_bounces=max_bounces, sky_enabled=sky,
        emissive_emits=emissive_emits)

    np.testing.assert_allclose(got, want, atol=atol)
    assert float(stats["rays_traced"]) >= W * H  # at least primaries
    return got


def test_parity_lambertian_sky():
    img = _compare(_scene(0.0, 0.0))
    assert img.mean() > 0.05  # scene is actually lit


def test_parity_metal():
    _compare(_scene(0.0, 1.0))


def test_parity_fuzzy_metal():
    _compare(_scene(0.0, 2.0))


def test_parity_sky_disabled():
    img = _compare(_scene(0.0, 0.0), sky=False)
    # No light source + no sky -> black frame.
    assert img.max() == 0.0


def test_parity_emissive_emits():
    img = _compare(_scene(0.0, 3.0, cube_color=(4.0, 4.0, 4.0)), sky=False)
    assert img.max() > 0.0  # the emissive cube lights the scene


def test_parity_emissive_reference_mode_absorbs():
    """Bit-parity with the shipped kernel: type 3.0 scatters false -> black
    (compute_dynamic_ray.comp:153)."""
    _compare(_scene(0.0, 3.0), sky=True, emissive_emits=False)


def test_parity_single_bounce():
    _compare(_scene(0.0, 0.0), max_bounces=1)


def test_reference_rng_is_frame_invariant():
    """rng_mode='reference' reproduces the reference's frozen-noise bug:
    every frame draws the identical sample."""
    scene = _scene()
    cam = Camera(origin=(-25.0, 30.0, 140.0), look_at=(0, 0, 0),
                 vfov_deg=20.0, aspect_ratio=W / H)
    cfg = RenderConfig(width=W, height=H, rng_mode="reference")
    a, _ = render_linear(scene, cam.uniforms(), cfg)
    cam.increment_frame_count()
    b, _ = render_linear(scene, cam.uniforms(), cfg)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_progressive_rng_varies_by_frame():
    scene = _scene()
    cam = Camera(origin=(-25.0, 30.0, 140.0), look_at=(0, 0, 0),
                 vfov_deg=20.0, aspect_ratio=W / H)
    cfg = RenderConfig(width=W, height=H, rng_mode="progressive")
    a, _ = render_linear(scene, cam.uniforms(), cfg)
    cam.increment_frame_count()
    b, _ = render_linear(scene, cam.uniforms(), cfg)
    assert not np.array_equal(np.asarray(a), np.asarray(b))
