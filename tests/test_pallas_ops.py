"""Pallas post-processing kernel vs the plain-XLA tonemap path."""

import numpy as np

import jax.numpy as jnp

from raytracer_tpu.engine.renderer import Renderer, tonemap
from raytracer_tpu.kernels.pallas_ops import tonemap_accumulate


def test_tonemap_accumulate_matches_xla():
    rng = np.random.default_rng(1)
    accum = jnp.asarray(rng.random((16, 32, 3)), jnp.float32)
    sample = jnp.asarray(rng.random((16, 32, 3)) * 3, jnp.float32)
    for fc in (0.0, 1.0, 7.0):
        for ex in (-2.0, 0.0, 1.5):
            na, img = tonemap_accumulate(accum, sample, fc, ex,
                                         interpret=True)
            want = (accum * fc + sample) / (fc + 1.0)
            np.testing.assert_allclose(np.asarray(na), np.asarray(want),
                                       atol=1e-6)
            np.testing.assert_array_equal(
                np.asarray(img),
                np.asarray(tonemap(want, jnp.float32(ex))))


def test_renderer_pallas_tonemap_config(tiny_scene):
    """Renderer with pallas_tonemap=True produces identical frames."""
    from raytracer_tpu.core.camera import Camera
    from raytracer_tpu.core.types import RenderConfig

    cam = Camera(origin=(-10.0, 6.0, 30.0), look_at=(0.0, -6.0, 0.0),
                 vfov_deg=40.0, aspect_ratio=1.0)
    base = dict(width=16, height=16, kernel="wavefront", max_bounces=2)
    r1 = Renderer(RenderConfig(**base))
    r2 = Renderer(RenderConfig(**base, pallas_tonemap=True))
    _, img1, _ = r1.render(tiny_scene, cam.uniforms(exposure=0.5))
    _, img2, _ = r2.render(tiny_scene, cam.uniforms(exposure=0.5))
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))
