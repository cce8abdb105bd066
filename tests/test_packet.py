"""Packet (tile) tracer vs per-ray wavefront tracer: identical images.

The packet kernel changes traversal *order* only; strict closest-t
comparisons make the result order-independent, so the two kernels must
agree to float tolerance on every pixel — transitively giving the packet
path the same GLSL-oracle parity the wavefront path is tested for.
"""

import numpy as np

from raytracer_tpu.core.camera import Camera
from raytracer_tpu.core.types import RenderConfig
from raytracer_tpu.kernels.packet import render_linear_fast
from raytracer_tpu.kernels.tracer import render_linear
from raytracer_tpu.scene.builder import (build_fast_scene_from_arrays,
                                         build_gpu_scene_from_arrays)
from raytracer_tpu.utils import assets

W, H = 32, 24


def _scenes(mat_cube=0.0, mat_sphere=1.0):
    cube = assets.make_cube() * 4.0 + np.array([0, -6, 0], np.float32)
    sphere = assets.make_icosphere(2, 3.0) + np.array([6, -3, 2], np.float32)
    plane = (assets.make_ground_plane() * np.array([150, 1, 150], np.float32)
             + np.array([0, -10, 0], np.float32))
    verts = np.concatenate([plane, cube, sphere])
    mats = np.zeros((verts.shape[0], 4), np.float32)
    mats[:2, 0:3] = (0.5, 0.5, 0.5)
    mats[2:14, 0:3] = (1.0, 0.2, 0.2)
    mats[2:14, 3] = mat_cube
    mats[14:, 0:3] = (0.7, 0.7, 0.2)
    mats[14:, 3] = mat_sphere
    return (build_gpu_scene_from_arrays(verts, mats),
            build_fast_scene_from_arrays(verts, mats))


def _cam():
    return Camera(origin=(-10.0, 6.0, 30.0), look_at=(0.0, -6.0, 0.0),
                  vfov_deg=40.0, aspect_ratio=W / H)


def _compare(mat_cube=0.0, mat_sphere=1.0, sky=True, rng="reference"):
    slow_scene, fast_scene = _scenes(mat_cube, mat_sphere)
    cfg_slow = RenderConfig(width=W, height=H, rng_mode=rng,
                            kernel="wavefront")
    cfg_fast = RenderConfig(width=W, height=H, rng_mode=rng, kernel="packet")
    uni = _cam().uniforms(sky_enabled=sky)
    a, stats_a = render_linear(slow_scene, uni, cfg_slow)
    b, stats_b = render_linear_fast(fast_scene, uni, cfg_fast)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)
    assert float(stats_b["rays_traced"]) == float(stats_a["rays_traced"])


def test_packet_matches_wavefront_lambertian():
    _compare(0.0, 0.0)


def test_packet_matches_wavefront_metal_mix():
    _compare(0.0, 1.0)


def test_packet_matches_wavefront_fuzzy_emissive():
    _compare(3.0, 2.0, sky=False)


def test_packet_matches_wavefront_progressive_rng():
    _compare(0.0, 1.0, rng="progressive")


def test_compaction_clone_slots_with_live_ray0():
    """Regression: when ray 0 is still alive at a compaction boundary,
    clone slots must not re-deposit its color (needs p > compact floor so
    levels actually compact, and a view where the top-left ray bounces)."""
    w, h = 128, 32
    plane = (assets.make_ground_plane() * np.array([500, 1, 500], np.float32)
             + np.array([0, -10, 0], np.float32))
    mats = np.zeros((2, 4), np.float32)
    mats[:, 0:3] = (0.9, 0.9, 0.9)  # bright matte: long-lived paths
    slow = build_gpu_scene_from_arrays(plane, mats)
    fast = build_fast_scene_from_arrays(plane, mats)
    # Look down at the plane so every primary (incl. pixel 0) hits it.
    cam = Camera(origin=(0.0, 40.0, 0.1), look_at=(0.0, 0.0, 0.0),
                 vfov_deg=60.0, aspect_ratio=w / h)
    uni = cam.uniforms()
    a, _ = render_linear(slow, uni, RenderConfig(
        width=w, height=h, rng_mode="reference", kernel="wavefront"))
    b, _ = render_linear_fast(fast, uni, RenderConfig(
        width=w, height=h, rng_mode="reference", kernel="packet"))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_pallas_b0_matches_megakernel(monkeypatch):
    """A/B: the Pallas per-tile bounce-0 path must agree with the default
    megakernel to float tolerance (same RNG streams, same strict
    closest-t). Needs a frame large enough for 1024-ray tiles."""
    w, h = 128, 32
    cube = assets.make_cube() * 4.0 + np.array([0, -6, 0], np.float32)
    sphere = assets.make_icosphere(2, 3.0) + np.array([6, -3, 2], np.float32)
    plane = (assets.make_ground_plane() * np.array([150, 1, 150], np.float32)
             + np.array([0, -10, 0], np.float32))
    verts = np.concatenate([plane, cube, sphere])
    mats = np.zeros((verts.shape[0], 4), np.float32)
    mats[:2, 0:3] = (0.5, 0.5, 0.5)
    mats[2:14, 0:3] = (1.0, 0.2, 0.2)
    mats[14:, 0:3] = (0.7, 0.7, 0.2)
    mats[14:, 3] = 1.0
    fast_scene = build_fast_scene_from_arrays(verts, mats)
    cfg = RenderConfig(width=w, height=h, rng_mode="reference",
                       kernel="packet")
    cam = Camera(origin=(-10.0, 6.0, 30.0), look_at=(0.0, -6.0, 0.0),
                 vfov_deg=40.0, aspect_ratio=w / h)
    uni = cam.uniforms()
    monkeypatch.setenv("RAYTPU_B0", "mega")
    a, stats_a = render_linear_fast(fast_scene, uni, cfg)
    monkeypatch.setenv("RAYTPU_B0", "pallas")
    b, stats_b = render_linear_fast(fast_scene, uni, cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)
    assert float(stats_a["rays_traced"]) == float(stats_b["rays_traced"])


def test_bvh4_matches_binary_traversal(monkeypatch):
    """The 4-wide collapse (bvh/bvh4.py + _trace4_kernel) must agree with
    the binary packed-row traversal through the production entry point
    (strict closest-t makes the result order-independent)."""
    import jax.numpy as jnp

    from raytracer_tpu.kernels.pallas_trace import pallas_traverse

    _, fast_scene = _scenes(0.0, 1.0)
    assert fast_scene.nodes4 is not None
    P = 2048
    rng = np.random.default_rng(3)
    o = tuple(jnp.asarray(rng.uniform(-20, 20, P).astype(np.float32))
              for _ in range(3))
    d0 = rng.normal(size=(P, 3)).astype(np.float32)
    d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
    d = tuple(jnp.asarray(d0[:, i]) for i in range(3))
    alive = jnp.asarray(rng.uniform(size=P) < 0.9)
    cfg = RenderConfig(width=16, height=128)
    monkeypatch.setenv("RAYTPU_TRAVERSE", "binary")
    a = pallas_traverse(fast_scene, o, d, alive, cfg, interpret=True,
                        sublanes=8)
    monkeypatch.setenv("RAYTPU_TRAVERSE", "bvh4")
    b = pallas_traverse(fast_scene, o, d, alive, cfg, interpret=True,
                        sublanes=8)
    for x, y in [(a.closest_t, b.closest_t), (a.normal[0], b.normal[0]),
                 (a.mat_albedo[2], b.mat_albedo[2]),
                 (a.mat_type, b.mat_type)]:
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_pallas_b0_padded_raster_fallback(monkeypatch):
    """Frames that don't tile (120x40: no 4096-ray pixel tile divides, ray
    count not a BLOCK multiple) must still run the Pallas path via the
    raster-order + dead-ray padding fallback, matching the megakernel."""
    w, h = 120, 40
    _, fast_scene = _scenes(0.0, 1.0)
    cfg = RenderConfig(width=w, height=h, rng_mode="reference",
                       kernel="packet", max_bounces=4)
    cam = Camera(origin=(-10.0, 6.0, 30.0), look_at=(0.0, -6.0, 0.0),
                 vfov_deg=40.0, aspect_ratio=w / h)
    uni = cam.uniforms()
    monkeypatch.setenv("RAYTPU_B0", "mega")
    a, stats_a = render_linear_fast(fast_scene, uni, cfg)
    monkeypatch.setenv("RAYTPU_B0", "pallas")
    monkeypatch.setenv("RAYTPU_BOUNCE", "wave")
    b, stats_b = render_linear_fast(fast_scene, uni, cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)
    assert float(stats_a["rays_traced"]) == float(stats_b["rays_traced"])


def test_pallas_b0_padded_tile_major(monkeypatch):
    """Frames that tile but don't divide the pad grain (384x8 = 3072 rays,
    tile (8,128), grain 2048 -> p_pad 4096 != p — the 1080p shape) must
    keep tile-major order with a dead wrapped tail, matching the
    megakernel (VERDICT r2 #4)."""
    w, h = 384, 8
    _, fast_scene = _scenes(0.0, 1.0)
    cfg = RenderConfig(width=w, height=h, rng_mode="reference",
                       kernel="packet", max_bounces=4)
    cam = Camera(origin=(-10.0, 6.0, 30.0), look_at=(0.0, -6.0, 0.0),
                 vfov_deg=40.0, aspect_ratio=w / h)
    uni = cam.uniforms()
    from raytracer_tpu.kernels.pallas_trace import BLOCK, pick_tile
    from raytracer_tpu.kernels.wavefront import BBLOCK
    grain = max(BLOCK, BBLOCK)
    assert pick_tile(h, w) is not None and (w * h) % grain != 0, \
        "test no longer exercises the padded tile-major case"
    monkeypatch.setenv("RAYTPU_B0", "mega")
    a, stats_a = render_linear_fast(fast_scene, uni, cfg)
    monkeypatch.setenv("RAYTPU_B0", "pallas")
    monkeypatch.setenv("RAYTPU_BOUNCE", "wave")
    b, stats_b = render_linear_fast(fast_scene, uni, cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)
    assert float(stats_a["rays_traced"]) == float(stats_b["rays_traced"])


def test_tile_packet_b0_matches_megakernel(monkeypatch):
    """A/B: the RAYTPU_B0=packet tile phase must agree with the default
    megakernel primaries path (same strict closest-t semantics)."""
    _, fast_scene = _scenes(0.0, 1.0)
    cfg = RenderConfig(width=W, height=H, rng_mode="reference",
                       kernel="packet")
    uni = _cam().uniforms()
    monkeypatch.setenv("RAYTPU_B0", "mega")
    a, _ = render_linear_fast(fast_scene, uni, cfg)
    monkeypatch.setenv("RAYTPU_B0", "packet")
    b, _ = render_linear_fast(fast_scene, uni, cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_packet_rejects_unaligned_resolution():
    import pytest

    _, fast_scene = _scenes()
    cfg = RenderConfig(width=30, height=20, kernel="packet")
    with pytest.raises(ValueError):
        render_linear_fast(fast_scene, _cam().uniforms(), cfg)


def test_packet_empty_scene():
    from raytracer_tpu.scene.builder import build_fast_scene

    scene = build_fast_scene([])
    cfg = RenderConfig(width=W, height=H, kernel="packet")
    img, _ = render_linear_fast(scene, _cam().uniforms(), cfg)
    assert np.asarray(img).mean() > 0.4  # sky


def test_compaction_levels_match_uncompacted(monkeypatch):
    """Force tiny compaction levels so the level transitions (cumsum
    compaction + color deposit + width switch) are exercised, and verify
    the image is identical to the single-level run."""
    import importlib

    from raytracer_tpu.kernels import packet as pk

    _, fast_scene = _scenes(0.0, 1.0)
    cfg = RenderConfig(width=W, height=H, rng_mode="reference")
    uni = _cam().uniforms()

    monkeypatch.setenv("RAYTPU_COMPACT_FLOOR", str(10**9))  # no compaction
    a, sa = pk.render_linear_fast(fast_scene, uni, cfg)
    monkeypatch.setenv("RAYTPU_COMPACT_FLOOR", "16")        # many levels
    b, sb = pk.render_linear_fast(fast_scene, uni, cfg)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(sa["rays_traced"]) == float(sb["rays_traced"])


def test_compaction_clone_slots_do_not_deposit(monkeypatch):
    """Regression: unfilled compaction slots default to ray 0's state and
    must not re-deposit its color at later level boundaries."""
    import jax.numpy as jnp

    from raytracer_tpu.kernels.packet import megakernel_bounces
    from raytracer_tpu.scene.builder import build_fast_scene_from_arrays

    monkeypatch.setenv("RAYTPU_COMPACT_FLOOR", "4")
    cube = assets.make_cube() * 4.0
    mats = np.zeros((12, 4), np.float32)
    mats[:, 0:3] = 0.5
    scene = build_fast_scene_from_arrays(cube, mats)
    cfg = RenderConfig(width=16, height=16)

    p = 64
    zero = jnp.zeros((p,), jnp.float32)
    one = jnp.ones((p,), jnp.float32)
    # Ray 0: dead at entry carrying color 7 (a bounce-0 sky pixel).
    alive = jnp.asarray(np.array([False] + [True] * 3 + [False] * 60))
    color = (jnp.zeros(p).at[0].set(7.0), zero, zero)
    ro = (zero, zero, jnp.full((p,), 20.0))
    rd = (zero, zero, jnp.full((p,), -1.0))
    cx, _, _, _ = megakernel_bounces(
        scene, ro, rd, color, (one, one, one),
        jnp.arange(p, dtype=jnp.uint32) * 7919, alive, True, cfg,
        start_bounce=1)
    assert float(cx[0]) == 7.0
