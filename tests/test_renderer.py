"""Render-step semantics: accumulation, tonemap/exposure, empty scenes."""

import numpy as np

import jax.numpy as jnp

from raytracer_tpu.core.camera import Camera
from raytracer_tpu.core.types import RenderConfig
from raytracer_tpu.engine.renderer import Renderer, tonemap
from raytracer_tpu.scene.builder import build_gpu_scene


W, H = 16, 16


def _cam():
    return Camera(origin=(-25.0, 30.0, 140.0), look_at=(0, 0, 0),
                  vfov_deg=20.0, aspect_ratio=W / H)


def test_tonemap_gamma_and_exposure():
    lin = jnp.full((2, 2, 3), 0.25, jnp.float32)
    # sqrt gamma: 0.25 -> 0.5 -> 127.5 -> rounds to 128 (banker's? round
    # half to even: 127.5 -> 128)
    out = tonemap(lin, jnp.float32(0.0))
    assert out.dtype == jnp.uint8
    assert int(out[0, 0, 0]) == 128
    # +2 stops: 0.25*4 = 1.0 -> 255
    out2 = tonemap(lin, jnp.float32(2.0))
    assert int(out2[0, 0, 0]) == 255
    # clamping above 1.0
    out3 = tonemap(jnp.full((1, 1, 3), 9.0, jnp.float32), jnp.float32(0.0))
    assert int(out3[0, 0, 0]) == 255


def test_accumulation_running_average(tiny_scene):
    """accum_n = mean of n samples; verified against manual averaging."""
    cfg = RenderConfig(width=W, height=H, rng_mode="progressive",
                       kernel="wavefront")
    r = Renderer(cfg)
    cam = _cam()

    frames = []
    accum = r.new_accumulator()
    for fc in range(3):
        cam.frame_count = fc
        accum, img, stats = r.render(tiny_scene, cam.uniforms(), accum)
        frames.append(np.asarray(accum))

    # Re-render each sample independently and average by hand.
    from raytracer_tpu.kernels.tracer import render_linear
    singles = []
    for fc in range(3):
        cam.frame_count = fc
        lin, _ = render_linear(tiny_scene, cam.uniforms(), cfg)
        singles.append(np.asarray(lin))
    np.testing.assert_allclose(frames[0], singles[0], atol=1e-6)
    np.testing.assert_allclose(frames[2], np.mean(singles, axis=0), atol=1e-5)
    assert float(stats["samples"]) == 3.0


def test_render_deterministic(tiny_scene):
    cfg = RenderConfig(width=W, height=H, kernel="wavefront")
    r = Renderer(cfg)
    cam = _cam()
    _, img1, _ = r.render(tiny_scene, cam.uniforms())
    _, img2, _ = r.render(tiny_scene, cam.uniforms())
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))


def test_empty_scene_renders_sky():
    """0-triangle scene stays valid (reference dummy-buffer behaviour,
    VulkanEngine.java:362-364) and shades pure sky."""
    scene = build_gpu_scene([])  # no instances
    cfg = RenderConfig(width=W, height=H, kernel="wavefront")
    r = Renderer(cfg)
    _, img, _ = r.render(scene, _cam().uniforms())
    img = np.asarray(img)
    assert img.mean() > 100  # bright sky gradient
    # Blue channel >= red channel everywhere (white->blue gradient).
    assert (img[..., 2].astype(int) >= img[..., 0].astype(int)).all()


def test_failed_model_load_is_skipped(tmp_path):
    """Missing .obj files skip-and-continue (SceneBuilder.java:55-58)."""
    from raytracer_tpu.scene.scene import ModelInstance
    from raytracer_tpu.utils import assets

    good = str(tmp_path / "cube.obj")
    assets.write_obj(good, assets.make_cube())
    scene = build_gpu_scene([
        ModelInstance("/nonexistent/m.obj"),
        ModelInstance(good),
    ])
    assert int(scene.num_triangles) == 12


def test_scene_edit_reuses_bucket_no_recompile(tiny_scene):
    """Two scenes in the same capacity bucket hit the same executable."""
    cfg = RenderConfig(width=W, height=H, kernel="wavefront")
    r = Renderer(cfg)
    cam = _cam()
    r.render(tiny_scene, cam.uniforms())
    n0 = r._step._cache_size()

    # "Edit": rebuild with a moved cube — same triangle count -> same bucket.
    from raytracer_tpu.scene.builder import build_gpu_scene_from_arrays
    from raytracer_tpu.utils import assets
    cube = assets.make_cube() * 4.0 + np.array([3, -6, 0], np.float32)
    plane = (assets.make_ground_plane() * np.array([150, 1, 150], np.float32)
             + np.array([0, -10, 0], np.float32))
    verts = np.concatenate([plane, cube])
    mats = np.zeros((verts.shape[0], 4), np.float32)
    mats[:, 0:3] = 0.5
    edited = build_gpu_scene_from_arrays(verts, mats)

    r.render(edited, cam.uniforms())
    assert r._step._cache_size() == n0


def test_renderer_instances_share_the_jitted_step(tiny_scene):
    """Re-instantiating a Renderer with an equal cfg must reuse the SAME
    jitted step (no retrace): a second headless run in one process, a
    viewer ladder swap, or a bench arm would otherwise pay ~25-30 s of
    retrace per instance on the axon tunnel (exp38 r5c). The shared cache
    keys on (cfg, RAYTPU_* fingerprint), so flipping a trace-time knob
    still gets a fresh trace."""
    cfg = RenderConfig(width=W, height=H, kernel="wavefront")
    r1 = Renderer(cfg)
    cam = _cam()
    r1.render(tiny_scene, cam.uniforms())
    n0 = r1._step._cache_size()

    r2 = Renderer(RenderConfig(width=W, height=H, kernel="wavefront"))
    assert r2._step is r1._step
    r2.render(tiny_scene, cam.uniforms())
    assert r2._step._cache_size() == n0  # no retrace

    import os

    os.environ["RAYTPU_TEST_KNOB_XYZ"] = "1"
    try:
        r3 = Renderer(cfg)
        assert r3._step is not r1._step  # knob flip -> fresh trace
    finally:
        os.environ.pop("RAYTPU_TEST_KNOB_XYZ")


def test_render_chain_matches_sequential():
    """render_chain (k frames per dispatch via lax.scan) must produce a
    bit-identical accumulator and image to k sequential render() calls —
    it only amortizes dispatch overhead (engine/renderer._render_chain)."""
    from raytracer_tpu.scene.builder import build_fast_scene_from_arrays
    from raytracer_tpu.utils import assets

    tris = assets.make_terrain(n=8)
    mats = np.zeros((tris.shape[0], 4), np.float32)
    mats[:, 0:3] = 0.6
    scene = build_fast_scene_from_arrays(tris, mats)
    cfg = RenderConfig(width=32, height=24, max_bounces=3)
    cam = Camera(origin=(0.0, 30.0, 80.0), look_at=(0.0, 0.0, 0.0),
                 vfov_deg=40.0, aspect_ratio=32 / 24)
    r = Renderer(cfg)

    accum = None
    for fc in range(4):
        cam.frame_count = fc
        accum, img_seq, _ = r.render(scene, cam.uniforms(), accum)

    cam.frame_count = 0
    accum2, img_ch, stats = r.render_chain(scene, cam.uniforms(), None, 4)
    np.testing.assert_array_equal(np.asarray(accum), np.asarray(accum2))
    np.testing.assert_array_equal(np.asarray(img_seq), np.asarray(img_ch))
    assert float(stats["samples"]) == 4.0
