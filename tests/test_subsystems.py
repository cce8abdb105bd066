"""Aux subsystems: config, profiler, presets, engine loop."""

import os
import time

import numpy as np
import pytest

from raytracer_tpu.core.types import RenderConfig
from raytracer_tpu.utils.config import load_config, parse_env_file
from raytracer_tpu.utils.profiler import FrameCounter, StageTimer


def test_env_file_config(tmp_path):
    p = tmp_path / ".env"
    p.write_text("# comment\nRAYTPU_WIDTH=320\nRAYTPU_MAX_BOUNCES=4\n"
                 "RAYTPU_KERNEL=wavefront\nRAYTPU_FUZZ=0.5\n")
    cfg = load_config(env_file=str(p))
    assert cfg.width == 320 and cfg.height == 720
    assert cfg.max_bounces == 4 and cfg.kernel == "wavefront"
    assert cfg.fuzz == 0.5


def test_env_var_overrides_file(tmp_path, monkeypatch):
    p = tmp_path / ".env"
    p.write_text("RAYTPU_WIDTH=320\n")
    monkeypatch.setenv("RAYTPU_WIDTH", "640")
    cfg = load_config(env_file=str(p))
    assert cfg.width == 640


def test_kwarg_overrides_all(monkeypatch):
    monkeypatch.setenv("RAYTPU_WIDTH", "640")
    cfg = load_config(width=128)
    assert cfg.width == 128


def test_stage_timer():
    t = StageTimer()
    with t.stage("build"):
        time.sleep(0.01)
    with t.stage("build"):
        time.sleep(0.01)
    s = t.summary()
    assert s["build"]["count"] == 2
    assert s["build"]["total_ms"] >= 15


def test_frame_counter():
    c = FrameCounter(window_s=10.0)
    for _ in range(5):
        c.tick(rays=1e6)
        time.sleep(0.01)
    assert c.fps > 0
    assert c.mrays_per_s > 0


def test_presets_build_and_render():
    """Each BASELINE preset builds into a renderable device scene (tiny
    render smoke test)."""
    import dataclasses

    from raytracer_tpu.engine.renderer import Renderer
    from raytracer_tpu.scene.builder import build_fast_scene
    from raytracer_tpu.scene.presets import ALL_PRESETS

    for name, factory in ALL_PRESETS.items():
        preset = factory(width=32, height=24)
        scene = build_fast_scene(preset.scene.create_snapshot())
        assert int(scene.num_triangles) > 0, name
        cfg = dataclasses.replace(preset.config, width=32, height=24,
                                  max_bounces=2)
        r = Renderer(cfg)
        _, img, _ = r.render(
            scene, preset.camera.uniforms(sky_enabled=preset.sky_enabled,
                                          exposure=preset.exposure))
        img = np.asarray(img)
        assert img.shape == (24, 32, 3), name
        assert img.max() > 0, f"{name} rendered all-black"


def test_engine_loop_lifecycle():
    """RenderEngine: start, rebuild, frame delivery, graceful stop."""
    from raytracer_tpu.core.camera import Camera
    from raytracer_tpu.engine.loop import RenderEngine
    from raytracer_tpu.scene.scene import ModelInstance, Scene
    from raytracer_tpu.utils import assets

    cfg = RenderConfig(width=32, height=24, max_bounces=2)
    engine = RenderEngine(cfg)
    engine.start()
    try:
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            obj = os.path.join(d, "cube.obj")
            assets.write_obj(obj, assets.make_cube() * 5.0)
            scene = Scene([ModelInstance(obj)])
            fut = engine.rebuild_scene_async(scene)
            fut.result(timeout=30)

        cam = Camera(origin=(0, 2, 20), look_at=(0, 0, 0), vfov_deg=40,
                     aspect_ratio=32 / 24)
        deadline = time.time() + 120
        frame = None
        while time.time() < deadline and frame is None:
            cam.increment_frame_count()
            engine.submit_camera_update(cam.uniforms())
            time.sleep(0.1)
            frame = engine.latest_frame()
        assert frame is not None, "no frame rendered"
        assert frame.pixels.shape == (24, 32, 3)
        assert frame.rays_traced > 0
    finally:
        engine.stop()


def test_engine_loop_pipeline_depth(monkeypatch):
    """Pipelined dispatch (RAYTPU_PIPELINE frames in flight): frames
    publish in submission order with no drops, and the in-flight queue
    drains on stop so the last submitted frame is never lost."""
    from raytracer_tpu.core.camera import Camera
    from raytracer_tpu.engine.loop import RenderEngine
    from raytracer_tpu.scene.scene import Scene

    monkeypatch.setenv("RAYTPU_PIPELINE", "3")
    engine = RenderEngine(RenderConfig(width=16, height=16, max_bounces=1))
    engine.start()
    try:
        fut = engine.rebuild_scene_async(Scene([]))
        fut.result(timeout=30)
        cam = Camera(origin=(0, 2, 20), look_at=(0, 0, 0), vfov_deg=40,
                     aspect_ratio=1.0)
        engine.submit_camera_update(cam.uniforms())
        numbers = []
        deadline = time.time() + 120
        while time.time() < deadline and len(numbers) < 6:
            f = engine.latest_frame()
            if f is not None:
                numbers.append(f.frame_number)
            time.sleep(0.02)
        assert len(numbers) >= 6, "pipelined loop published no frames"
        # latest_frame drains to latest, so numbers skip but never reorder.
        assert numbers == sorted(numbers)
    finally:
        engine.stop()
    # stop() flushed the in-flight tail.
    tail = engine.latest_frame()
    assert tail is None or tail.frame_number >= numbers[-1]


def test_engine_loop_survives_bad_rebuild():
    """A failing rebuild keeps the engine alive (reference policy)."""
    from raytracer_tpu.engine.loop import RenderEngine
    from raytracer_tpu.scene.scene import ModelInstance, Scene

    engine = RenderEngine(RenderConfig(width=16, height=16, max_bounces=1))
    engine.start()
    try:
        scene = Scene([ModelInstance("/definitely/missing.obj")])
        fut = engine.rebuild_scene_async(scene)
        built = fut.result(timeout=30)  # empty scene, not an exception
        assert int(built.num_triangles) == 0
    finally:
        engine.stop()


def test_engine_ladder_ticks_dont_starve_fullres(monkeypatch):
    """Regression: the viewer submits camera uniforms every 16 ms tick
    with a GROWING accumulation counter (VulkanApp.java:194-235 analogue).
    The loop's drop-stale-frames latency rule must key on the counter
    going BACKWARD (a reset = user action), not on mailbox freshness —
    otherwise every tick clears the frame the previous iteration rendered
    and full-resolution frames never publish once the ladder window ends."""
    from raytracer_tpu.core.camera import Camera
    from raytracer_tpu.engine.loop import RenderEngine
    from raytracer_tpu.scene.scene import Scene

    monkeypatch.setenv("RAYTPU_LADDER_SCALE", "2")
    engine = RenderEngine(RenderConfig(width=32, height=16, max_bounces=1),
                          ladder_frames=2)
    assert engine._preview is not None
    engine.start()
    try:
        fut = engine.rebuild_scene_async(Scene([]))
        fut.result(timeout=30)
        cam = Camera(origin=(0, 2, 20), look_at=(0, 0, 0), vfov_deg=40,
                     aspect_ratio=2.0)
        kinds = []
        deadline = time.time() + 120
        while time.time() < deadline and kinds.count(False) < 3:
            f = engine.latest_frame()
            if f is not None:
                kinds.append(f.preview)
                cam.increment_frame_count()   # the UI tick rule
            engine.submit_camera_update(cam.uniforms())  # every tick
            time.sleep(0.005)
        assert kinds.count(True) >= 1, "ladder previews never published"
        assert kinds.count(False) >= 3, (
            f"full-res frames starved by tick submissions: {kinds}")
        # A reset (user action) switches back to previews.
        cam.reset_accumulation()
        engine.submit_camera_update(cam.uniforms())
        deadline = time.time() + 60
        saw_preview_again = False
        while time.time() < deadline and not saw_preview_again:
            f = engine.latest_frame()
            if f is not None and f.preview:
                saw_preview_again = True
            time.sleep(0.01)
        assert saw_preview_again
    finally:
        engine.stop()
