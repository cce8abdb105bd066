"""exp26b: keypress-latency anatomy (real TPU).

exp26 measured keypress->frame ~0.5-1.8 s at 720p with worker-phase noise
3x the effect under study. Before touching the ladder again, decompose the
latency into its parts with direct measurements in ONE process:

  a. raw preview-frame cost: dispatch+readback of the ladder Renderer
     (scale 2 -> 640x360) with changing camera, no loop machinery;
  b. raw full-res frame cost (same, 1280x720);
  c. loop-observed latency: drive RenderEngine directly (no viewer), poll
     latest_frame at 1 kHz around a camera submit, record the arrival
     time + samples + preview flag of every publish for 2 s after the
     press -> a timeline that shows whether the gap is device-queue
     drain (in-flight full-res frames), the preview dispatch itself, or
     loop scheduling.

Run from the repo root: python experiments/exp26b_latency_anatomy.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def raw_frame_cost(renderer, scene, cam, n=6):
    """Median wall time of camera-changing render+readback (no pipeline)."""
    accum, img, _ = renderer.render(scene, cam.uniforms())
    np.asarray(img)  # compile + settle
    ts = []
    for i in range(n):
        cam.set_origin(cam.origin + np.array([0, 0, -0.05]))
        t0 = time.perf_counter()
        accum, img, _ = renderer.render(scene, cam.uniforms(), accum)
        np.asarray(img)
        ts.append((time.perf_counter() - t0) * 1e3)
    return sorted(ts)[len(ts) // 2], ts


def main():
    from raytracer_tpu.core.camera import default_camera
    from raytracer_tpu.core.types import RenderConfig
    from raytracer_tpu.engine.loop import RenderEngine
    from raytracer_tpu.engine.renderer import Renderer
    from raytracer_tpu.scene.builder import build_fast_scene
    from raytracer_tpu.scene.scene import ModelInstance, Scene
    from raytracer_tpu.utils.assets import asset_path

    scene_g = Scene([
        ModelInstance(model_path=asset_path("FinalBaseMesh.obj"),
                      display_name="human", position=(0.0, -10.0, 0.0),
                      scale=(2.0,) * 3, color=(0.7, 0.6, 0.5)),
        ModelInstance(model_path=asset_path("ground_plane.obj"),
                      display_name="ground", position=(0.0, -10.0, 0.0),
                      scale=(150.0, 1.0, 150.0), color=(0.5, 0.5, 0.5)),
    ])
    fast = build_fast_scene(scene_g.create_snapshot())

    w, h = 1280, 720
    # a/b: raw frame costs.
    for label, (rw, rh) in (("preview 640x360", (640, 360)),
                            ("full 1280x720", (w, h))):
        cfg = RenderConfig(width=rw, height=rh, max_bounces=10,
                           kernel="packet")
        med, ts = raw_frame_cost(Renderer(cfg), fast,
                                 default_camera(rw, rh))
        log(f"raw {label}: median {med:.0f} ms "
            f"({' '.join(f'{t:.0f}' for t in ts)})")

    # c: loop-observed timeline.
    os.environ["RAYTPU_LADDER"] = "8"
    cfg = RenderConfig(width=w, height=h, max_bounces=10, kernel="packet")
    eng = RenderEngine(cfg, device_rebuild=False, ladder_frames=8)
    cam = default_camera(w, h)
    eng.submit_scene(fast)
    eng.submit_camera_update(cam.uniforms())
    eng.start()
    t0 = time.time()
    seen = 0
    while time.time() - t0 < 600:
        f = eng.latest_frame()
        if f is not None:
            seen = f.frame_number
            if seen >= 12:
                break
        time.sleep(0.05)
    log(f"loop warm at frame {seen}")

    for press in range(4):
        time.sleep(2.5)  # settle into full-res accumulation
        cam.move("W")    # resets frame_count like the viewer key handler
        t_press = time.perf_counter()
        eng.submit_camera_update(cam.uniforms())
        events = []
        while time.perf_counter() - t_press < 2.5:
            f = eng.latest_frame()
            if f is not None:
                events.append((
                    (time.perf_counter() - t_press) * 1e3,
                    f.samples, f.preview, f.render_ms))
            time.sleep(0.001)
        tl = " | ".join(f"{t:.0f}ms s={s:.0f}{' P' if p else ''}"
                        f" r={r:.0f}" for t, s, p, r in events[:8])
        first = next((t for t, s, p, r in events if s <= 1.5), None)
        log(f"press {press}: first-new-frame "
            f"{first if first is None else round(first)} ms; {tl}")
    eng.stop()


if __name__ == "__main__":
    main()
