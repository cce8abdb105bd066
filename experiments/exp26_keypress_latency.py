"""exp26: interactive keypress-to-frame latency at 720p (real TPU).

The reference's editor runs a 16 ms tick loop and the whole scene redraws
within a frame of a WASD keypress (VulkanApp.java:171,194-235). The TPU
answer is the resolution ladder (engine/loop.py): while the camera moves,
quarter-res frames are rendered and upscaled; once still, full-res
accumulation resumes. This drives the REAL ViewerApp (tick loop and all,
no HTTP) and measures the user-visible number: wall time from
ViewerApp.key('W') to the first published frame rendered with the new
camera (samples reset to 1), with the ladder on and off.

Run from the repo root on the TPU:
    python experiments/exp26_keypress_latency.py
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if os.environ.get("RAYTPU_EXP26_CPU") == "1":
        import jax
        jax.config.update("jax_platforms", "cpu")
    from raytracer_tpu.core.types import RenderConfig
    from raytracer_tpu.scene.scene import ModelInstance, Scene
    from raytracer_tpu.utils.assets import asset_path

    scene = Scene([
        ModelInstance(model_path=asset_path("FinalBaseMesh.obj"),
                      display_name="human", position=(0.0, -10.0, 0.0),
                      scale=(2.0,) * 3, color=(0.7, 0.6, 0.5)),
        ModelInstance(model_path=asset_path("ground_plane.obj"),
                      display_name="ground", position=(0.0, -10.0, 0.0),
                      scale=(150.0, 1.0, 150.0), color=(0.5, 0.5, 0.5)),
    ])

    res = os.environ.get("RAYTPU_EXP26_RES", "1280x720")
    w, h = (int(x) for x in res.split("x"))
    results = {}
    for ladder in (8, 0):
        os.environ["RAYTPU_LADDER"] = str(ladder)
        from raytracer_tpu.apps.viewer import ViewerApp

        cfg = RenderConfig(width=w, height=h, max_bounces=10,
                           kernel="packet")
        app = ViewerApp(cfg, scene)
        app.start()
        # Warm both executables (full res + ladder preview): wait until
        # frames publish steadily past the ladder window.
        t0 = time.time()
        while time.time() - t0 < 1200:
            f = app.engine.latest_frame()
            if f is not None and f.frame_number >= max(ladder + 4, 6):
                break
            time.sleep(0.1)
        f = app.engine.latest_frame()
        print(f"ladder={ladder}: warm at frame "
              f"{0 if f is None else f.frame_number}", flush=True)

        # Per-press latency from the engine's own instrumentation
        # (engine/loop.py): the first post-event frame carries
        # input_latency_ms = event -> publish on one clock, split into
        # wait_ms (event -> dispatch) + render_ms — no polling race.
        lats, waits, renders = [], [], []
        for press in range(6):
            time.sleep(2.0)  # settle into full-res accumulation
            before = app.engine.last_event_frame
            t_press = time.perf_counter()
            app.key("W")
            while app.engine.last_event_frame is before:
                if time.perf_counter() - t_press > 60:
                    break
                time.sleep(0.002)
            f = app.engine.last_event_frame
            if f is before or f is None:
                lats.append(float("nan"))
                continue
            lats.append(f.input_latency_ms)
            waits.append(f.wait_ms)
            renders.append(f.render_ms)
        app.stop()
        med = statistics.median(lats)
        results[ladder] = med
        print(f"ladder={ladder}: keypress->frame median {med:.0f} ms "
              f"({['%.0f' % x for x in lats]}) | "
              f"wait {['%.0f' % x for x in waits]} | "
              f"render {['%.0f' % x for x in renders]}", flush=True)
    print({"ladder_on_ms": results[8], "ladder_off_ms": results[0]})


if __name__ == "__main__":
    main()
