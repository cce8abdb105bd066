"""Benchmark: Mrays/s + FPS on the ~50k-triangle flagship scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Baseline: the reference sustains ~40 FPS at 1280x720 on "complex scenes"
(README.md:42 on Intel Iris Xe) = 36.9 M primary rays/s (BASELINE.md).
``vs_baseline`` is the apples-to-apples FPS ratio at the reference
resolution; the JSON carries both the total-segment rate (primaries +
bounces, from kernel stats) and the primary-only rate.

Modes (RAYTPU_BENCH_MODE or argv[1]) map to the five BASELINE.json configs:
  flagship    default/headline: FinalBaseMesh+plane, 720p, 10-bounce path
  c12_cube    cube+plane, fixed-light single-bounce, 640x480 (compute.comp)
  light_metal icosphere metal + emissive "point light" sphere + plane
  moon        Moon.obj emissive, per-frame camera UBO updates, 720p
  two_humans  2x FinalBaseMesh with a per-frame on-device LBVH rebuild
  car_1080p   flagship mesh, mixed materials, 1920x1080 path tracing

Env knobs: RAYTPU_BENCH_RES=WxH, RAYTPU_BENCH_FRAMES=N,
RAYTPU_BENCH_BOUNCES=N, RAYTPU_BENCH_SPP=K (renders K samples per
dispatch inside one jit — amortizes per-dispatch fixed cost + readback
RTT; the reference's accumulation loop does 1 sample per 16 ms tick,
VulkanApp.java:199-217).
"""

import json
import os
import sys
import time

import numpy as np


def _mode_setup(mode, width, height, bounces):
    """Returns (scene_or_builder, cfg, cam, per_frame_rebuild)."""
    from __graft_entry__ import _flagship_scene
    from raytracer_tpu.core.camera import Camera, default_camera
    from raytracer_tpu.core.types import RenderConfig
    from raytracer_tpu.scene.builder import build_fast_scene_from_arrays
    from raytracer_tpu.utils import assets

    if mode == "flagship":
        cfg = RenderConfig(width=width, height=height, max_bounces=bounces,
                           kernel="packet")
        return _flagship_scene(), cfg, default_camera(width, height), None

    if mode == "c12_cube":
        # Config #1: cube + ground plane, fixed camera, single-bounce
        # fixed-light kernel (compute.comp path) at 640x480.
        w, h = 640, 480
        cube = assets.make_cube() * 4.0 + np.array([0, -6, 0], np.float32)
        plane = (assets.make_ground_plane()
                 * np.array([150, 1, 150], np.float32)
                 + np.array([0, -10, 0], np.float32))
        verts = np.concatenate([plane, cube]).astype(np.float32)
        mats = np.zeros((verts.shape[0], 4), np.float32)
        mats[:, 0:3] = (0.8, 0.3, 0.3)
        scene = build_fast_scene_from_arrays(verts, mats)
        cfg = RenderConfig(width=w, height=h, max_bounces=1,
                           shading="fixed_light", kernel="packet")
        cam = Camera(origin=(-10.0, 6.0, 30.0), look_at=(0.0, -6.0, 0.0),
                     vfov_deg=40.0, aspect_ratio=w / h)
        return scene, cfg, cam, None

    if mode == "light_metal":
        # Config #2: sphere + plane, Metal, "dynamic point light" = the
        # emissive-material path (SURVEY.md discrepancy #5).
        sphere = assets.make_icosphere(4, 4.0) + np.array(
            [0, -5, 0], np.float32)
        light = assets.make_icosphere(2, 2.0) + np.array(
            [8, 6, 8], np.float32)
        plane = (assets.make_ground_plane()
                 * np.array([150, 1, 150], np.float32)
                 + np.array([0, -10, 0], np.float32))
        verts = np.concatenate([plane, sphere, light]).astype(np.float32)
        mats = np.zeros((verts.shape[0], 4), np.float32)
        mats[:2, 0:3] = (0.5, 0.5, 0.5)
        mats[2:2 + sphere.shape[0], 0:3] = (0.8, 0.8, 0.9)
        mats[2:2 + sphere.shape[0], 3] = 1.0              # metal
        mats[2 + sphere.shape[0]:, 0:3] = (4.0, 4.0, 3.6)  # emissive
        mats[2 + sphere.shape[0]:, 3] = 3.0
        scene = build_fast_scene_from_arrays(verts, mats)
        cfg = RenderConfig(width=width, height=height, max_bounces=bounces,
                           kernel="packet")
        cam = Camera(origin=(-15.0, 8.0, 40.0), look_at=(0.0, -4.0, 0.0),
                     vfov_deg=30.0, aspect_ratio=width / height)
        return scene, cfg, cam, None

    if mode == "moon":
        # Config #3: Moon.obj emissive, WASD camera UBO updates per frame.
        from raytracer_tpu.scene.objloader import load_obj
        from raytracer_tpu.utils.assets import asset_path

        moon = load_obj(asset_path("Moon.obj")).astype(np.float32)
        mats = np.zeros((moon.shape[0], 4), np.float32)
        mats[:, 0:3] = (3.0, 3.0, 2.8)
        mats[:, 3] = 3.0
        scene = build_fast_scene_from_arrays(moon, mats)
        cfg = RenderConfig(width=width, height=height, max_bounces=bounces,
                           kernel="packet")
        return scene, cfg, default_camera(width, height), "camera"

    if mode == "two_humans":
        # Config #4: 2x FinalBaseMesh with an on-device LBVH rebuild per
        # frame (the live-edit path).
        from raytracer_tpu.scene.device_builder import DeviceSceneBuilder
        from raytracer_tpu.scene.scene import ModelInstance
        from raytracer_tpu.utils.assets import asset_path

        path = asset_path("FinalBaseMesh.obj")
        builder = DeviceSceneBuilder()
        instances = [
            ModelInstance(model_path=path, display_name="human_a",
                          position=(-8.0, -10.0, 0.0), scale=(2.0,) * 3,
                          color=(0.7, 0.6, 0.5), material_type=0.0),
            ModelInstance(model_path=path, display_name="human_b",
                          position=(8.0, -10.0, 0.0), scale=(2.0,) * 3,
                          color=(0.5, 0.6, 0.7), material_type=0.0),
        ]
        cfg = RenderConfig(width=width, height=height, max_bounces=bounces,
                           kernel="packet")
        return (builder, instances), cfg, default_camera(width, height), \
            "rebuild"

    if mode == "car_1080p":
        # Config #5: flagship mesh, mixed materials, 1920x1080 path tracing.
        w, h = 1920, 1080
        cfg = RenderConfig(width=w, height=h, max_bounces=bounces,
                           kernel="packet")
        return _flagship_scene(), cfg, default_camera(w, h), None

    raise SystemExit(f"unknown bench mode: {mode}")


def main():
    mode = (sys.argv[1] if len(sys.argv) > 1
            else os.environ.get("RAYTPU_BENCH_MODE", "flagship"))
    res = os.environ.get("RAYTPU_BENCH_RES", "1280x720")
    width, height = (int(x) for x in res.split("x"))
    n_frames = int(os.environ.get("RAYTPU_BENCH_FRAMES", "16"))
    bounces = int(os.environ.get("RAYTPU_BENCH_BOUNCES", "10"))
    spp = int(os.environ.get("RAYTPU_BENCH_SPP", "1"))
    band = os.environ.get("RAYTPU_BENCH_BAND")  # rays/band; 0 = one band

    from raytracer_tpu.engine.renderer import Renderer

    scene, cfg, cam, per_frame = _mode_setup(mode, width, height, bounces)
    if spp != 1 or band is not None:
        import dataclasses
        repl = {"samples_per_pixel": spp}
        if band is not None:
            repl["band_rays"] = int(band)
        cfg = dataclasses.replace(cfg, **repl)
    renderer = Renderer(cfg)

    if per_frame == "rebuild":
        builder, instances = scene
        scene = builder.build(instances)

    frame_no = [0]

    def frame(accum):
        if per_frame == "camera":
            # Per-frame UBO update: nudge the camera like a held key
            # (reference step constants live in Camera.move).
            cam.set_origin(cam.origin + np.array([0, 0, -0.1], np.float64))
        if per_frame == "rebuild":
            # Live-edit model: one instance is being dragged, so every
            # frame rebuilds with CHANGED parameters. (Identical inputs
            # would be memoized by the axon tunnel and measure
            # render-only — CLAUDE.md benchmark rule.)
            import dataclasses as _dc

            frame_no[0] += 1
            drag = list(instances)
            drag[-1] = _dc.replace(
                drag[-1],
                position=(drag[-1].position[0] + 0.05 * frame_no[0],
                          drag[-1].position[1], drag[-1].position[2]))
            s = builder.build(drag)
        else:
            s = scene
        return renderer.render(s, cam.uniforms(), accum)

    # Warm up / compile.
    accum, img, _ = frame(None)
    np.asarray(img)

    # Timed: N frames chained through the accumulation buffer (true
    # sequential dependency), one readback at the end. Per-frame stats are
    # device scalars collected during the loop and read after the clock
    # stops (progressive RNG varies the segment count frame to frame).
    from raytracer_tpu.utils.profiler import device_trace

    # RAYTPU_BENCH_CHAIN=k (static modes only): render k progressive
    # frames per dispatch via lax.scan (engine/renderer.render_chain) —
    # amortizes per-dispatch host/tunnel overhead, the dominant cost on
    # small fixed-light frames. c12_cube defaults to chaining: the r4c
    # sweep measured 131.7 (unchained) -> 158.1 (k=16) -> 181.6 FPS
    # (k=32, 1.51x baseline); deep modes are kernel-bound and chain ~0.
    default_chain = "16" if mode == "c12_cube" else "1"
    chain = int(os.environ.get("RAYTPU_BENCH_CHAIN", default_chain))
    if n_frames % chain:
        chain = 1
    if chain > 1 and per_frame is None:
        assert n_frames % chain == 0, "frames must divide by the chain"
        # Warm the chained executable too.
        accum2, img, _ = renderer.render_chain(scene, cam.uniforms(),
                                               renderer.new_accumulator(),
                                               chain)
        np.asarray(img)

    frame_stats = []
    t0 = time.perf_counter()
    # RAYTPU_TRACE_DIR=<dir> wraps the timed loop in a jax.profiler trace.
    with device_trace(os.environ.get("RAYTPU_TRACE_DIR")):
        if chain > 1 and per_frame is None:
            for _ in range(n_frames // chain):
                accum, img, stats = renderer.render_chain(scene,
                                                          cam.uniforms(),
                                                          accum, chain)
                for _k in range(chain):
                    cam.increment_frame_count()
                frame_stats.append(stats)  # rays_traced is per-frame mean
        else:
            for _ in range(n_frames):
                cam.increment_frame_count()
                accum, img, stats = frame(accum)
                frame_stats.append(stats)
        np.asarray(img)  # force
    dt = (time.perf_counter() - t0) / n_frames

    rays_per_frame = float(np.mean(
        [float(s["rays_traced"]) for s in frame_stats]))
    primaries_per_frame = cfg.width * cfg.height * cfg.samples_per_pixel

    mrays = rays_per_frame / dt / 1e6
    primary_mrays = primaries_per_frame / dt / 1e6
    fps = 1.0 / dt
    baseline_fps = 40.0          # reference claim at 1280x720 (README.md:42)
    baseline_primary_mrays = 36.9  # = 1280*720*40

    print(json.dumps({
        "metric": "Mrays/sec/chip",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        # Honest apples-to-apples: FPS ratio vs the reference's 40 FPS
        # claim (identical to primary_mrays / 36.9 at 1280x720).
        "vs_baseline": round(fps / baseline_fps, 4)
        if (cfg.width, cfg.height) == (1280, 720)
        else round(primary_mrays / baseline_primary_mrays, 4),
        "primary_mrays": round(primary_mrays, 3),
        "fps": round(fps, 3),
        "mode": mode,
        "resolution": f"{cfg.width}x{cfg.height}",
        "scene_triangles": int(np.asarray(scene.num_triangles)),
        "max_bounces": cfg.max_bounces,
        "spp": cfg.samples_per_pixel,
        "frames_timed": n_frames,
    }))


if __name__ == "__main__":
    sys.exit(main())
