"""Benchmark: Mrays/s + FPS on the ~50k-triangle flagship scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Baseline: the reference sustains ~40 FPS at 1280x720 on "complex scenes"
(README.md:42 on Intel Iris Xe) = 36.9 M primary rays/s lower bound
(BASELINE.md). We report total traced ray *segments* per second (primaries
+ bounces, from kernel stats) and FPS at the same resolution.

Env knobs: RAYTPU_BENCH_RES=WxH, RAYTPU_BENCH_FRAMES=N,
RAYTPU_BENCH_BOUNCES=N.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    res = os.environ.get("RAYTPU_BENCH_RES", "1280x720")
    width, height = (int(x) for x in res.split("x"))
    n_frames = int(os.environ.get("RAYTPU_BENCH_FRAMES", "4"))
    bounces = int(os.environ.get("RAYTPU_BENCH_BOUNCES", "10"))

    from __graft_entry__ import _flagship_scene
    from raytracer_tpu.core.camera import default_camera
    from raytracer_tpu.core.types import RenderConfig
    from raytracer_tpu.engine.renderer import Renderer

    scene = _flagship_scene()
    cfg = RenderConfig(width=width, height=height, max_bounces=bounces,
                       kernel="packet")
    renderer = Renderer(cfg)
    cam = default_camera(width, height)

    # Warm up / compile.
    accum, img, stats = renderer.render(scene, cam.uniforms())
    rays_per_frame = float(stats["rays_traced"])

    # Timed: N frames chained through the accumulation buffer (true
    # sequential dependency), one readback at the end.
    t0 = time.perf_counter()
    for _ in range(n_frames):
        cam.increment_frame_count()
        accum, img, stats = renderer.render(scene, cam.uniforms(), accum)
    np.asarray(img)  # force
    dt = (time.perf_counter() - t0) / n_frames

    mrays = rays_per_frame / dt / 1e6
    fps = 1.0 / dt
    baseline_mrays = 36.9  # reference primary-ray rate at its 40 FPS claim

    print(json.dumps({
        "metric": "Mrays/sec/chip",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / baseline_mrays, 4),
        "fps": round(fps, 3),
        "resolution": f"{width}x{height}",
        "scene_triangles": int(np.asarray(scene.num_triangles)),
        "max_bounces": bounces,
        "frames_timed": n_frames,
    }))


if __name__ == "__main__":
    sys.exit(main())
