"""exp31: two_humans decomposition — rebuild cost vs LBVH tree quality.

two_humans (97.8k tris, on-device LBVH rebuild per frame) ran 3.98 FPS in
the r3 sweep vs the 4.5 FPS VERDICT target. Two candidate sinks:
  (a) the per-frame on-device rebuild itself (Morton + Karras + wide emit),
  (b) the LBVH tree being lower quality than the host SAH tree, inflating
      every traversal round.

Measured here on the real TPU, same scene and camera (16 chained frames,
forced readback — bench.py methodology):
  1. rebuild+render  (what the bench does)
  2. render-only, device LBVH tree  (build once, reuse)
  3. render-only, host SAH tree     (the flagship path's builder)

(1)-(2) = rebuild cost per frame; (2)/(3) = tree-quality factor.

Run from the repo root: python experiments/exp31_lbvh_quality.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from raytracer_tpu.core.camera import default_camera
    from raytracer_tpu.core.types import RenderConfig
    from raytracer_tpu.engine.renderer import Renderer
    from raytracer_tpu.scene.builder import build_fast_scene
    from raytracer_tpu.scene.device_builder import DeviceSceneBuilder
    from raytracer_tpu.scene.scene import ModelInstance
    from raytracer_tpu.utils.assets import asset_path

    path = asset_path("FinalBaseMesh.obj")
    instances = [
        ModelInstance(model_path=path, display_name="human_a",
                      position=(-8.0, -10.0, 0.0), scale=(2.0,) * 3,
                      color=(0.7, 0.6, 0.5), material_type=0.0),
        ModelInstance(model_path=path, display_name="human_b",
                      position=(8.0, -10.0, 0.0), scale=(2.0,) * 3,
                      color=(0.5, 0.6, 0.7), material_type=0.0),
    ]
    w, h = 1280, 720
    cfg = RenderConfig(width=w, height=h, max_bounces=10, kernel="packet")
    cam = default_camera(w, h)
    renderer = Renderer(cfg)
    builder = DeviceSceneBuilder()

    n = int(os.environ.get("RAYTPU_EXP31_FRAMES", "12"))

    def run(label, frame_fn):
        accum, img, _ = frame_fn(None)
        np.asarray(img)  # compile + settle
        t0 = time.perf_counter()
        accum2 = accum
        for _ in range(n):
            cam.increment_frame_count()
            accum2, img, stats = frame_fn(accum2)
        np.asarray(img)
        dt = (time.perf_counter() - t0) / n
        print(f"{label:34s} {1.0/dt:6.2f} FPS  ({dt*1e3:7.1f} ms/frame)",
              flush=True)
        return dt

    scene_lbvh = builder.build(instances)
    scene_sah = build_fast_scene(instances)

    def f_rebuild(accum):
        s = builder.build(instances)
        return renderer.render(s, cam.uniforms(), accum)

    def f_lbvh(accum):
        return renderer.render(scene_lbvh, cam.uniforms(), accum)

    def f_sah(accum):
        return renderer.render(scene_sah, cam.uniforms(), accum)

    d1 = run("rebuild + render (bench path)", f_rebuild)
    d2 = run("render only, LBVH tree", f_lbvh)
    d3 = run("render only, host SAH tree", f_sah)
    print(f"rebuild cost/frame: {(d1 - d2) * 1e3:.1f} ms; "
          f"tree-quality factor (LBVH/SAH): {d2 / d3:.2f}x", flush=True)


if __name__ == "__main__":
    main()
