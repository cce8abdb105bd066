"""End-to-end frame benchmark on the real TPU (SoA + banded renderer)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np

from raytracer_tpu.core.camera import default_camera
from raytracer_tpu.core.types import RenderConfig
from raytracer_tpu.engine.renderer import Renderer
from raytracer_tpu.scene.builder import build_fast_scene_from_arrays
from raytracer_tpu.utils import assets

import jax

print(jax.devices(), flush=True)

tris = assets.make_terrain(n=158)
mats = np.zeros((tris.shape[0], 4), np.float32)
mats[:, 0:3] = (0.55, 0.5, 0.45)
scene = build_fast_scene_from_arrays(tris, mats)
print("scene on device: 49k tris", flush=True)

for W, H in [(320, 176), (640, 360), (1280, 720)]:
    cfg = RenderConfig(width=W, height=H, kernel="packet")
    r = Renderer(cfg)
    cam = default_camera(W, H)
    t0 = time.perf_counter()
    accum, img, stats = r.render(scene, cam.uniforms())
    rays = float(stats["rays_traced"])
    print(f"{W}x{H}: first frame {time.perf_counter()-t0:.1f}s "
          f"rays={rays:.3g}", flush=True)
    n = 6
    t0 = time.perf_counter()
    for i in range(n):
        cam.increment_frame_count()
        accum, img, stats = r.render(scene, cam.uniforms(), accum)
    _ = np.asarray(img)
    dt = (time.perf_counter() - t0) / n
    print(f"{W}x{H}: {dt*1e3:.0f} ms/frame -> {1/dt:.2f} FPS, "
          f"{rays/dt/1e6:.2f} Mray-seg/s", flush=True)
print("DONE", flush=True)
