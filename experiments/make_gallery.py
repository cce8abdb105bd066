"""Render the 5 BASELINE preset scenes to render_images/ + GALLERY.md."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import time

import numpy as np

from raytracer_tpu.engine.renderer import Renderer
from raytracer_tpu.scene.builder import build_fast_scene
from raytracer_tpu.scene.presets import ALL_PRESETS
from raytracer_tpu.utils.png import write_png

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "render_images")
os.makedirs(OUT, exist_ok=True)

W, H = 848, 480
FRAMES = int(os.environ.get("GALLERY_FRAMES", "24"))

# Side-by-side mapping to the reference's golden renders
# (/root/reference/render_images/, GALLERY.md): our preset -> its golden.
REF_MAP = {
    "cube_plane": "pre-steps (first compute.comp cube renders)",
    "sphere_light": "pre-steps (emissive-sun experiments)",
    "moon_emissive": "pre-steps (Moon scene)",
    "two_humans": "two-humans.png (2x FinalBaseMesh, same asset)",
    "car_showcase": "car-render-ss.png / car-with-human.png (car.obj is "
                    "gitignored upstream; white_mesh + terrain stand in)",
}

rows = []
for name, factory in ALL_PRESETS.items():
    preset = factory(width=W, height=H)
    scene = build_fast_scene(preset.scene.create_snapshot())
    cfg = dataclasses.replace(preset.config, width=W, height=H)
    r = Renderer(cfg)
    cam = preset.camera
    accum = None
    t0 = time.perf_counter()
    for f in range(FRAMES):
        cam.frame_count = f
        accum, img, stats = r.render(
            scene, cam.uniforms(sky_enabled=preset.sky_enabled,
                                exposure=preset.exposure), accum)
    pixels = np.asarray(img)
    dt = time.perf_counter() - t0
    fname = f"{name}.png"
    write_png(os.path.join(OUT, fname), pixels)
    tris = int(np.asarray(scene.num_triangles))
    rows.append((name, fname, tris, FRAMES, dt))
    print(f"{name}: {tris} tris, {FRAMES} frames in {dt:.1f}s", flush=True)

with open(os.path.join(os.path.dirname(OUT), "GALLERY.md"), "w") as f:
    f.write("# Gallery — the 5 BASELINE benchmark scenes\n\n"
            f"Rendered by the packet tracer at {W}x{H}, {FRAMES} "
            "accumulated frames each (progressive RNG).\n\n"
            "The reference ships 15 golden renders "
            "(`render_images/` + `GALLERY.md` upstream); each scene "
            "below notes the golden it corresponds to. Differences by "
            "design: progressive accumulation actually averages (the "
            "shipped reference kernel re-renders the identical sample "
            "every frame), Emissive emits, and exposure works — so our "
            "renders are less noisy and lit scenes are brighter than "
            "the goldens.\n\n")
    for name, fname, tris, frames, dt in rows:
        ref = REF_MAP.get(name, "-")
        f.write(f"## {name}\n\n{tris:,} triangles — {frames} frames in "
                f"{dt:.1f}s — reference golden: {ref}\n\n"
                f"![{name}](render_images/{fname})\n\n")
print("DONE", flush=True)
