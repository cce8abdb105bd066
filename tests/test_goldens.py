"""Golden-image regression tests.

The reference's visual QA is a gallery of golden screenshots
(render_images/, GALLERY.md). Here tiny deterministic renders (fixed
scene, reference RNG mode, frame 0) are checked against committed PNGs.
Regenerate with: python -m tests.test_goldens regen
"""

import os

import numpy as np
import pytest

from raytracer_tpu.core.camera import Camera
from raytracer_tpu.core.types import RenderConfig
from raytracer_tpu.engine.renderer import Renderer
from raytracer_tpu.scene.builder import build_fast_scene_from_arrays
from raytracer_tpu.utils import assets
from raytracer_tpu.utils.png import read_png, write_png

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
W, H = 48, 32


def _scene(kind):
    plane = (assets.make_ground_plane() * np.array([150, 1, 150], np.float32)
             + np.array([0, -10, 0], np.float32))
    cube = assets.make_cube() * 4.0 + np.array([0, -6, 0], np.float32)
    sphere = assets.make_icosphere(2, 3.0) + np.array([6, -3, 2], np.float32)
    verts = np.concatenate([plane, cube, sphere])
    mats = np.zeros((verts.shape[0], 4), np.float32)
    mats[:2, 0:3] = (0.5, 0.5, 0.5)
    mats[2:14, 0:3] = (1.0, 0.2, 0.2)
    mats[14:, 0:3] = (0.7, 0.7, 0.2)
    if kind == "metal":
        mats[14:, 3] = 1.0
        mats[2:14, 3] = 2.0
    elif kind == "emissive":
        mats[2:14, 0:3] = (4.0, 4.0, 4.0)
        mats[2:14, 3] = 3.0
    return build_fast_scene_from_arrays(verts, mats)


CASES = {
    "matte_sky": dict(kind="matte", sky=True),
    "metal_fuzzy": dict(kind="metal", sky=True),
    "emissive_dark": dict(kind="emissive", sky=False),
}


def _render(kind, sky):
    cfg = RenderConfig(width=W, height=H, rng_mode="reference")
    cam = Camera(origin=(-10.0, 6.0, 30.0), look_at=(0.0, -6.0, 0.0),
                 vfov_deg=40.0, aspect_ratio=W / H)
    r = Renderer(cfg)
    _, img, _ = r.render(_scene(kind), cam.uniforms(sky_enabled=sky))
    return np.asarray(img)


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.png")
    if not os.path.exists(path):
        pytest.skip(f"golden {name} not generated yet")
    got = _render(**CASES[name])
    want = read_png(path)
    # Bit-exact on the platform that generated them; allow 2/255 per
    # channel for cross-platform float drift, and no more than 1% of
    # pixels off by more.
    diff = np.abs(got.astype(int) - want.astype(int))
    assert (diff <= 2).mean() > 0.99, f"{name}: max diff {diff.max()}"


def regen():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, kw in CASES.items():
        img = _render(**kw)
        write_png(os.path.join(GOLDEN_DIR, f"{name}.png"), img)
        print("wrote", name, img.shape, "mean", img.mean().round(1))


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        regen()
