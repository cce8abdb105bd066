"""Thin-leaf (RAYTPU_CLUSTER=2/4) parity vs the default CLUSTER_SIZE=8.

ADVICE r3 (medium): the subcluster indexing in core/fast_types.py
(SUB_SHIFT/SUB_MASK, shared 128-float table rows) is dead code at the
default CLUSTER_SIZE=8 — a regression in the thin-leaf path would pass the
whole CPU suite. CLUSTER_SIZE is read at module import, so each size runs
in a fresh subprocess; images must match the T=8 render exactly (same
closest hits, same RNG stream — only the tree shape differs, and matte
shading depends on hit point/normal, not leaf layout).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("JAX_PLATFORM_NAME", None)
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from raytracer_tpu.core.camera import Camera
from raytracer_tpu.core.types import RenderConfig
from raytracer_tpu.kernels.packet import render_linear_fast
from raytracer_tpu.scene.builder import build_fast_scene_from_arrays
from raytracer_tpu.utils import assets

tris = assets.make_terrain(n=12)  # a few hundred tris -> many leaves
mats = np.zeros((tris.shape[0], 4), np.float32)
mats[:, 0:3] = 0.6
mats[1::3, 3] = 1.0  # some metal for a second material path
scene = build_fast_scene_from_arrays(tris, mats)
cfg = RenderConfig(width=32, height=24, max_bounces=3,
                   rng_mode="reference")
cam = Camera(origin=(0.0, 30.0, 80.0), look_at=(0.0, 0.0, 0.0),
             vfov_deg=40.0, aspect_ratio=32 / 24)
img, _ = render_linear_fast(scene, cam.uniforms(), cfg)
np.save(sys.argv[1], np.asarray(img))
"""


def _render_with(extra_env: dict, out_path: str) -> None:
    env = dict(os.environ)
    env.update(extra_env)
    env.pop("RAYTPU_TRAVERSE", None)
    res = subprocess.run(
        [sys.executable, "-c", _CHILD, out_path], env=env, cwd=_REPO,
        capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, (
        f"render failed ({extra_env}):\n{res.stdout}\n{res.stderr}")


@pytest.mark.parametrize("cluster", [2, 4])
def test_thin_cluster_matches_default(cluster, tmp_path):
    ref_path = str(tmp_path / "t8.npy")
    got_path = str(tmp_path / f"t{cluster}.npy")
    _render_with({"RAYTPU_CLUSTER": "8"}, ref_path)
    _render_with({"RAYTPU_CLUSTER": str(cluster)}, got_path)
    ref = np.load(ref_path)
    got = np.load(got_path)
    assert ref.max() > 0  # scene actually visible
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_wide16_matches_default(tmp_path):
    """RAYTPU_WIDE=16 (BVH16, two table rows per node) must render the
    same image as the 8-wide default — traversal order differs, closest
    hits do not. Like CLUSTER, WIDE is read at import, hence the
    subprocess."""
    ref_path = str(tmp_path / "w8.npy")
    got_path = str(tmp_path / "w16.npy")
    _render_with({"RAYTPU_WIDE": "8"}, ref_path)
    _render_with({"RAYTPU_WIDE": "16"}, got_path)
    ref = np.load(ref_path)
    got = np.load(got_path)
    assert ref.max() > 0
    np.testing.assert_allclose(got, ref, atol=2e-5)
