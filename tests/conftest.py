"""Test config: run everything on an 8-virtual-device CPU backend.

Must run before the first `import jax` anywhere — the analogue of testing
multi-GPU code without a cluster: shardings compile and execute against
XLA's host platform with a forced device count.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env may preset a TPU
os.environ.pop("JAX_PLATFORM_NAME", None)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; the config knob wins.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_scene():
    """Cube on a ground plane, matte grey + red — the minimum end-to-end
    scene (14 triangles, BASELINE.json config #1 class)."""
    from raytracer_tpu.scene.builder import build_gpu_scene_from_arrays
    from raytracer_tpu.utils import assets

    cube = assets.make_cube() * 4.0  # scale up
    cube += np.array([0.0, -6.0, 0.0], np.float32)
    plane = assets.make_ground_plane() * np.array([150.0, 1.0, 150.0],
                                                  np.float32)
    plane += np.array([0.0, -10.0, 0.0], np.float32)

    verts = np.concatenate([plane, cube])
    mats = np.zeros((verts.shape[0], 4), np.float32)
    mats[:2, 0:3] = (0.5, 0.5, 0.5)   # grey matte plane
    mats[2:, 0:3] = (1.0, 0.2, 0.2)   # red matte cube
    return build_gpu_scene_from_arrays(verts, mats)


@pytest.fixture(scope="session")
def tiny_camera():
    from raytracer_tpu.core.camera import Camera

    return Camera(origin=(-25.0, 30.0, 140.0), look_at=(0.0, 0.0, 0.0),
                  vfov_deg=20.0, aspect_ratio=32.0 / 24.0)
