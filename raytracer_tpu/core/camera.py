"""Pinhole camera with viewport-vector derivation and accumulation counter.

Host-side double precision math, emitted as f32 uniforms — same split as the
reference (``scene/Camera.java:44-68`` doubles -> ``VulkanEngine.java:378-396``
f32 UBO). Default pose matches ``VulkanApp.java:132-138``:
origin(-25,30,140), lookAt(0,0,0), vUp(0,1,0), vfov 20 deg, aspect 1280/720.
"""

from __future__ import annotations

import math

import numpy as np

from raytracer_tpu.core.types import CameraUniforms

# WASD/QE step vectors (reference VulkanApp.java:756-769 — deliberately
# asymmetric constants).
KEY_STEPS = {
    "W": (0.0, 0.0, -6.5),
    "S": (0.0, 0.0, 15.0),
    "A": (-5.5, 0.0, 0.0),
    "D": (5.5, 0.0, 0.0),
    "Q": (0.0, 3.5, 0.0),
    "E": (0.0, -3.5, 0.0),
}


def _unit(v: np.ndarray) -> np.ndarray:
    return v / np.linalg.norm(v)


class Camera:
    """Mutable host-side camera state (single-writer: the UI/app thread)."""

    def __init__(self, origin, look_at, v_up=(0.0, 1.0, 0.0),
                 vfov_deg: float = 20.0, aspect_ratio: float = 1280.0 / 720.0):
        self.origin = np.asarray(origin, np.float64)
        self.look_at = np.asarray(look_at, np.float64)
        self.v_up = np.asarray(v_up, np.float64)
        self.vfov_deg = float(vfov_deg)
        self.aspect_ratio = float(aspect_ratio)
        self.frame_count = 0
        # uniforms() transfer cache — see the method docstring.
        self._pose_version = 0
        self._uni_cache_key = None
        self._uni_cache = None
        self._fc_pool: dict = {}
        self._recalculate_viewport()

    def _recalculate_viewport(self) -> None:
        self._pose_version += 1
        # Reference scene/Camera.java:44-68 formulas, verbatim semantics.
        theta = math.radians(self.vfov_deg)
        h = math.tan(theta / 2.0)
        viewport_height = 2.0 * h
        viewport_width = self.aspect_ratio * viewport_height

        w = _unit(self.origin - self.look_at)
        u = _unit(np.cross(self.v_up, w))
        v = np.cross(w, u)

        self.horizontal = u * viewport_width
        self.vertical = v * viewport_height
        self.lower_left_corner = (
            self.origin - self.horizontal / 2.0 - self.vertical / 2.0 - w
        )

    # --- movement / events -------------------------------------------------

    def set_origin(self, origin) -> None:
        self.origin = np.asarray(origin, np.float64)
        self._recalculate_viewport()

    def set_look_at(self, look_at) -> None:
        self.look_at = np.asarray(look_at, np.float64)
        self._recalculate_viewport()

    def move(self, key: str) -> None:
        """Apply one WASD/QE step and reset accumulation (an 'event',
        reference VulkanApp.java:735-752)."""
        step = KEY_STEPS[key.upper()]
        self.set_origin(self.origin + np.asarray(step))
        self.reset_accumulation()

    # --- accumulation (reference scene/Camera.java:99-118) -----------------

    def reset_accumulation(self) -> None:
        self.frame_count = 0

    def increment_frame_count(self) -> None:
        self.frame_count += 1

    # --- uniforms -----------------------------------------------------------

    def uniforms(self, sky_enabled: bool = True,
                 exposure: float = 0.0) -> CameraUniforms:
        """Per-frame UBO pytree, transfer-minimized.

        Building fresh jnp arrays every frame costs one tunnel RPC per
        leaf per dispatch (~4.5 ms/frame at 720p — exp24). While the pose
        is unchanged, the six pose/flag leaves are served from a cache of
        device-resident arrays (zero transfers), and the accumulation
        counter for frame N+1 is device_put asynchronously while frame N
        renders, so the only per-frame transfer is already on-chip by
        dispatch time.
        """
        import dataclasses

        import jax.numpy as jnp

        key = (self._pose_version, bool(sky_enabled), float(exposure))
        if self._uni_cache_key != key:
            self._uni_cache = CameraUniforms.create(
                origin=self.origin,
                lower_left_corner=self.lower_left_corner,
                horizontal=self.horizontal,
                vertical=self.vertical,
                frame_count=0,
                sky_enabled=sky_enabled,
                exposure=exposure,
            )
            self._uni_cache_key = key
        fc = self.frame_count
        pool = self._fc_pool
        fcd = pool.get(fc)
        if fcd is None:
            fcd = jnp.asarray(fc, jnp.int32)
        # Prefetch the likely next counter; keep the pool at two entries.
        nxt = pool.get(fc + 1)
        if nxt is None:
            nxt = jnp.asarray(fc + 1, jnp.int32)
        self._fc_pool = {fc: fcd, fc + 1: nxt}
        uni = dataclasses.replace(self._uni_cache, frame_count=fcd)
        # Host mirror of the counter (NOT a pytree field): the render loop
        # reads it for ladder/pipeline decisions — reading the device
        # scalar back would cost a tunnel RTT (~37 ms) per loop iteration.
        uni.fc_host = fc
        return uni


def default_camera(width: int = 1280, height: int = 720) -> Camera:
    """The reference's startup pose (VulkanApp.java:132-138)."""
    return Camera(origin=(-25.0, 30.0, 140.0), look_at=(0.0, 0.0, 0.0),
                  v_up=(0.0, 1.0, 0.0), vfov_deg=20.0,
                  aspect_ratio=width / height)
