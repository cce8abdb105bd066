"""Core data types: the device-side scene layout and render configuration.

These are the TPU-native equivalents of the reference's GPU buffer layouts:

* ``FlatBVH``    <- the 48-byte ``LinearBVHNode`` SSBO (reference
  ``bvh/BVHFlattener.java:19,61-87``), re-laid-out as structure-of-arrays
  plus a precomputed *skip link* per node enabling stackless traversal.
* ``GpuScene``   <- the three SSBOs uploaded by ``VulkanEngine.internalSwapScene``
  (reference ``engine/VulkanEngine.java:318-373``): vertex buffer (3 x vec4 per
  triangle), material buffer (vec4 rgb+type per triangle), BVH buffer.
* ``CameraUniforms`` <- the full 80-byte camera UBO surface the host writes
  (reference ``engine/VulkanEngine.java:771-793,378-396``): 4 viewport vec3s
  + frame_count + sky_enabled, extended with the exposure control the
  reference UI exposes but never implemented (``VulkanApp.java:428-452``).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

Array = Any  # jax or numpy array


def _register(cls):
    """Register a dataclass as a JAX pytree (all fields are leaves)."""
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_pytree_with_keys(
        cls,
        lambda obj: (
            [(jax.tree_util.GetAttrKey(n), getattr(obj, n)) for n in fields],
            None,
        ),
        lambda _, leaves: cls(*leaves),
    )
    return cls


@_register
@dataclasses.dataclass
class FlatBVH:
    """Flattened BVH in pre-order DFS layout, structure-of-arrays.

    Encoding parity with the reference node (``bvh/BVHFlattener.java:73-86``):
    internal node: ``data`` = left child index (== own index + 1 in pre-order),
    ``count`` = right child index; leaf: ``data`` = -(tri_index+1),
    ``count`` = -1.

    TPU addition: ``skip[i]`` = index of the next pre-order node *outside*
    node i's subtree (``num_nodes`` sentinel at the end). Traversal becomes
    a stackless loop: AABB hit & internal -> ``i+1``; otherwise ``skip[i]``.
    Visit order is identical to the reference's push-right-pop-left stack,
    so closest-t pruning behaves identically.
    """

    node_min: Array   # f32[M, 3]
    node_max: Array   # f32[M, 3]
    node_tri: Array   # i32[M]  triangle index for leaves, -1 for internal
    node_skip: Array  # i32[M]  pre-order escape link; == M sentinel past end
    # Reference-compatible encoding, kept for parity checks / interop.
    node_data: Array   # i32[M]
    node_count: Array  # i32[M]

    @property
    def num_nodes(self) -> int:
        return self.node_min.shape[0]


@_register
@dataclasses.dataclass
class GpuScene:
    """Device-resident scene: triangles in BVH-flattened order + materials.

    ``tri_verts[t]`` = (v0, v1, v2) like the reference vertex SSBO
    (``renderer/SceneBuilder.java:92-107``); ``materials[t]`` = (r, g, b, type)
    with type 0=Lambertian, 1=Metal, 2=Fuzzy Metal, 3=Emissive
    (``VulkanApp.java:483-488``).

    Arrays may be padded past ``num_triangles`` / ``num_nodes`` to bucketed
    capacities (the anti-recompile analogue of the reference's dummy buffer,
    ``VulkanEngine.java:362-364,799-809``); padding nodes are unreachable
    from the root and padding triangles are degenerate.
    """

    bvh: FlatBVH
    tri_verts: Array      # f32[Tpad, 3, 3]
    materials: Array      # f32[Tpad, 4]
    num_triangles: Array  # i32 scalar (actual count, <= Tpad)
    num_nodes: Array      # i32 scalar (actual count, <= Mpad)

    @property
    def capacity(self) -> int:
        return self.tri_verts.shape[0]


@_register
@dataclasses.dataclass
class CameraUniforms:
    """Everything the host sends the kernel per frame (the UBO surface)."""

    origin: Array             # f32[3]
    lower_left_corner: Array  # f32[3]
    horizontal: Array         # f32[3]
    vertical: Array           # f32[3]
    frame_count: Array        # i32 scalar — accumulation counter
    sky_enabled: Array        # i32 scalar — 1: gradient sky, 0: black
    exposure: Array           # f32 scalar — stops, applied as 2**exposure

    @staticmethod
    def create(origin, lower_left_corner, horizontal, vertical,
               frame_count=0, sky_enabled=True, exposure=0.0) -> "CameraUniforms":
        f32 = lambda v: jnp.asarray(v, jnp.float32)
        uni = CameraUniforms(
            origin=f32(origin),
            lower_left_corner=f32(lower_left_corner),
            horizontal=f32(horizontal),
            vertical=f32(vertical),
            frame_count=jnp.asarray(frame_count, jnp.int32),
            sky_enabled=jnp.asarray(1 if sky_enabled else 0, jnp.int32),
            exposure=f32(exposure),
        )
        if isinstance(frame_count, (int,)):
            # Host mirror for the render loop (see Camera.uniforms) —
            # a plain attribute, invisible to the pytree registry.
            uni.fc_host = frame_count
        return uni


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static (compile-time) render settings.

    Mirrors the reference's hardcoded knobs as real configuration
    (``VulkanEngine.java:45-46`` 1280x720, ``compute_dynamic_ray.comp:44``
    MAX_BOUNCES=10, ``:146`` fuzz=0.3, ``:42-43`` T_MIN/T_MAX) — the working
    version of the dead ``Config.java`` idea.
    """

    width: int = 1280
    height: int = 720
    max_bounces: int = 10
    t_min: float = 1e-3
    t_max: float = 1e4
    fuzz: float = 0.3
    det_eps: float = 1e-5
    # "reference": RNG seed = pixel index, bit-faithful to
    # compute_dynamic_ray.comp:164 (every frame identical — the reference
    # bug). "progressive": seed also mixes frame_count so accumulation
    # actually denoises (the intended behaviour, survey discrepancy #1).
    rng_mode: str = "progressive"
    # Samples per pixel per step (reference dispatches 1; >1 amortizes
    # traversal setup and feeds the accumulator faster).
    samples_per_pixel: int = 1
    # True (intended behaviour): Emissive terminates the path emitting its
    # albedo. False: bit-parity with the shipped kernel, which absorbs
    # unknown material types to black (compute_dynamic_ray.comp:153).
    emissive_emits: bool = True
    # "packet": tile-based fast path (kernels/packet.py, needs a FastScene,
    # resolution divisible by 8). "wavefront": per-ray reference-faithful
    # path (kernels/tracer.py, needs a GpuScene).
    kernel: str = "packet"
    # "path": the shipped multi-bounce path tracer (C14/C15 tier).
    # "fixed_light": the C12 tier (shaders/compute.comp:196-204) — one
    # unjittered primary ray, fixed light dir normalize(1,1,1), intensity
    # max(0, n·l)*0.8 + 0.2, black background, raw (unflipped) geometric
    # normals.
    shading: str = "path"
    # Frames render as horizontal bands of at most ~this many rays via one
    # lax.scan (bounded peak memory; band shapes stay in the
    # backend-validated zone). Bigger bands amortize the per-band
    # wavefront round costs; 414720 puts 720p at 3 bands of 307200 rays
    # (measured fastest; single-band 921600 also works but is ~1.5%
    # slower) and 1080p at 5 bands of 414720 (r3c sweep: 3.36 vs 2.52 FPS
    # over 9 bands of 230400). 0 disables banding.
    band_rays: int = 414720
    # Fuse accumulate+exposure+gamma+u8 as a Pallas kernel (interpret mode
    # off-TPU). Plain XLA ops otherwise.
    pallas_tonemap: bool = False

    def __post_init__(self):
        if self.rng_mode not in ("reference", "progressive"):
            raise ValueError(f"bad rng_mode: {self.rng_mode}")
        if self.kernel not in ("packet", "wavefront"):
            raise ValueError(f"bad kernel: {self.kernel}")
        if self.shading not in ("path", "fixed_light"):
            raise ValueError(f"bad shading: {self.shading}")
        if self.width <= 0 or self.height <= 0:
            raise ValueError("resolution must be positive")
        if self.max_bounces < 1:
            raise ValueError("max_bounces must be >= 1")


# Material type codes (reference VulkanApp.java:483-488).
MAT_LAMBERTIAN = 0.0
MAT_METAL = 1.0
MAT_METAL_FUZZY = 2.0
MAT_EMISSIVE = 3.0
