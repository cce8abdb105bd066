"""raytracer_tpu — a TPU-native real-time ray tracer / path tracer.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
``this-Demir/3D-Ray-Tracer-Vulkan`` (a Java/LWJGL + Vulkan-compute + GLSL
renderer): .obj scene loading, instance transforms, CPU-built flattened BVH,
a multi-bounce path-tracing kernel (Lambertian / Metal / Fuzzy Metal /
Emissive + sky), progressive accumulation, exposure control, an interactive
editor loop, and a headless renderer.

Architecture is TPU-first, not a translation:

* The GLSL megakernel's per-thread BVH stack (reference
  ``shaders/compute_dynamic_ray.comp:185-210``) becomes a *stackless*
  skip-link traversal vectorized over every ray at once — pre-order DFS
  node layout means "AABB hit -> next node is i+1; miss -> node_skip[i]".
* The Vulkan descriptor-set SSBOs (reference ``engine/VulkanEngine.java``)
  become a structure-of-arrays scene pytree resident in HBM, padded to
  bucketed capacities so scene edits never recompile.
* The render loop is one jitted step; host<->device traffic is one camera
  pytree in and one u8 frame out, replacing UBO writes + staging readback.
* Multi-chip scaling shards the pixel grid over a ``jax.sharding.Mesh``
  (the reference is single-GPU; see ``raytracer_tpu.parallel``).
"""

__version__ = "0.1.0"

from raytracer_tpu.core.types import (  # noqa: F401
    CameraUniforms,
    FlatBVH,
    GpuScene,
    RenderConfig,
)
from raytracer_tpu.core.camera import Camera  # noqa: F401
from raytracer_tpu.scene.scene import ModelInstance, Scene  # noqa: F401
