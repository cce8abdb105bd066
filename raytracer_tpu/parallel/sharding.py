"""Multi-chip rendering: shard_map over a (dp, sp) device mesh.

The reference is a single-GPU program; its only parallel axis is one
thread per pixel (SURVEY.md §2 parallelism table). On TPU pods the natural
scaling axes for a renderer are:

* **dp** — data parallelism over the pixel grid: each chip renders a
  horizontal band of the frame (embarrassingly parallel; rays never cross
  shards because every chip holds the whole scene, the analogue of the
  replicated SSBOs);
* **sp** — sample parallelism: chips render the *same* band with different
  sample indices and combine with a ``psum``-mean over the ICI — the only
  cross-chip collective in the pipeline.

Scene and camera are replicated; the accumulation buffer and output image
are dp-sharded. The reduction rides ICI (psum over the mesh's sp axis);
no host involvement until the final image fetch.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

try:  # jax >= 0.4.35 exposes shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from raytracer_tpu.core.types import CameraUniforms, RenderConfig
from raytracer_tpu.engine.renderer import _render_linear, tonemap
from raytracer_tpu.utils.log import get_logger

_log = get_logger("mesh")


def make_mesh(n_devices: Optional[int] = None, sp: int = 1,
              devices=None) -> Mesh:
    """Build a (dp, sp) mesh over the first n devices."""
    devices = list(devices or jax.devices())
    n = n_devices or len(devices)
    if n % sp:
        raise ValueError(f"n_devices {n} not divisible by sp {sp}")
    grid = np.asarray(devices[:n]).reshape(n // sp, sp)
    return Mesh(grid, ("dp", "sp"))


def make_sharded_render_step(cfg: RenderConfig, mesh: Mesh):
    """Compile a multi-chip render step.

    Returns step(scene, cam, accum) -> (accum', u8 image, stats), where
    accum / image are [H, W, 3] arrays dp-sharded over rows. The scene may
    be a GpuScene or FastScene matching cfg.kernel.
    """
    n_dp = mesh.shape["dp"]
    n_sp = mesh.shape["sp"]
    if cfg.height % (n_dp * 8):
        raise ValueError(
            f"height {cfg.height} must be divisible by 8*dp ({8 * n_dp})")
    shard_h = cfg.height // n_dp
    local_cfg = dataclasses.replace(cfg, height=shard_h)
    if cfg.samples_per_pixel % n_sp:
        raise ValueError("samples_per_pixel must be divisible by sp")
    spp_local = cfg.samples_per_pixel // n_sp

    def shard_fn(scene, cam: CameraUniforms, accum):
        dp_idx = jax.lax.axis_index("dp")
        sp_idx = jax.lax.axis_index("sp")

        # THE production render pipeline (band split, tail merge,
        # graveyard deposits — engine/renderer._render_linear), run on
        # this shard's row band / sample slice. One implementation for
        # single- and multi-chip.
        linear, rays = _render_linear(
            scene, cam, local_cfg,
            y_base=dp_idx * shard_h, global_height=cfg.height,
            sample_offset=sp_idx * spp_local, n_samples=spp_local)

        # The one collective: average sample shards over ICI.
        linear = jax.lax.pmean(linear, "sp")
        rays = jax.lax.psum(rays, "sp")
        rays = jax.lax.psum(rays, "dp")

        fc = cam.frame_count.astype(jnp.float32)
        new_accum = (accum * fc + linear) / (fc + 1.0)
        image = tonemap(new_accum, cam.exposure)
        stats = {"rays_traced": rays,
                 "samples": (fc + 1.0) * cfg.samples_per_pixel}
        return new_accum, image, stats

    replicated = P()
    row_sharded = P("dp", None, None)
    step = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(replicated, replicated, row_sharded),
        out_specs=(row_sharded, row_sharded,
                   {"rays_traced": replicated, "samples": replicated}),
        # check_vma=False, deliberately. The exact jax-0.9 failure with it
        # on (captured in tests/test_parallel.py::test_check_vma_still_
        # unsupported, which pins it): "while_loop body function carry
        # input and carry output must have equal types ... the input carry
        # component carry[1] has type float32[1024] but the corresponding
        # output carry component has type float32[1024]{V:(dp,sp)}" — vma
        # inference wants `jax.lax.pcast(..., to='varying')` on every
        # constant-initialized while_loop carry (first offender:
        # rng.random_vec3_in_unit_sphere's zero px/py/pz accumulators;
        # the traversal/bounce loops' zero inits cascade behind it).
        # Threading pcast/pvary through ~15 loop inits is not viable: the
        # same kernels run OUTSIDE shard_map (single-chip path), where
        # pvary's axis names are unbound. Correctness of the specs is
        # instead covered by tests/test_parallel.py's bit-identical
        # mesh-vs-single-device images across (8,1)/(4,2)/(2,4) meshes;
        # the pin test fails the day jax accepts these carries, signalling
        # this flag can be flipped.
        check_vma=False,
    )
    return jax.jit(step, donate_argnums=(2,))


def replicate_scene(scene, mesh: Mesh):
    """Place a scene pytree fully-replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(scene, sharding)


def make_accumulator(cfg: RenderConfig, mesh: Mesh):
    """dp-sharded zero accumulation buffer."""
    sharding = NamedSharding(mesh, P("dp", None, None))
    return jax.device_put(
        jnp.zeros((cfg.height, cfg.width, 3), jnp.float32), sharding)


class MeshRenderer:
    """Multi-chip analogue of engine.Renderer."""

    def __init__(self, config: RenderConfig, mesh: Optional[Mesh] = None,
                 sp: int = 1):
        self.cfg = config
        self.mesh = mesh or make_mesh(sp=sp)
        self._step = make_sharded_render_step(config, self.mesh)
        _log.info("mesh renderer: %s", dict(self.mesh.shape))

    def prepare_scene(self, scene):
        return replicate_scene(scene, self.mesh)

    def new_accumulator(self):
        return make_accumulator(self.cfg, self.mesh)

    def render(self, scene, cam: CameraUniforms, accum=None):
        if accum is None:
            accum = self.new_accumulator()
        return self._step(scene, cam, accum)
