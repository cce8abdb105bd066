"""The device runtime: one jitted render step per frame.

TPU-native replacement of the Vulkan render thread's per-frame work
(``engine/VulkanEngine.java:244-271,401-431``): where the reference records
a command buffer (barrier -> dispatch -> barrier -> image copy), submits, and
fence-waits, here the whole frame — ray-gen, traversal, shading, progressive
accumulation, exposure, gamma, u8 pack — is a single jitted function whose
intermediates never leave HBM. Host<->device traffic per frame is one small
camera pytree in and (on demand) one u8 image out; the accumulation buffer
is donated so it is updated in place.

Scene swaps are just "pass a different pytree": because scene buffers are
padded to capacity buckets (scene/builder.py), editing a scene re-uses the
compiled executable; only outgrowing a bucket recompiles.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.core.types import CameraUniforms, GpuScene, RenderConfig
from raytracer_tpu.kernels.tracer import render_linear
from raytracer_tpu.utils.log import get_logger

_log = get_logger("vrt")


def tonemap(linear: jnp.ndarray, exposure: jnp.ndarray) -> jnp.ndarray:
    """Exposure scale (2**stops) -> sqrt gamma -> u8, matching the
    reference's sqrt + rgba8-UNORM store (compute_dynamic_ray.comp:235) and
    implementing the exposure slider the reference left as a TODO
    (VulkanApp.java:428-452)."""
    scaled = linear * jnp.exp2(exposure)
    gamma = jnp.sqrt(jnp.maximum(scaled, 0.0))
    return jnp.clip(jnp.round(gamma * 255.0), 0.0, 255.0).astype(jnp.uint8)


def _num_bands(cfg: RenderConfig) -> int:
    """Largest band count that divides the row-tiles and keeps bands at or
    under cfg.band_rays rays."""
    if not cfg.band_rays:
        return 1
    row_tiles = cfg.height // 8 if cfg.height % 8 == 0 else cfg.height
    bands = 1
    for nb in range(1, row_tiles + 1):
        if row_tiles % nb:
            continue
        if (cfg.height // nb) * cfg.width <= cfg.band_rays:
            bands = nb
            break
    else:
        bands = row_tiles
    return bands


def _render_linear(scene, cam: CameraUniforms, cfg: RenderConfig, *,
                   y_base=0, global_height: Optional[int] = None,
                   sample_offset=0, n_samples: Optional[int] = None):
    """Linear radiance for a cfg-sized frame -> (linear [H,W,3], rays).

    The FULL production pipeline — band split, spp loop, cross-band
    tail merge, graveyard deposits — shared verbatim by the single-chip
    step (`_render_step`) and the multi-chip shard_map step
    (`parallel/sharding.py`), so the sharded path exercises exactly the
    code `bench.py` times (no second implementation to drift).

    ``y_base``/``global_height`` render this frame as a row band of a
    taller global frame (the dp shard axis; both may be traced values);
    ``sample_offset``/``n_samples`` render a slice of the sample budget
    (the sp shard axis). cfg keeps the GLOBAL samples_per_pixel either
    way — kernels fold it into the RNG stream (tracer.initial_seed), so
    localizing it would change seeds.
    """
    import dataclasses

    spp = n_samples if n_samples is not None else cfg.samples_per_pixel
    gh = global_height or cfg.height
    from raytracer_tpu.core.fast_types import FastScene

    if cfg.kernel == "packet" and isinstance(scene, FastScene):
        from raytracer_tpu.kernels.packet import render_linear_fast as rl
    else:
        # A GpuScene (build_gpu_scene) always renders via the per-ray
        # tracer: the packet kernels need the packed FastScene tables.
        rl = render_linear

    nb = _num_bands(cfg)
    band_h = cfg.height // nb
    band_cfg = dataclasses.replace(cfg, height=band_h)
    y_offsets = jnp.arange(nb, dtype=jnp.int32) * band_h + y_base

    tm = None
    if rl is not render_linear:
        from raytracer_tpu.kernels.packet import (tail_merge_active,
                                                  tail_merge_widths)

        if tail_merge_active(scene, cfg):
            tm = tail_merge_widths(cfg, band_h, nb)

    if tm is not None:
        # Cross-band deep-round merge: each band runs primaries + the
        # wide wavefront levels, hands off its live tail at a fixed
        # width; the tails concatenate (with per-ray bounce budgets) and
        # the deep rounds run ONCE per sample over all bands — 1/nb the
        # per-round fixed costs and a full-frame sort radius exactly
        # where bounce-ray coherence is worst. Bit-identical to the
        # unmerged path (kernels/wavefront.wavefront_tail docstring).
        handoff, merged_w = tm
        from raytracer_tpu.kernels.wavefront import wavefront_tail

        hw = cfg.height * cfg.width

        def sample_body(i, carry):
            total, rays = carry

            def render_band(_, y0):
                color, stats, surv = rl(
                    scene, cam, band_cfg, sample_index=sample_offset + i,
                    y_offset=y0, global_height=gh, tail_handoff=handoff)
                return None, (color, stats["rays_traced"],
                              surv[0], surv[1])

            _, (bands, band_rays, sfs, sis) = jax.lax.scan(
                render_band, None, y_offsets)
            sf = jnp.moveaxis(sfs, 0, 1).reshape(sfs.shape[1], -1)
            si = jnp.moveaxis(sis, 0, 1).reshape(sis.shape[1], -1)
            # Survivor pixel ids are global (handoff contract); deposits
            # target THIS frame's [hw] buffers. Shift by the frame's base
            # row — pad sentinels (gh*w) land >= hw and drop either way.
            si = si.at[1].add(-jnp.int32(y_base) * cfg.width)
            cx, cy, cz, trays = wavefront_tail(
                scene, sf, si, cam.sky_enabled > 0, cfg, out_size=hw)
            tail = jnp.stack(
                [c.reshape(cfg.height, cfg.width) for c in (cx, cy, cz)],
                axis=-1)
            total = total + bands.reshape(cfg.height, cfg.width, 3) + tail
            return total, rays + jnp.sum(band_rays) + trays

        init = (jnp.zeros((cfg.height, cfg.width, 3), jnp.float32),
                jnp.float32(0))
        total, rays = jax.lax.fori_loop(0, spp, sample_body, init)
    else:
        def render_band(_, y0):
            def sample_body(i, carry):
                total, rays = carry
                color, stats = rl(scene, cam, band_cfg,
                                  sample_index=sample_offset + i,
                                  y_offset=y0, global_height=gh)
                return total + color, rays + stats["rays_traced"]

            init = (jnp.zeros((band_h, cfg.width, 3), jnp.float32),
                    jnp.float32(0))
            total, rays = jax.lax.fori_loop(0, spp, sample_body, init)
            return None, (total, rays)

        _, (bands, band_rays) = jax.lax.scan(render_band, None, y_offsets)
        total = bands.reshape(cfg.height, cfg.width, 3)
        rays = jnp.sum(band_rays)
    return total / jnp.float32(spp), rays


def _render_step(scene, cam: CameraUniforms, accum: jnp.ndarray,
                 cfg: RenderConfig):
    """scene + camera + accumulation -> (new accum, u8 frame, stats)."""
    spp = cfg.samples_per_pixel
    linear, rays = _render_linear(scene, cam, cfg)

    # Progressive running average keyed on frame_count — the accumulation
    # the reference wired through the UBO but never implemented in the
    # shipped kernel (SURVEY.md discrepancy #1).
    fc = cam.frame_count.astype(jnp.float32)
    if cfg.pallas_tonemap:
        from raytracer_tpu.kernels.pallas_ops import tonemap_accumulate

        new_accum, image = tonemap_accumulate(accum, linear, fc,
                                              cam.exposure)
    else:
        new_accum = (accum * fc + linear) / (fc + 1.0)
        image = tonemap(new_accum, cam.exposure)
    stats = {
        "rays_traced": rays,
        "samples": (fc + 1.0) * spp,
    }
    return new_accum, image, stats


def _render_chain(scene, cam, accum, *, cfg, k):
    """k progressive frames in ONE jitted program (lax.scan over the
    frame step, frame_count advancing per step) — the XLA answer to
    per-dispatch host/tunnel overhead for throughput workloads (headless
    accumulation, benches). Intermediate tonemaps are dead code the
    compiler drops; the image is tonemapped once from the final
    accumulator. Returns (accum', image, stats) with stats averaged
    per frame so callers treat a chain like a frame."""
    import dataclasses

    def body(carry, _):
        acc, fc, rays = carry
        cam_i = dataclasses.replace(cam, frame_count=fc)
        acc2, _img, stats = _render_step(scene, cam_i, acc, cfg=cfg)
        return (acc2, fc + 1, rays + stats["rays_traced"]), None

    (accum, fc, rays), _ = jax.lax.scan(
        body, (accum, cam.frame_count, jnp.float32(0.0)), None, length=k)
    image = tonemap(accum, cam.exposure)
    stats = {
        "rays_traced": rays / k,
        "samples": fc.astype(jnp.float32) * cfg.samples_per_pixel,
    }
    return accum, image, stats


def _knob_fingerprint():
    """Trace-time env knobs (RAYTPU_*) as a hashable cache-key component.

    Kernel choices (RAYTPU_WAVE, RAYTPU_SORT_KEY, ...) are read inside
    _render_step at trace time, so the shared jit cache below must key on
    them: a process that flips a knob and builds a new Renderer gets a
    fresh trace, exactly as the per-instance wrappers behaved."""
    import os

    return tuple(sorted((k, v) for k, v in os.environ.items()
                        if k.startswith("RAYTPU_")))


@functools.lru_cache(maxsize=64)
def _jit_step(cfg: RenderConfig, _knobs):
    return jax.jit(functools.partial(_render_step, cfg=cfg),
                   donate_argnums=(2,))


@functools.lru_cache(maxsize=64)
def _jit_chain(cfg: RenderConfig, k: int, _knobs):
    return jax.jit(functools.partial(_render_chain, cfg=cfg, k=k),
                   donate_argnums=(2,))


class Renderer:
    """Compiled render-step cache + accumulation buffer lifecycle.

    The jitted step is shared process-wide across Renderer instances with
    equal (frozen) configs and RAYTPU_* knobs: re-instantiating a
    Renderer — a second headless run in one process, a viewer ladder
    swap, a bench arm — must NOT retrace. On the axon tunnel a retrace of
    the 720p step costs ~25-30 s even when the remote compile cache hits
    (measured by exp38 r5c: the 'warm' headless invocation spent 33 s on
    32 frames, ~29 s of it the avoidable retrace)."""

    def __init__(self, config: Optional[RenderConfig] = None):
        self.cfg = config or RenderConfig()
        self._knobs = _knob_fingerprint()
        self._step = _jit_step(self.cfg, self._knobs)

    def new_accumulator(self) -> jnp.ndarray:
        return jnp.zeros((self.cfg.height, self.cfg.width, 3), jnp.float32)

    def render(self, scene: GpuScene, cam: CameraUniforms,
               accum: Optional[jnp.ndarray] = None):
        """One frame. Returns (accum', u8 image [H,W,3] device array, stats).

        Pass ``accum=None`` (or frame_count==0 with a fresh buffer) to start
        a new accumulation run.
        """
        if accum is None:
            accum = self.new_accumulator()
        return self._step(scene, cam, accum)

    def render_chain(self, scene: GpuScene, cam: CameraUniforms,
                     accum: Optional[jnp.ndarray], k: int):
        """k progressive frames in one dispatch (see _render_chain);
        the caller's frame counter should advance by k afterwards."""
        step = _jit_chain(self.cfg, k, self._knobs)
        if accum is None:
            accum = self.new_accumulator()
        return step(scene, cam, accum)

    def render_to_numpy(self, scene, cam, accum=None):
        accum, image, stats = self.render(scene, cam, accum)
        return accum, np.asarray(image), jax.tree.map(float, stats)
