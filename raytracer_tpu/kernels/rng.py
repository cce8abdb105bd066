"""PCG hash RNG, vectorized with per-ray masked advancement.

Bit-faithful port of the reference's RNG (``compute_dynamic_ray.comp:50-74``):
``pcg(uint)`` hash, ``randomFloat`` = next-state / 2^32-1, and
``randomVec3InUnitSphere`` which (quirk preserved) first draws and discards a
3-vector, then rejection-samples until a point lands inside the unit sphere.

The GLSL version runs per-thread, so each ray's RNG stream length depends on
its own rejection count. Vectorized lockstep would desynchronize streams, so
every draw is masked: a ray's seed only advances where that ray actually
draws. The rejection loop is a ``lax.while_loop`` that keeps drawing for
not-yet-accepted rays only — statistically *and* stream-exactly equivalent
to the reference's unbounded per-thread loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pcg(v: jnp.ndarray) -> jnp.ndarray:
    """The PCG output hash (compute_dynamic_ray.comp:52-56). u32 -> u32."""
    v = v.astype(jnp.uint32)
    state = v * jnp.uint32(747796405) + jnp.uint32(2891336453)
    word = ((state >> ((state >> jnp.uint32(28)) + jnp.uint32(4))) ^ state) \
        * jnp.uint32(277803737)
    return (word >> jnp.uint32(22)) ^ word


_INV_U32_MAX = None  # computed lazily to honor current dtype config


def _to_unit_float(seed: jnp.ndarray) -> jnp.ndarray:
    # GLSL: float(seed) / float(0xFFFFFFFFu); float(0xFFFFFFFFu) rounds to
    # 2^32 in f32, and so does the numerator conversion — matching exactly.
    return seed.astype(jnp.float32) / jnp.float32(4294967295.0)


def random_float(seed: jnp.ndarray, active: jnp.ndarray):
    """One masked draw. Returns (new_seed, value). value is unspecified
    (but finite) where ``active`` is False."""
    new_seed = jnp.where(active, pcg(seed), seed)
    return new_seed, _to_unit_float(new_seed)


def random_vec3(seed, active):
    """Three sequential masked draws -> (seed, (x, y, z)) as SoA components
    (see kernels/vec.py for why vectors are not [..., 3] arrays)."""
    seed, x = random_float(seed, active)
    seed, y = random_float(seed, active)
    seed, z = random_float(seed, active)
    return seed, (x, y, z)


REJECTION_ROUNDS = 24  # P(exhaust) = (1 - pi/6)^24 ~ 2e-8 per draw


def random_vec3_in_unit_sphere(seed, active,
                               max_iters: int | None = REJECTION_ROUNDS):
    """Masked rejection sampling of a point in the unit ball -> SoA vec.

    Preserves the reference's stream structure: 3 draws for the discarded
    ``temp`` vector, then 3 draws per rejection round. The loop is bounded
    at REJECTION_ROUNDS so streams are deterministic and identical between
    the XLA and Pallas shade implementations; an exhausted lane returns
    (0,0,0) and the caller falls back to the surface normal (scatter's
    zero-length guard). ``max_iters=None`` restores the reference's
    unbounded loop.
    """
    # Discarded temp draw (compute_dynamic_ray.comp:64) — stream parity.
    seed, _ = random_vec3(seed, active)

    zero = jnp.zeros(active.shape, jnp.float32)

    def cond(carry):
        _, _, _, _, accepted, it = carry
        pending = jnp.any(jnp.logical_and(active, ~accepted))
        if max_iters is None:
            return pending
        return jnp.logical_and(pending, it < max_iters)

    def body(carry):
        s, px, py, pz, accepted, it = carry
        need = jnp.logical_and(active, ~accepted)
        s, (vx, vy, vz) = random_vec3(s, need)
        cx = vx * 2.0 - 1.0
        cy = vy * 2.0 - 1.0
        cz = vz * 2.0 - 1.0
        ok = cx * cx + cy * cy + cz * cz < 1.0
        take = jnp.logical_and(need, ok)
        px = jnp.where(take, cx, px)
        py = jnp.where(take, cy, py)
        pz = jnp.where(take, cz, pz)
        return s, px, py, pz, jnp.logical_or(accepted, take), it + 1

    seed, px, py, pz, _, _ = jax.lax.while_loop(
        cond, body, (seed, zero, zero, zero, ~active, jnp.int32(0)))
    return seed, (px, py, pz)
