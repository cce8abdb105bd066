"""RNG stream parity: vectorized masked PCG vs the scalar oracle."""

import numpy as np

import jax.numpy as jnp

from raytracer_tpu.kernels import rng
from raytracer_tpu.testing.cpu_reference import Pcg


def test_pcg_hash_matches_oracle():
    seeds = np.array([0, 1, 12345, 0xDEADBEEF, 2**32 - 1], np.uint32)
    got = np.asarray(rng.pcg(jnp.asarray(seeds)))
    for s, g in zip(seeds, got):
        p = Pcg(int(s))
        assert p._pcg(np.uint32(s)) == g


def test_random_float_stream_matches_oracle():
    seed = jnp.asarray(np.array([7, 42], np.uint32))
    active = jnp.ones(2, bool)
    oracles = [Pcg(7), Pcg(42)]
    for _ in range(10):
        seed, val = rng.random_float(seed, active)
        want = [o.random_float() for o in oracles]
        np.testing.assert_allclose(np.asarray(val), want, rtol=0)


def test_masked_draws_freeze_inactive_streams():
    seed0 = jnp.asarray(np.array([7, 42], np.uint32))
    active = jnp.asarray(np.array([True, False]))
    seed, _ = rng.random_float(seed0, active)
    assert int(seed[0]) != 7 and int(seed[1]) == 42


def test_unit_sphere_matches_oracle_streams():
    """Masked rejection sampling consumes exactly the oracle's draws: the
    discarded temp triple plus 3 per rejection round, per ray."""
    seeds = [3, 99, 123456]
    seed = jnp.asarray(np.array(seeds, np.uint32))
    active = jnp.ones(3, bool)
    seed, (px, py, pz) = rng.random_vec3_in_unit_sphere(seed, active)
    for i, s in enumerate(seeds):
        o = Pcg(s)
        want = o.random_vec3_in_unit_sphere()
        np.testing.assert_allclose(
            [float(px[i]), float(py[i]), float(pz[i])], want, rtol=0)
        assert int(seed[i]) == int(o.seed)  # stream position identical


def test_unit_sphere_results_inside_ball():
    n = 512
    seed = jnp.asarray(np.arange(n, dtype=np.uint32) * 2654435761 + 1)
    _, (x, y, z) = rng.random_vec3_in_unit_sphere(seed, jnp.ones(n, bool))
    r2 = np.asarray(x) ** 2 + np.asarray(y) ** 2 + np.asarray(z) ** 2
    assert (r2 < 1.0).all()
