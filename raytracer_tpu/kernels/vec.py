"""Structure-of-arrays 3-vector helpers.

TPU vregs are 8x128; an array whose minor dimension is 3 (xyz) or 8
(cluster triangles) wastes 16-42x of every register and memory tile on
padding (measured: a [NG,16,...] kernel ran 60x slower than the same work
shaped [NG,64,...] — PERF_NOTES.md). All kernel math therefore carries
vectors as component tuples (x, y, z) of large flat arrays, keeping the
ray dimension minormost.
"""

from __future__ import annotations

import jax.numpy as jnp

V3 = tuple  # (x, y, z) of same-shaped arrays


def v3(x, y, z) -> V3:
    return (x, y, z)


def splat(v, shape=()) -> V3:
    """Broadcast a concrete 3-vector (e.g. camera uniform) to components."""
    return tuple(jnp.broadcast_to(v[i], shape) for i in range(3))


def add(a: V3, b: V3) -> V3:
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def sub(a: V3, b: V3) -> V3:
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def mul(a: V3, b: V3) -> V3:
    return (a[0] * b[0], a[1] * b[1], a[2] * b[2])


def scale(a: V3, s) -> V3:
    return (a[0] * s, a[1] * s, a[2] * s)


def dot(a: V3, b: V3):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def cross(a: V3, b: V3) -> V3:
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def length(a: V3):
    return jnp.sqrt(dot(a, a))


def normalize(a: V3) -> V3:
    inv = 1.0 / length(a)
    return scale(a, inv)


def where(c, a: V3, b: V3) -> V3:
    return (jnp.where(c, a[0], b[0]), jnp.where(c, a[1], b[1]),
            jnp.where(c, a[2], b[2]))


def reflect(i: V3, n: V3) -> V3:
    d = dot(i, n)
    return (i[0] - 2.0 * d * n[0], i[1] - 2.0 * d * n[1],
            i[2] - 2.0 * d * n[2])


def stack(a: V3):
    """Components -> [..., 3] array (host/boundary use only)."""
    return jnp.stack(a, axis=-1)


def unstack(arr):
    """[..., 3] array -> components."""
    return (arr[..., 0], arr[..., 1], arr[..., 2])
