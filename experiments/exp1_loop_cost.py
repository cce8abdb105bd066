"""Characterize packet-loop cost scaling on the TPU backend.

Questions: (1) per-iteration cost vs group-count width; (2) unroll effect;
(3) does NT=14400 (720p) survive fixed-iteration loops (isolate the
while-loop crash); (4) sort + permutation-apply cost per bounce.
Run: python experiments/exp1_loop_cost.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

print(jax.devices(), flush=True)

rngn = np.random.default_rng(0)
nodes8 = jnp.asarray(rngn.random((16384, 8)), jnp.float32)
clusters = jnp.asarray(rngn.random((8192, 128)), jnp.float32)


def packet_body_loop(K, NG, G, unroll):
    ro0 = jnp.asarray(rngn.random((NG, G, 3)), jnp.float32)

    def f(rd):
        node0 = jnp.zeros((NG,), jnp.int32)
        ct0 = jnp.full((NG, G), 1e4, jnp.float32)

        def step(c):
            node, ct = c
            safe = node % 16384
            rows = jnp.take(nodes8, safe, axis=0)
            bmin, bmax = rows[:, None, 0:3], rows[:, None, 3:6]
            inv = 1.0 / rd
            t0s = (bmin - ro0) * inv
            t1s = (bmax - ro0) * inv
            te = jnp.max(jnp.minimum(t0s, t1s), -1)
            tx = jnp.min(jnp.maximum(t0s, t1s), -1)
            rh = (tx > te) & (te < ct)
            gh = jnp.any(rh, 1)
            crow = jnp.take(clusters, safe % 8192, axis=0)
            trisv = crow.reshape(NG, 1, 8, 16)
            v0 = trisv[..., 0:3]
            e1 = trisv[..., 3:6] - v0
            e2 = trisv[..., 6:9] - v0
            rdx = rd[:, :, None, :]
            rox = ro0[:, :, None, :]
            pv = jnp.cross(rdx, e2)
            det = jnp.sum(e1 * pv, -1)
            ok = jnp.abs(det) > 1e-5
            idet = 1.0 / jnp.where(ok, det, 1.0)
            s = rox - v0
            uu = idet * jnp.sum(s * pv, -1)
            ok &= (uu >= 0) & (uu <= 1)
            qv = jnp.cross(s, e1)
            vv = idet * jnp.sum(rdx * qv, -1)
            ok &= (vv >= 0) & (uu + vv <= 1)
            t = idet * jnp.sum(e2 * qv, -1)
            ok &= (t > 1e-3) & (t < ct[..., None])
            tm = jnp.where(ok, t, jnp.inf)
            ct = jnp.minimum(ct, jnp.min(tm, -1))
            node = jnp.where(gh, node + 1, node + 2)
            return node, ct

        def body(i, c):
            for _ in range(unroll):
                c = step(c)
            return c

        return jax.lax.fori_loop(0, K // unroll, body, (node0, ct0))[1]

    return jax.jit(f)


def timed(f, arg_maker, n=2):
    r = f(arg_maker())
    float(r.sum())
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(arg_maker())
        float(r.sum())
    return (time.perf_counter() - t0) / n


for NG, G, tag in [(880, 64, "320x176 b0"), (3600, 64, "640x360 b0"),
                   (14400, 64, "1280x720 b0"),
                   (14400, 16, "230k rays g16"),
                   (57600, 16, "921k rays g16")]:
    for unroll in (1, 4):
        try:
            mk = lambda NG=NG, G=G: jnp.asarray(
                rngn.random((NG, G, 3)), jnp.float32) + 0.5
            K = 64
            tA = timed(packet_body_loop(K, NG, G, unroll), mk)
            tB = timed(packet_body_loop(2 * K, NG, G, unroll), mk)
            per = (tB - tA) / K
            print(f"{tag:16s} NG={NG:6d} G={G} unroll={unroll}: "
                  f"{per*1e6:8.1f} us/step", flush=True)
        except Exception as e:
            print(f"{tag} unroll={unroll} FAILED: {str(e)[:120]}", flush=True)

# sort + apply cost
for P in (230400, 921600):
    key = jnp.asarray(rngn.integers(0, 2**30, P), jnp.int32)
    st = jnp.asarray(rngn.random((P, 12)), jnp.float32)

    def sortf(key, st):
        perm = jnp.argsort(key, stable=True)
        return jnp.take(st, perm, axis=0)

    f = jax.jit(sortf)
    r = f(key, st)
    float(r.sum())
    t0 = time.perf_counter()
    for i in range(3):
        r = f(key + i, st)
        float(r.sum())
    print(f"sort+apply P={P}: {(time.perf_counter()-t0)/3*1e3:.1f} ms",
          flush=True)
print("DONE", flush=True)
