"""exp32: packed-bf16 VPU issue rate — the last unmeasured traversal lever.

exp28 part 7 priced occupancy out and exp29 killed the FMA/mask-fold
rewrites, leaving ONE open question from PERF_NOTES ("bf16 is only
usable if the packed issue rate is confirmed 2x"): does Mosaic issue
bf16 vector arithmetic at 2 values/lane (a (16,128) bf16 block = 1 vreg
vs 2 for f32), or does it unpack to f32 and issue at the same rate?

Three walk forms, op-for-op the production 8-child slab visit (scalar
SMEM bounds broadcast against vector rays), interleaved-round timed like
exp29 (same ITERS sizing so kernel time dwarfs the ~37 ms tunnel RTT):

  f32    — (16,128) f32 rays, the exp29 "subm" baseline (219 ns/visit).
  bf16   — (16,128) bf16 rays: same ray count, half the vregs. 2x packed
           issue => ~0.5x time/visit; f32-unpack issue => ~1.0x.
  bf16x2 — (32,128) bf16 rays: same vreg count as the f32 baseline but
           2x rays/visit. 2x packed issue => ~1.0x time (=> 2x rays/s).

Decision (PERF_NOTES rule): bf16/f32 ratio < 0.6 => build the anchored
conservative-padded bf16 slab test (pad node bounds at SMEM-broadcast
time by eps_bf16*(max|corner-anchor| + max|o-anchor|), scalar-only
cost); ratio ~1 => the bf16 avenue is dead on this VPU, record and stop.
"""
import functools
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANES = 16, 128
NVIS = 64
ITERS = 32768
GRID = 8
WIDTH = 8


def _walk_kernel(bnd_ref, ox_ref, oy_ref, oz_ref, ivx_ref, ivy_ref,
                 ivz_ref, act_ref, acc_ref, *, dtype, stage):
    """stage: how much of the slab pipe runs in `dtype` before upcasting
    to f32 (the v5e VPU rejects packed-bf16 cmpf, found the hard way):
      'arith'  — (b-o)*iv in dtype, upcast 6 planes, min/max+cmp f32
      'minmax' — arith + min/max tree in dtype, upcast t_en/t_ex, cmp f32
      'all'    — everything in dtype (f32 baseline only)
    """
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    ivx, ivy, ivz = ivx_ref[:], ivy_ref[:], ivz_ref[:]
    active = act_ref[:] > jnp.float32(0.5)   # act stays f32 (packed cmpf
    t_min = jnp.float32(1e-3)                # is unsupported on v5e)
    big = jnp.full(ox.shape, 1e9, jnp.float32)

    def body(i, acc):
        closest = acc  # data-dependent bound, like the production walk
        row = i % NVIS
        hits = acc
        for cc in range(WIDTH):
            b = 6 * cc
            g = lambda j, b=b: bnd_ref[row, b + j].astype(dtype)
            lo0 = (g(0) - ox) * ivx
            hi0 = (g(3) - ox) * ivx
            lo1 = (g(1) - oy) * ivy
            hi1 = (g(4) - oy) * ivy
            lo2 = (g(2) - oz) * ivz
            hi2 = (g(5) - oz) * ivz
            if stage == "arith":
                lo0, hi0, lo1, hi1, lo2, hi2 = (
                    v.astype(jnp.float32)
                    for v in (lo0, hi0, lo1, hi1, lo2, hi2))
            t_en = jnp.maximum(jnp.minimum(lo0, hi0),
                               jnp.maximum(jnp.minimum(lo1, hi1),
                                           jnp.minimum(lo2, hi2)))
            t_ex = jnp.minimum(jnp.maximum(lo0, hi0),
                               jnp.minimum(jnp.maximum(lo1, hi1),
                                           jnp.maximum(lo2, hi2)))
            t_en = t_en.astype(jnp.float32)
            t_ex = t_ex.astype(jnp.float32)
            hit = ((t_ex > t_en) & (t_ex > t_min)
                   & (t_en < closest) & active)
            hits = hits + jnp.where(hit, t_en, 0.0)
        return jnp.minimum(hits, big)

    acc_ref[:] = jax.lax.fori_loop(0, ITERS, body, acc_ref[:])


def time_interleaved(fns, reps=7):
    """Median per-call time per fn, round-robin (see exp29 methodology:
    back-to-back timing hands the first form a 4-8x warmup penalty)."""
    for name, (fn, a) in fns.items():
        r = fn(*a)
        float(jnp.sum(r.astype(jnp.float32)))
    times = {name: [] for name in fns}
    for k in range(reps):
        for name, (fn, a) in fns.items():
            a_k = (a[0] + jnp.float32((k + 1) * 1e-12), *a[1:])
            t0 = time.time()
            r = fn(*a_k)
            float(jnp.sum(r.astype(jnp.float32)))
            times[name].append(time.time() - t0)
    return {name: statistics.median(ts) for name, ts in times.items()}


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 8)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    fns = {}
    ray_counts = {}
    for name, dtype, sub, stage in (
            ("f32", jnp.float32, SUB, "all"),
            ("bf16_arith", jnp.bfloat16, SUB, "arith"),
            ("bf16_minmax", jnp.bfloat16, SUB, "minmax"),
            ("bf16x2_minmax", jnp.bfloat16, 2 * SUB, "minmax")):
        rows = GRID * sub
        mk = lambda k, lo, hi: jax.random.uniform(
            k, (rows, LANES), jnp.float32, lo, hi).astype(dtype)
        ox, oy, oz = (mk(ks[0], -1, 1), mk(ks[1], -1, 1), mk(ks[2], -1, 1))
        # precomputed reciprocals (production precomputes iv per walk)
        iv = lambda k: (1.0 / (jax.random.uniform(
            k, (rows, LANES), jnp.float32, -1, 1) + 1.5)).astype(dtype)
        ivx, ivy, ivz = iv(ks[3]), iv(ks[4]), iv(ks[5])
        act = (jax.random.uniform(ks[6], (rows, LANES), jnp.float32,
                                  -1, 1) > -0.5).astype(jnp.float32)
        bnd = jax.random.uniform(ks[7], (NVIS, 6 * WIDTH), jnp.float32,
                                 -2.0, 2.0)
        block = pl.BlockSpec((sub, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        out = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
        f = jax.jit(pl.pallas_call(
            functools.partial(_walk_kernel, dtype=dtype, stage=stage),
            grid=(GRID,),
            in_specs=[smem] + [block] * 7,
            out_specs=pl.BlockSpec((sub, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=out,
            interpret=jax.default_backend() != "tpu",
        ))
        fns[name] = (f, (bnd, ox, oy, oz, ivx, ivy, ivz, act))
        ray_counts[name] = sub * LANES

    t = time_interleaved(fns)
    nvisits = GRID * ITERS
    base = t["f32"]
    for name, tt in t.items():
        ns = tt / nvisits * 1e9
        rays_s = ray_counts[name] * nvisits / tt / 1e9
        print(f"walk {name:7s}: {tt*1e3:8.3f} ms/call = {ns:7.1f} ns/visit"
              f"  ({tt/base:.3f}x vs f32; {rays_s:6.2f} Gray-visits/s)",
              flush=True)
    r16 = t["bf16_minmax"] / base
    r32 = t["bf16x2_minmax"] / base
    verdict = ("BUILD anchored bf16 slab test" if min(r16, r32 / 2) < 0.7
               else "bf16 avenue DEAD (no packed-issue win)")
    print(f"bf16_minmax/f32 {r16:.3f}, bf16x2_minmax/f32 {r32:.3f} "
          f"(per-visit) -> {verdict}", flush=True)


if __name__ == "__main__":
    main()
