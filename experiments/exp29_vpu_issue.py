"""exp29: VPU issue-rate microbench — is the slab test FMA-foldable?

The divergence census (exp28 part 7, PERF_NOTES.md) concluded the
remaining traversal lever is per-visit ISSUE cost: the VPU is
issue-bound at [16,128] (lanes are free), so cutting vector ops per
visit cuts walk time ~proportionally. The candidate rewrites:

  A. FMA-form slab planes: today each plane is (b - o) * iv = sub+mul
     (2 vector ops). With o*iv precomputed per walk, b*iv - oiv is ONE
     op IF Mosaic emits a fused multiply-add for the pattern.
     12 -> 6 ops per child, 96 -> 48 per 8-wide visit.
  B. Mask fold: the hit chain is 3 cmp + 3 and per child (the
     `& active` and `& (t_ex > t_min)` terms are loop-invariant).
     Pre-masking closest once per visit (dead lanes -> -inf) and
     folding t_min into t_ex's bound drops it to 2 cmp + 1 and.

This bench times synthetic walks that are op-for-op the production
8-child visit (scalar SMEM bounds broadcast against [16,128] vector
rays), identical except the form, and reports ns/visit. Decision:
ratio < 0.85 on A => rewrite pallas_mega/pallas_trace slab tests.

Also probes raw dependent-chain throughput of mul+add vs a*b+c to get
the machine's FMA fusion answer independent of the slab shape.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANES = 16, 128
NVIS = 64          # distinct visit rows in SMEM, cycled
# visits per grid step. MUST be large enough that the kernel dwarfs the
# ~30-37 ms tunnel RTT floor: the first run at ITERS=2048 measured all
# three walk forms AND both chain forms at 30-31 ms/call — pure floor
# (923 ns per [16,128] mul+add is impossible), ratios meaningless.
ITERS = 32768
GRID = 8
WIDTH = 8


def _walk_kernel(bnd_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                 act_ref, acc_ref, *, form):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    ivx, ivy, ivz = 1.0 / dx_ref[:], 1.0 / dy_ref[:], 1.0 / dz_ref[:]
    active = act_ref[:] > 0.5
    if form == "fma":
        oivx, oivy, oivz = ox * ivx, oy * ivy, oz * ivz
    t_min = jnp.float32(1e-3)
    big = jnp.full(ox.shape, 1e9, jnp.float32)

    def body(i, acc):
        closest = acc  # data-dependent bound, like the production walk
        if form == "mask1":
            closest = jnp.where(active, closest, -jnp.float32(1e9))
        row = i % NVIS
        hits = acc
        for cc in range(WIDTH):
            b = 6 * cc
            g = lambda j, b=b: bnd_ref[row, b + j]
            if form == "fma":
                lo0 = g(0) * ivx - oivx
                hi0 = g(3) * ivx - oivx
                lo1 = g(1) * ivy - oivy
                hi1 = g(4) * ivy - oivy
                lo2 = g(2) * ivz - oivz
                hi2 = g(5) * ivz - oivz
            else:
                lo0 = (g(0) - ox) * ivx
                hi0 = (g(3) - ox) * ivx
                lo1 = (g(1) - oy) * ivy
                hi1 = (g(4) - oy) * ivy
                lo2 = (g(2) - oz) * ivz
                hi2 = (g(5) - oz) * ivz
            t_en = jnp.maximum(jnp.minimum(lo0, hi0),
                               jnp.maximum(jnp.minimum(lo1, hi1),
                                           jnp.minimum(lo2, hi2)))
            t_ex = jnp.minimum(jnp.maximum(lo0, hi0),
                               jnp.minimum(jnp.maximum(lo1, hi1),
                                           jnp.maximum(lo2, hi2)))
            if form == "mask1":
                hit = (t_ex > jnp.maximum(t_en, t_min)) & (t_en < closest)
            else:
                hit = ((t_ex > t_en) & (t_ex > t_min)
                       & (t_en < closest) & active)
            hits = hits + jnp.where(hit, t_en, 0.0)
        return jnp.minimum(hits, big)

    acc_ref[:] = jax.lax.fori_loop(0, ITERS, body, acc_ref[:])


def _chain_kernel(s_ref, x_ref, acc_ref, *, form, n):
    x = x_ref[:]
    c = s_ref[0]

    def body(i, acc):
        for _ in range(8):
            if form == "muladd":
                acc = acc * c
                acc = acc + x
            else:  # "fma": the a*b+c pattern Mosaic may fuse
                acc = acc * c + x
        return acc

    acc_ref[:] = jax.lax.fori_loop(0, n, body, acc_ref[:])


def time_interleaved(fns, reps=7):
    """Median per-call time per fn, measured round-robin.

    The first exp29 runs timed each form back-to-back and the FIRST form
    measured 4-8x slower — including a pair of forms whose jaxprs are
    IDENTICAL (mul;add vs a*b+c trace to the same HLO), which proves an
    order/warmup artifact in the tunnel, not a compute difference.
    Interleaving rounds + medians removes it.
    """
    for name, (fn, a) in fns.items():
        r = fn(*a)
        float(jnp.sum(r))
    times = {name: [] for name in fns}
    for k in range(reps):
        for name, (fn, a) in fns.items():
            a_k = (a[0], a[1] + jnp.float32((k + 1) * 1e-12), *a[2:])
            t0 = time.time()
            r = fn(*a_k)
            float(jnp.sum(r))
            times[name].append(time.time() - t0)
    import statistics
    return {name: statistics.median(ts) for name, ts in times.items()}


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(7)
    rows = GRID * SUB
    ks = jax.random.split(key, 8)
    mk = lambda k: jax.random.uniform(k, (rows, LANES), jnp.float32,
                                      -1.0, 1.0)
    ox, oy, oz = mk(ks[0]), mk(ks[1]), mk(ks[2])
    dx, dy, dz = (mk(ks[3]) + 1.5), (mk(ks[4]) + 1.5), (mk(ks[5]) + 1.5)
    act = (mk(ks[6]) > -0.5).astype(jnp.float32)
    bnd = jax.random.uniform(ks[7], (NVIS, 6 * WIDTH), jnp.float32,
                             -2.0, 2.0)

    block = pl.BlockSpec((SUB, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)

    def make_walk(form):
        return jax.jit(pl.pallas_call(
            functools.partial(_walk_kernel, form=form),
            grid=(GRID,),
            in_specs=[smem] + [block] * 7,
            out_specs=block,
            out_shape=out,
            input_output_aliases={7: 0},
        ))

    nvisits = GRID * ITERS
    walk_args = (bnd, ox, oy, oz, dx, dy, dz, act)
    walk_fns = {form: (make_walk(form), walk_args)
                for form in ("subm", "fma", "mask1")}
    walk_t = time_interleaved(walk_fns)
    base = walk_t["subm"]
    for form, t in walk_t.items():
        ns = t / nvisits * 1e9
        print(f"walk {form:6s}: {t*1e3:7.3f} ms/call "
              f"= {ns:7.1f} ns/visit  ({t / base:.3f}x vs subm)",
              flush=True)

    # raw dependent-chain probe: 8 (mul,add) pairs vs 8 a*b+c per iter
    # (dependent chain => latency-bound; fusion halves chain latency).
    N = 524288
    chain_out = jax.ShapeDtypeStruct((SUB, LANES), jnp.float32)
    cblk = pl.BlockSpec(memory_space=pltpu.VMEM)
    x = jax.random.uniform(ks[0], (SUB, LANES), jnp.float32, 0.0, 1e-6)
    s = jnp.full((1,), 0.9999, jnp.float32)
    chain_fns = {}
    for form in ("muladd", "fma"):
        f = jax.jit(pl.pallas_call(
            functools.partial(_chain_kernel, form=form, n=N),
            in_specs=[smem, cblk],
            out_specs=cblk,
            out_shape=chain_out,
        ))
        chain_fns[form] = (f, (s, x))
    chain_t = time_interleaved(chain_fns)
    for form, t in chain_t.items():
        per = t / (N * 8) * 1e9
        print(f"chain {form:7s}: {t*1e3:7.3f} ms = {per:6.2f} ns per "
              f"(mul+add | a*b+c) step", flush=True)
    r = chain_t["fma"] / chain_t["muladd"]
    print(f"fma/muladd ratio: {r:.3f} "
          f"({'FUSED — rewrite pays' if r < 0.7 else 'NOT fused enough'})",
          flush=True)


if __name__ == "__main__":
    main()
