"""exp36: price MXU one-hot compaction for dense leaf processing.

The unpriced round-4 divergence idea (the priced ones all died: thin
leaves r3f, BVH16 r4a, per-ray gather walk exp28, MXU-MT exp27): per
leaf visit, COMPACT the ~12 hit rays (lane occupancy 0.006) into dense
lanes with one-hot matmuls, replicate across sublanes, and give each
sublane a DIFFERENT triangle — one [16,128] vector op then tests 16
(tri, ray) combos instead of 1 tri vs mostly-idle lanes. Per-leaf MT
vector ops drop ~8x, paid for with ~14 [16,128]x[128,128] MXU matmuls
(cumsum for the compaction index, one-hot gathers, one-hot-transpose
scatters) + ~14 sublane-broadcasts of per-triangle data.

Viability reduces to four primitive costs this experiment measures
in-kernel (exp29 methodology: ITERS sized so each call dwarfs the
~37 ms tunnel RTT — the r4c run at ITERS=40k would have measured pure
floor for P1/P3; bodies carry 4-8 independent chains so they measure
ISSUE rate like the production walk, not dependent-chain latency):

  P1  [16,128] f32 elementwise op           (the baseline unit)
  P2  [16,128] x [128,128] f32 matmul       (MXU; the compaction unit)
  P2b [128,128] x [128,128] f32 matmul      (the one-hot gather itself)
  P3  [16,1] -> [16,128] lane broadcast      (per-tri data to sublanes)
  P4  build a [128,128] one-hot from [1,128] indices (iota compare)

Decision rule: the scheme replaces ~200 vector ops per leaf visit with
~14 P2 + ~14 P3 + ~1 P4 + ~50 P1. Worth building iff
14*P2 + 14*P3 + P4 + 50*P1 < ~0.6 * 200*P1. Secondary readout: a
one-hot gather's effective row rate (128 rows / P2b) vs the XLA sparse
path's measured ~360 Mrows/s — the floor that priced the per-ray walk
dead (exp28 census conclusion 1).

Run from the repo root on the TPU: python experiments/exp36_mxu_compact.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def _time(fn, x, label, iters, lanes_of_work):
    """Median per-iteration ns over interleaved reps (changing inputs +
    forced readback, CLAUDE.md bench rules)."""
    y = fn(x)
    float(jnp.sum(y))  # warm + force
    ts = []
    for r in range(5):
        xr = x + jnp.float32((r + 1) * 1e-9)
        t0 = time.perf_counter()
        y = fn(xr)
        float(jnp.sum(y))  # forced readback
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[len(ts) // 2]
    ns = dt / iters * 1e9
    log(f"{label}: {dt*1e3:8.2f} ms/call  {ns:8.2f} ns/iter "
        f"({ns/lanes_of_work:.2f} ns/unit)")
    return ns


def kernel_elemwise(x_ref, o_ref, *, iters):
    # 8 independent mul+add chains per iteration = 16 vector ops with
    # ILP, like the production 8-child visit.
    a = x_ref[:]
    accs = tuple(a * jnp.float32(1.0 + 0.01 * k) for k in range(8))

    def body(i, accs):
        return tuple(acc * a + jnp.float32(1e-7) for acc in accs)

    accs = jax.lax.fori_loop(0, iters, body, accs)
    o_ref[:] = sum(accs)


def kernel_matmul(x_ref, w_ref, o_ref, *, iters, m):
    # 4 independent matmul chains per iteration (MXU ILP).
    a = x_ref[:]
    w = w_ref[:]
    accs = tuple(a * jnp.float32(1.0 + 0.01 * k) for k in range(4))

    def body(i, accs):
        return tuple(
            jnp.dot(acc, w, preferred_element_type=jnp.float32)
            * jnp.float32(0.9999) for acc in accs)

    accs = jax.lax.fori_loop(0, iters, body, accs)
    o_ref[:] = sum(accs)


def kernel_broadcast(x_ref, o_ref, *, iters):
    # 8 independent [16,1] lane-broadcast + fma per iteration.
    a = x_ref[:]
    accs = tuple(a * jnp.float32(1.0 + 0.01 * k) for k in range(8))

    def body(i, accs):
        return tuple(acc + acc[:, 0:1] * jnp.float32(1e-7) for acc in accs)

    accs = jax.lax.fori_loop(0, iters, body, accs)
    o_ref[:] = sum(accs)


def kernel_onehot(x_ref, o_ref, *, iters):
    # Build a [128,128] one-hot from a [1,128] f32 index row each iter.
    # tpu.iota only lowers for integer types (r4c Mosaic verification
    # error) — build int32 and convert once outside the loop.
    a = x_ref[:]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0).astype(
        jnp.float32)

    def body(i, acc):
        idx = acc[0:1, :] % 128.0                      # [1,128]
        oh = (lanes == idx).astype(jnp.float32)        # [128,128]
        return acc + oh * 1e-7

    acc = jax.lax.fori_loop(0, iters, body, a)
    o_ref[:] = acc


def run(kernel, shapes, label, iters, units_per_iter, chains, **kw):
    outs = jax.ShapeDtypeStruct(shapes[0], jnp.float32)
    args = [jnp.asarray(np.random.rand(*s).astype(np.float32) + 0.5)
            for s in shapes]

    def call(x):
        ins = [x] + args[1:]
        return pl.pallas_call(
            functools.partial(kernel, iters=iters, **kw),
            out_shape=outs,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(ins),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(*ins)

    f = jax.jit(call)
    # per-iteration ns / chains = ns per single primitive
    ns_iter = _time(f, args[0], label, iters, units_per_iter)
    return ns_iter / chains


def main():
    log(f"devices: {jax.devices()}")
    # Per-kernel ITERS sized so each call is ~60-150 ms >> 37 ms RTT.
    p1 = run(kernel_elemwise, [(16, 128)], "P1 elemwise 8x(mul+add) [16,128]",
             2_000_000, 16, 8)          # -> ns per (mul+add) pair
    p2 = run(kernel_matmul, [(16, 128), (128, 128)],
             "P2 4x matmul [16,128]x[128,128]", 200_000, 4, 4, m=16)
    p2b = run(kernel_matmul, [(128, 128), (128, 128)],
              "P2b 4x matmul [128,128]x[128,128]", 100_000, 4, 4, m=128)
    p3 = run(kernel_broadcast, [(16, 128)],
             "P3 8x [16,1] lane-broadcast+fma", 2_000_000, 8, 8)
    p4 = run(kernel_onehot, [(128, 128)], "P4 one-hot build [128,128]",
             500_000, 1, 1)

    unit = p1 / 2  # ns per [16,128] vector op
    scheme = 14 * p2 + 14 * p3 + p4 + 50 * unit
    today = 200 * unit
    log(f"per-vector-op unit: {unit:.2f} ns  (exp29 walk-form ref: 2.29)")
    log(f"P2 small matmul: {p2:.1f} ns   P2b [128,128] matmul: {p2b:.1f} ns"
        f"   P3 bcast: {p3:.1f} ns   P4 one-hot: {p4:.1f} ns")
    log(f"one-hot gather row rate: {128 / p2b * 1e3:.0f} Mrows/s "
        f"(XLA sparse path ref: ~360 Mrows/s)")
    log(f"scheme per leaf visit ~{scheme:.0f} ns vs inline MT "
        f"~{today:.0f} ns -> ratio {scheme/today:.2f} "
        f"(build iff < ~0.6)")


if __name__ == "__main__":
    main()
