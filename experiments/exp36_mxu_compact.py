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

Viability reduces to three primitive costs this experiment measures
in-kernel (exp29 methodology: big ITERS loops, changing inputs, forced
readback, times dwarfing the ~37 ms tunnel RTT):

  P1  [16,128] f32 elementwise op           (the baseline unit)
  P2  [16,128] x [128,128] f32 matmul       (MXU; the compaction unit)
  P3  [16,1] -> [16,128] lane broadcast      (per-tri data to sublanes)
  P4  build a [128,128] one-hot from [1,128] indices (iota compare)

Decision rule: the scheme replaces ~200 vector ops per leaf visit with
~14 P2 + ~14 P3 + ~16 P4-rows + ~50 P1. Worth building iff
14*P2 + 14*P3 + P4 + 50*P1 < ~0.6 * 200*P1.

Run from the repo root on the TPU: python experiments/exp36_mxu_compact.py
"""
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


ITERS = 40000


def _time(fn, x, label, per_iter_units):
    # changing inputs + forced readback (CLAUDE.md bench rules)
    y = fn(x)
    y.block_until_ready()
    t0 = time.perf_counter()
    s = 0.0
    reps = 3
    for r in range(reps):
        y = fn(x + jnp.float32(r))
        s += float(y.sum())  # forced readback
    dt = (time.perf_counter() - t0) / reps
    ns = dt / ITERS * 1e9
    log(f"{label}: {dt*1e3:8.2f} ms/call  {ns:8.2f} ns/iter "
        f"({ns/per_iter_units:.2f} ns/unit)  [checksum {s:.3e}]")
    return ns


def kernel_elemwise(x_ref, o_ref):
    a = x_ref[:]
    b = a

    def body(i, b):
        return b * a + 1.0e-7  # 2 ops

    b = jax.lax.fori_loop(0, ITERS, body, b)
    o_ref[:] = b


def kernel_matmul(x_ref, w_ref, o_ref):
    a = x_ref[:]
    w = w_ref[:]

    def body(i, a):
        return jnp.dot(a, w, preferred_element_type=jnp.float32) \
            * jnp.float32(0.99)
    a = jax.lax.fori_loop(0, ITERS, body, a)
    o_ref[:] = a


def kernel_broadcast(x_ref, o_ref):
    a = x_ref[:]
    acc = a

    def body(i, acc):
        col = acc[:, 0:1]          # [16,1]
        return acc + col * 1e-7    # broadcast along lanes + fma-ish

    acc = jax.lax.fori_loop(0, ITERS, body, acc)
    o_ref[:] = acc


def kernel_onehot(x_ref, o_ref):
    # Build a [128,128] one-hot from a [1,128] f32 index row each iter.
    a = x_ref[:]
    lanes = jax.lax.broadcasted_iota(jnp.float32, (128, 128), 0)

    def body(i, acc):
        idx = acc[0:1, :] % 128.0                      # [1,128]
        oh = (lanes == idx).astype(jnp.float32)        # [128,128]
        return acc + oh * 1e-7

    acc = jax.lax.fori_loop(0, ITERS, body, a)
    o_ref[:] = acc


def run(kernel, shapes, label, units, extra=None):
    outs = jax.ShapeDtypeStruct(shapes[0], jnp.float32)
    args = [jnp.asarray(np.random.rand(*s).astype(np.float32) + 0.5)
            for s in shapes]

    def call(x):
        ins = [x] + args[1:]
        return pl.pallas_call(
            kernel,
            out_shape=outs,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(ins),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(*ins)

    f = jax.jit(call)
    return _time(f, args[0], label, units)


def main():
    log(f"devices: {jax.devices()}")
    p1 = run(kernel_elemwise, [(16, 128)], "P1 elemwise 2op [16,128]", 2)
    p2 = run(kernel_matmul, [(16, 128), (128, 128)],
             "P2 matmul [16,128]x[128,128] + scale", 1)
    p3 = run(kernel_broadcast, [(16, 128)],
             "P3 [16,1] lane-broadcast + fma", 1)
    p4 = run(kernel_onehot, [(128, 128)], "P4 one-hot build [128,128]", 1)

    unit = p1 / 2  # ns per [16,128] vector op
    scheme = 14 * p2 + 14 * p3 + p4 + 50 * unit
    today = 200 * unit
    log(f"per-vector-op unit: {unit:.1f} ns")
    log(f"scheme per leaf visit ~{scheme:.0f} ns vs inline MT "
        f"~{today:.0f} ns -> ratio {scheme/today:.2f} "
        f"(build iff < ~0.6)")


if __name__ == "__main__":
    main()
