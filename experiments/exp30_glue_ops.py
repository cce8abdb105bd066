"""exp30: gather/scatter glue variants, measured in isolation (TPU).

The r3 device trace (parse_trace --exact on /tmp/trace_r3d) pinned the
per-round wavefront glue to three ops at band width w=307200:

  - fpack row gather  f32[w,9]  by order: 1.39 ms  (220 Mrows/s)
  - ipack row gather  s32[w,3]  by order: 1.33 ms  (same — per-ROW cost,
    not bytes: 3 cols ~= 9 cols)
  - key 1-D gather    s32[w]    by order: 2.19 ms  (!! slower than the
    9-col row gather; T(1024) 1-D layout)
  - tail scatter-add  [w/2] -> [w] x3 channels: 1.33 ms each

Hypotheses measured here:
  A. one merged s32[w,12] gather ~= cost of one s32[w,3] gather
     (halves per-round gather glue)
  B. folding the key into the int pack is ~free vs the 2.19 ms 1-D take
  C. a single row scatter-add [w/2,3] -> [w,3] ~= one channel's 1-D
     scatter (cuts tail deposits 3x)

Methodology (PERF_NOTES exp29 note): chained on-device iterations inside
one jit so kernel time dwarfs the ~37 ms tunnel RTT; inputs change every
iteration (rotating the permutation) to defeat tunnel memoization;
forced scalar readback.

Run from the repo root on the TPU: python experiments/exp30_glue_ops.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

W = 307200
H = W // 2
ITERS = 64


def timed(name, fn, *args):
    fn_j = jax.jit(fn)
    out = fn_j(*args)  # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn_j(*args)
    s = float(jnp.asarray(out).ravel()[0])  # forced readback
    dt = (time.perf_counter() - t0) * 1e3
    per = (dt - 37.0) / ITERS  # subtract the RTT floor once
    print(f"{name:34s} {dt:8.1f} ms total  ~{per:7.3f} ms/op  (chk {s:.3g})",
          flush=True)
    return per


def chain_gather(cols, key_col=False):
    """ITERS chained row gathers of an s32[W, cols] pack."""
    def run(pack, orders):
        def body(i, p):
            p = jnp.take(p, orders[i % 8], axis=0)
            return p + 1  # data dependence; keeps iterations serialized
        return jax.lax.fori_loop(0, ITERS, body, pack)
    return run


def main():
    rng = np.random.default_rng(0)
    orders = jnp.asarray(
        np.stack([rng.permutation(W) for _ in range(8)]), jnp.int32)
    horders = jnp.asarray(
        np.stack([rng.permutation(W)[:H] for _ in range(8)]), jnp.int32)
    print("devices:", jax.devices(), flush=True)

    # --- gathers -----------------------------------------------------------
    for cols in (1, 3, 9, 12, 13):
        pack = jnp.asarray(rng.integers(0, 1 << 20, (W, cols)), jnp.int32)
        timed(f"row gather s32[{W},{cols}]", chain_gather(cols), pack,
              orders)

    flat = jnp.asarray(rng.integers(0, 1 << 20, (W,)), jnp.int32)

    def run_flat(x, orders):
        def body(i, v):
            return jnp.take(v, orders[i % 8]) + 1
        return jax.lax.fori_loop(0, ITERS, body, x)
    timed(f"1-D gather s32[{W}]", run_flat, flat, orders)

    # --- scatters ----------------------------------------------------------
    vals1 = jnp.asarray(rng.random((H,)), jnp.float32)
    vals3 = jnp.asarray(rng.random((H, 3)), jnp.float32)
    vals4 = jnp.asarray(rng.random((H, 4)), jnp.float32)

    def run_sc1x3(vals, idxs):
        def body(i, outs):
            o = tuple(
                out.at[idxs[i % 8]].add(vals + i, mode="drop")
                for out in outs)
            return o
        outs = (jnp.zeros((W,), jnp.float32),) * 3
        return jax.lax.fori_loop(0, ITERS, body, outs)[0]

    def run_scrow(vals, idxs):
        def body(i, out):
            return out.at[idxs[i % 8]].add(vals + i, mode="drop")
        return jax.lax.fori_loop(
            0, ITERS, body, jnp.zeros((W, vals.shape[1]), jnp.float32))

    timed(f"scatter-add 1-D x3ch [{H}]->[{W}]", run_sc1x3, vals1, horders)
    timed(f"scatter-add rows [{H},3]->[{W},3]", run_scrow, vals3, horders)
    timed(f"scatter-add rows [{H},4]->[{W},4]", run_scrow, vals4, horders)


if __name__ == "__main__":
    main()
