"""exp7: which scalar-access patterns does this Mosaic lower?

Each probe is a tiny pallas_call compiled for TPU; prints OK/FAIL + error
head. Informs the pallas_trace design (VMEM row -> per-lane scalars).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import traceback

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np


def run(name, fn):
    try:
        out = fn()
        print(f"{name}: OK {np.asarray(out).ravel()[:4]}", flush=True)
    except Exception as e:
        msg = str(e).split("\n")
        head = next((l for l in msg if l.strip()), "")[:160]
        detail = next((l for l in msg if "Not implemented" in l
                       or "error" in l.lower()), "")[:160]
        print(f"{name}: FAIL {head} | {detail}", flush=True)


TAB = jnp.arange(64, dtype=jnp.float32).reshape(8, 8)
RAYS = jnp.ones((8, 128), jnp.float32)


def probe_extract_scalar():
    # vector load [1,8] then python-index scalar extract -> broadcast mul
    def k(tab_ref, rays_ref, o_ref):
        row = tab_ref[pl.ds(2, 1), :]
        s = row[0, 3]
        o_ref[:] = rays_ref[:] * s
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(TAB, RAYS)


def probe_extract_dyn():
    # dynamic row index from SMEM, scalar extract
    def k(i_ref, tab_ref, rays_ref, o_ref):
        row = tab_ref[pl.ds(i_ref[0], 1), :]
        o_ref[:] = rays_ref[:] * row[0, 3]
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(
            jnp.array([2], jnp.int32), TAB, RAYS)


def probe_direct_scalar_load():
    # direct scalar indexing of a VMEM ref (no vector load)
    def k(i_ref, tab_ref, rays_ref, o_ref):
        s = tab_ref[i_ref[0], 3]
        o_ref[:] = rays_ref[:] * s
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(
            jnp.array([2], jnp.int32), TAB, RAYS)


def probe_two_step_broadcast():
    def k(tab_ref, rays_ref, o_ref):
        row = tab_ref[pl.ds(2, 1), :]          # [1, 8]
        c = row[0:1, 3:4]                       # [1, 1]
        c8 = jnp.broadcast_to(c, (8, 1))
        o_ref[:] = rays_ref[:] * jnp.broadcast_to(c8, (8, 128))
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(TAB, RAYS)


def probe_smem_table_input():
    # medium i32 table fully in SMEM (16k x 2) + scalar reads
    links = jnp.stack([jnp.arange(16384, dtype=jnp.int32)] * 2, -1)
    def k(l_ref, rays_ref, o_ref):
        s = l_ref[7, 1]
        o_ref[:] = rays_ref[:] * s.astype(jnp.float32)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(links, RAYS)


def probe_dma_row_to_smem():
    # DMA one VMEM table row -> SMEM scratch, then scalar reads
    def k(tab_ref, rays_ref, o_ref, srow, sem):
        dma = pltpu.make_async_copy(tab_ref.at[pl.ds(2, 1), :], srow, sem)
        dma.start()
        dma.wait()
        o_ref[:] = rays_ref[:] * srow[0, 3]
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1, 8), jnp.float32),
                        pltpu.SemaphoreType.DMA])(TAB, RAYS)


def probe_while_scalar_carry():
    # while loop, scalar carry, scalar VMEM-load-dependent exit
    def k(i_ref, tab_ref, rays_ref, o_ref):
        def cond(n):
            return n < 6
        def body(n):
            row = tab_ref[pl.ds(n, 1), :]
            return n + row[0, 0].astype(jnp.int32) + 1
        n = jax.lax.while_loop(cond, body, i_ref[0])
        o_ref[:] = rays_ref[:] * n.astype(jnp.float32)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(
            jnp.array([0], jnp.int32), TAB, RAYS)


def probe_bitcast_extract():
    def k(tab_ref, rays_ref, o_ref):
        row = tab_ref[pl.ds(2, 1), :]
        i = jax.lax.bitcast_convert_type(row[:, 6:8], jnp.int32)
        s = i[0, 0]
        o_ref[:] = rays_ref[:] * s.astype(jnp.float32)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(TAB, RAYS)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    run("extract_scalar", probe_extract_scalar)
    run("extract_dyn", probe_extract_dyn)
    run("direct_scalar_load", probe_direct_scalar_load)
    run("two_step_broadcast", probe_two_step_broadcast)
    run("smem_table_input", probe_smem_table_input)
    run("dma_row_to_smem", probe_dma_row_to_smem)
    run("while_scalar_carry", probe_while_scalar_carry)
    run("bitcast_extract", probe_bitcast_extract)
