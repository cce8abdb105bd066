"""exp10: where do the Pallas kernel's ~0.4-0.6 us/iteration go?

Known baselines (exp6c/exp9b + exp8 iteration counts): primaries band
5.77 ms / 9556 iters = 0.60 us/iter; sorted bounce-1 26.9 ms / 64460 iters
= 0.42 us/iter; all-dead dispatch 1.96 ms / 180 tiles = 11 us/tile.
Hypothesis: VMEM->scalar lane extracts (~8/iter internal, ~104/leaf) and
per-grid-step overhead dominate.

Stages:
  0. SMEM capacity probe (can the whole node table live in SMEM?)
  1. trivial copy kernel, 180 grid steps -> grid-step floor
  2. variant SMEM-nodes: bounds f32[M,6] + links i32[M,2] as whole-array
     SMEM operands, scalar loads replace lane extracts
  3. variant SMEM-nodes + leaf cluster row DMA'd VMEM->SMEM
  4. unroll-2 tree steps per while iteration (baseline layout)
"""
import sys, time, os, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exp6_pallas_trace import tile_order
from raytracer_tpu.core.fast_types import CLUSTER_SIZE, TRI_STRIDE
from raytracer_tpu.kernels.pallas_trace import (BLOCK_LANES, BLOCK_SUBLANES,
                                                pallas_traverse)
from raytracer_tpu.kernels.wavefront import sort_key


# ---------------- stage 0: SMEM capacity ----------------

def probe_smem():
    for kb in (64, 128, 256, 512, 1024, 2048):
        rows = kb * 1024 // (8 * 4)
        try:
            def k(x_ref, s_ref, o_ref):
                o_ref[:] = x_ref[:] + s_ref[0, 0]
            out = pl.pallas_call(
                k,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            )(jnp.ones((8, 128), jnp.float32),
              jnp.ones((rows, 8), jnp.float32))
            out.block_until_ready()
            print(f"stage0 SMEM {kb:5d} KB ({rows}x8 f32): OK", flush=True)
        except Exception as e:
            print(f"stage0 SMEM {kb:5d} KB: FAIL {str(e)[:120]}", flush=True)
            break


# ---------------- stage 1: grid-step floor ----------------

def grid_floor():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    rows = 180 * 8
    blk = pl.BlockSpec((8, 128), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    f = pl.pallas_call(k, grid=(180,), in_specs=[blk], out_specs=blk,
                       out_shape=jax.ShapeDtypeStruct((rows, 128),
                                                      jnp.float32))

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(x, n):
        def body(i, acc):
            return acc + f(x + i.astype(jnp.float32))[0, 0]
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    x = jnp.ones((rows, 128), jnp.float32)
    float(chain(x, 4))
    t0 = time.time(); float(chain(x, 4)); t4 = time.time() - t0
    t0 = time.time(); float(chain(x, 8)); t8 = time.time() - t0
    per = (t8 - t4) / 4
    print(f"stage1 copy-kernel 180 steps: {per*1e3:.3f} ms/dispatch "
          f"= {per/180*1e6:.2f} us/grid step", flush=True)


# ---------------- stage 2/3: SMEM-node kernels ----------------

def _mt_from_scalars(s, rox, roy, roz, rdx, rdy, rdz, hit, t_min, det_eps,
                     closest, state, flip_normals):
    """One triangle MT with scalar fetch function s(j)."""
    nx, ny, nz, ar, ag, ab, mt = state
    v0x, v0y, v0z = s(0), s(1), s(2)
    e1x, e1y, e1z = s(3) - v0x, s(4) - v0y, s(5) - v0z
    e2x, e2y, e2z = s(6) - v0x, s(7) - v0y, s(8) - v0z
    nrx = e1y * e2z - e1z * e2y
    nry = e1z * e2x - e1x * e2z
    nrz = e1x * e2y - e1y * e2x
    nlen = jnp.sqrt(nrx * nrx + nry * nry + nrz * nrz)
    inl = 1.0 / jnp.where(nlen > 0.0, nlen, 1.0)
    nux, nuy, nuz = nrx * inl, nry * inl, nrz * inl
    pvx = rdy * e2z - rdz * e2y
    pvy = rdz * e2x - rdx * e2z
    pvz = rdx * e2y - rdy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    ok = ~((det > -det_eps) & (det < det_eps))
    invd = 1.0 / jnp.where(ok, det, 1.0)
    sx, sy, sz = rox - v0x, roy - v0y, roz - v0z
    u = invd * (sx * pvx + sy * pvy + sz * pvz)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = invd * (rdx * qx + rdy * qy + rdz * qz)
    tt = invd * (e2x * qx + e2y * qy + e2z * qz)
    ok &= (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
    ok &= (tt > t_min) & (tt < closest) & hit
    if flip_normals:
        flip = (rdx * nux + rdy * nuy + rdz * nuz) > 0.0
        sgn = jnp.where(flip, -1.0, 1.0)
    else:
        sgn = 1.0
    closest = jnp.where(ok, tt, closest)
    nx = jnp.where(ok, sgn * nux, nx)
    ny = jnp.where(ok, sgn * nuy, ny)
    nz = jnp.where(ok, sgn * nuz, nz)
    ar = jnp.where(ok, s(9), ar)
    ag = jnp.where(ok, s(10), ag)
    ab = jnp.where(ok, s(11), ab)
    mt = jnp.where(ok, s(12), mt)
    return closest, (nx, ny, nz, ar, ag, ab, mt)


def make_smem_kernel(leaf_dma: bool):
    def kernel(num_ref, bounds_ref, links_ref, clusters_ref,
               rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
               act_ref, t_ref, nx_ref, ny_ref, nz_ref,
               ar_ref, ag_ref, ab_ref, mt_ref, *scratch,
               t_min, t_max, det_eps, flip_normals):
        num_nodes = num_ref[0]
        rox, roy, roz = rox_ref[:], roy_ref[:], roz_ref[:]
        rdx, rdy, rdz = rdx_ref[:], rdy_ref[:], rdz_ref[:]
        ivx, ivy, ivz = 1.0 / rdx, 1.0 / rdy, 1.0 / rdz
        active = act_ref[:] > 0.5
        shape = rox.shape
        t_ref[:] = jnp.full(shape, t_max, jnp.float32)
        zero = jnp.zeros(shape, jnp.float32)
        for ref in (nx_ref, ny_ref, nz_ref, ar_ref, ag_ref, ab_ref, mt_ref):
            ref[:] = zero
        node0 = jnp.where(jnp.any(active), jnp.int32(0), num_nodes)

        def cond(node):
            return node < num_nodes

        def body(node):
            skip = links_ref[node, 0]
            col7 = links_ref[node, 1]

            def axis(lo, hi, ro, iv):
                q0 = (bounds_ref[node, lo] - ro) * iv
                q1 = (bounds_ref[node, hi] - ro) * iv
                return jnp.minimum(q0, q1), jnp.maximum(q0, q1)

            e0, x0 = axis(0, 3, rox, ivx)
            e1_, x1 = axis(1, 4, roy, ivy)
            e2_, x2 = axis(2, 5, roz, ivz)
            t_enter = jnp.maximum(e0, jnp.maximum(e1_, e2_))
            t_exit = jnp.minimum(x0, jnp.minimum(x1, x2))
            closest = t_ref[:]
            hit = ((t_exit > t_enter) & (t_exit > t_min)
                   & (t_enter < closest) & active)
            anyhit = jnp.any(hit)
            is_leaf = col7 >= 0

            @pl.when(anyhit & is_leaf)
            def _():
                closest = t_ref[:]
                state = (nx_ref[:], ny_ref[:], nz_ref[:],
                         ar_ref[:], ag_ref[:], ab_ref[:], mt_ref[:])
                if leaf_dma:
                    crow_s, sem = scratch
                    dma = pltpu.make_async_copy(
                        clusters_ref.at[col7], crow_s, sem)
                    dma.start()
                    dma.wait()
                    fetch = lambda j: crow_s[j]
                else:
                    crow = clusters_ref[pl.ds(col7, 1), :]
                    fetch = lambda j: crow[0, j]
                for k in range(CLUSTER_SIZE):
                    b = k * TRI_STRIDE
                    closest, state = _mt_from_scalars(
                        lambda j, b=b: fetch(b + j),
                        rox, roy, roz, rdx, rdy, rdz, hit,
                        t_min, det_eps, closest, state, flip_normals)
                t_ref[:] = closest
                (nx_ref[:], ny_ref[:], nz_ref[:], ar_ref[:], ag_ref[:],
                 ab_ref[:], mt_ref[:]) = state

            return jnp.where(anyhit & (col7 < 0), -col7 - jnp.int32(1),
                             skip)

        jax.lax.while_loop(cond, body, node0)

    return kernel


@functools.partial(jax.jit, static_argnames=("leaf_dma",))
def smem_traverse(bounds, links, clusters, num_nodes, comps, leaf_dma):
    rows = comps[0].shape[0]
    grid = rows // BLOCK_SUBLANES
    block = pl.BlockSpec((BLOCK_SUBLANES, BLOCK_LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    kernel = functools.partial(make_smem_kernel(leaf_dma),
                               t_min=1e-3, t_max=1e9, det_eps=1e-5,
                               flip_normals=True)
    out = jax.ShapeDtypeStruct((rows, BLOCK_LANES), jnp.float32)
    scratch = ([pltpu.SMEM((128,), jnp.float32),
                pltpu.SemaphoreType.DMA] if leaf_dma else [])
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[smem, smem, smem,
                  pl.BlockSpec(memory_space=pltpu.VMEM)] + [block] * 7,
        out_shape=(out,) * 8,
        out_specs=(block,) * 8,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(num_nodes, bounds, links, clusters, *comps)


def main():
    print("devices:", jax.devices(), flush=True)
    probe_smem()
    grid_floor()

    from raytracer_tpu.core.camera import default_camera
    from raytracer_tpu.core.types import RenderConfig
    from raytracer_tpu.kernels.tracer import (initial_seed,
                                              make_primary_rays, shade)
    from __graft_entry__ import _flagship_scene

    fs = _flagship_scene()
    nodes = np.asarray(fs.nodes8)
    m = nodes.shape[0]
    bounds = jnp.asarray(nodes[:, 0:6])                       # f32[M, 6]
    links = jnp.asarray(nodes[:, 6:8].view(np.int32))         # i32[M, 2]
    print(f"node table: {m} rows -> SMEM {(m*6*4 + m*2*4)//1024} KB",
          flush=True)

    W, H = 1280, 144
    P = W * H
    cfg = RenderConfig(width=W, height=H)
    cam = default_camera(1280, 720)
    uni = cam.uniforms()
    ty, tx = tile_order(H, W, 16, 64)
    yyt, xxt = jnp.asarray(ty + 288), jnp.asarray(tx)
    pixj = (yyt * W + xxt).astype(jnp.uint32)
    ones = jnp.ones((P,), bool)

    def to_comps(o, d, a):
        rows = P // BLOCK_LANES
        return tuple(c.reshape(rows, BLOCK_LANES)
                     for c in (*o, *d)) + (
            a.astype(jnp.float32).reshape(rows, BLOCK_LANES),)

    # primaries + sorted bounce-1 ray populations
    @jax.jit
    def gen(scene, u):
        s = initial_seed(u, cfg, pixj, 0)
        s, o, d = make_primary_rays(u, cfg, s, xxt, yyt, 720)
        r = pallas_traverse(scene, o, d, ones, cfg)
        zero = jnp.zeros((P,), jnp.float32)
        one = jnp.ones((P,), jnp.float32)
        o1, d1, col, att, s, alive1 = shade(
            r, o, d, (zero,)*3, (one,)*3, s, ones, jnp.bool_(True), cfg)
        smin = tuple(scene.nodes8[0, ax] for ax in range(3))
        smax = tuple(scene.nodes8[0, 3 + ax] for ax in range(3))
        key = sort_key(o1, d1, alive1, smin, smax)
        order = jnp.argsort(key)
        o1 = tuple(jnp.take(c, order) for c in o1)
        d1 = tuple(jnp.take(c, order) for c in d1)
        alive1 = jnp.take(alive1, order)
        return o, d, o1, d1, alive1

    po, pd, b1o, b1d, b1a = gen(fs, uni)
    pops = {"primaries": to_comps(po, pd, ones),
            "bounce1-sorted": to_comps(b1o, b1d, b1a)}
    num = jnp.asarray(fs.num_nodes, jnp.int32).reshape(1)

    @functools.partial(jax.jit, static_argnames=("k", "leaf_dma"))
    def chain(comps, salt, k, leaf_dma):
        def body(i, acc):
            cc = (comps[0] + (salt + i).astype(jnp.float32) * 1e-12,
                  *comps[1:])
            outs = smem_traverse(bounds, links, fs.clusters, num, cc,
                                 leaf_dma)
            return acc + jnp.sum(outs[0] * (outs[0] < 1e8))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    def timed(fn, k, reps=3):
        float(fn(k=k))
        t0 = time.time()
        for _ in range(reps):
            float(fn(k=k))
        return (time.time() - t0) / reps

    # correctness spot check vs production kernel
    for name, comps in pops.items():
        for leaf_dma in (False, True):
            try:
                outs = smem_traverse(bounds, links, fs.clusters, num,
                                     comps, leaf_dma)
            except Exception as e:
                print(f"stage2/3 {name} leaf_dma={leaf_dma}: "
                      f"COMPILE FAIL {str(e)[:200]}", flush=True)
                continue
            o = po if name == "primaries" else b1o
            d = pd if name == "primaries" else b1d
            a = ones if name == "primaries" else b1a
            ref = pallas_traverse(fs, o, d, a, cfg)
            got = outs[0].reshape(P)
            want = jnp.where(ref.closest_t < cfg.t_max, ref.closest_t, 1e9)
            bad = int(jnp.sum(jnp.abs(jnp.minimum(got, 1e9) - want) > 2e-3))
            fn = functools.partial(chain, comps, jnp.uint32(3),
                                   leaf_dma=leaf_dma)
            t2, t4 = timed(fn, 2), timed(fn, 4)
            per = (t4 - t2) / 2
            print(f"stage2/3 {name:15s} leaf_dma={int(leaf_dma)}: "
                  f"{per*1e3:7.2f} ms/traversal (bad={bad}) "
                  f"[vs baseline {'5.77' if name=='primaries' else '26.9'}]",
                  flush=True)


if __name__ == "__main__":
    main()
