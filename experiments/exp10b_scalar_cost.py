"""exp10b: isolate + attack the Pallas kernel's scalar-path cost.

SMEM capacity is tiny (2 KB OK, 64 KB fails) — whole-table SMEM is out.
Variants vs the production kernel (baseline 5.77 ms primaries / 26.9 ms
sorted bounce-1 on the 184k band):

  const_bounds   slab test against hardcoded scene-box constants (WRONG
                 results, control only): if extracts dominate, this flies
  dma_row        node row DMA'd VMEM->SMEM each iteration; scalar loads
  dma_leaf       baseline internal iteration; leaf cluster row DMA'd to
                 SMEM, MT scalars from SMEM
  interleave2    [16,128] block = two 1024-ray tiles with two pointers
                 advanced in one loop (scalar latency overlap)
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
from raytracer_tpu.kernels.pallas_trace import pallas_traverse
from raytracer_tpu.kernels.wavefront import sort_key

LANES = 128


def make_kernel(variant):
    def kernel(num_ref, nodes_ref, clusters_ref,
               rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
               act_ref, t_ref, *scratch, t_min, t_max, det_eps):
        num_nodes = num_ref[0]
        rox, roy, roz = rox_ref[:], roy_ref[:], roz_ref[:]
        rdx, rdy, rdz = rdx_ref[:], rdy_ref[:], rdz_ref[:]
        ivx, ivy, ivz = 1.0 / rdx, 1.0 / rdy, 1.0 / rdz
        active = act_ref[:] > 0.5
        shape = rox.shape
        t_ref[:] = jnp.full(shape, t_max, jnp.float32)

        if variant == "interleave2":
            half = shape[0] // 2  # 8 sublanes per tile
            act_a = jnp.any(act_ref[0:half, :] > 0.5)
            act_b = jnp.any(act_ref[half:, :] > 0.5)
            node0 = (jnp.where(act_a, jnp.int32(0), num_nodes),
                     jnp.where(act_b, jnp.int32(0), num_nodes))

            def cond(c):
                return (c[0] < num_nodes) | (c[1] < num_nodes)

            def body(c):
                na, nb = c
                sa = jnp.where(na < num_nodes, na, 0)
                sb = jnp.where(nb < num_nodes, nb, 0)
                rowa = nodes_ref[pl.ds(sa, 1), :]
                rowb = nodes_ref[pl.ds(sb, 1), :]

                def walk(nrow, node, rows_lo, rows_hi):
                    icols = jax.lax.bitcast_convert_type(
                        nrow[:, 6:8], jnp.int32)
                    skip, col7 = icols[0, 0], icols[0, 1]
                    ro = (rox[rows_lo:rows_hi], roy[rows_lo:rows_hi],
                          roz[rows_lo:rows_hi])
                    iv = (ivx[rows_lo:rows_hi], ivy[rows_lo:rows_hi],
                          ivz[rows_lo:rows_hi])

                    def axis(lo, hi, o, i):
                        q0 = (nrow[0, lo] - o) * i
                        q1 = (nrow[0, hi] - o) * i
                        return jnp.minimum(q0, q1), jnp.maximum(q0, q1)

                    e0, x0 = axis(0, 3, ro[0], iv[0])
                    e1_, x1 = axis(1, 4, ro[1], iv[1])
                    e2_, x2 = axis(2, 5, ro[2], iv[2])
                    t_en = jnp.maximum(e0, jnp.maximum(e1_, e2_))
                    t_ex = jnp.minimum(x0, jnp.minimum(x1, x2))
                    closest = t_ref[rows_lo:rows_hi, :]
                    hit = ((t_ex > t_en) & (t_ex > t_min)
                           & (t_en < closest)
                           & (act_ref[rows_lo:rows_hi, :] > 0.5))
                    anyhit = jnp.any(hit)
                    is_leaf = col7 >= 0

                    @pl.when(anyhit & is_leaf & (node < num_nodes))
                    def _():
                        crow = clusters_ref[pl.ds(col7, 1), :]
                        closest = t_ref[rows_lo:rows_hi, :]
                        for k in range(CLUSTER_SIZE):
                            b = k * TRI_STRIDE
                            s = lambda j, b=b: crow[0, b + j]
                            tt, ok = _mt(s, ro, (rdx[rows_lo:rows_hi],
                                                 rdy[rows_lo:rows_hi],
                                                 rdz[rows_lo:rows_hi]),
                                         hit, t_min, det_eps, closest)
                            closest = jnp.where(ok, tt, closest)
                        t_ref[rows_lo:rows_hi, :] = closest

                    nxt = jnp.where(anyhit & (col7 < 0),
                                    -col7 - jnp.int32(1), skip)
                    return jnp.where(node < num_nodes, nxt, node)

                na2 = walk(rowa, na, 0, half)
                nb2 = walk(rowb, nb, half, shape[0])
                return na2, nb2

            jax.lax.while_loop(cond, body, node0)
            return

        node0 = jnp.where(jnp.any(active), jnp.int32(0), num_nodes)

        def cond(node):
            return node < num_nodes

        def body(node):
            if variant == "dma_row":
                row_s, sem = scratch[0], scratch[2]
                dma = pltpu.make_async_copy(
                    nodes_ref.at[node], row_s, sem)
                dma.start()
                dma.wait()
                bget = lambda j: row_s[j]
                li = jax.lax.bitcast_convert_type(
                    jnp.stack([row_s[6], row_s[7]]), jnp.int32)
                skip, col7 = li[0], li[1]
            else:
                nrow = nodes_ref[pl.ds(node, 1), :]
                icols = jax.lax.bitcast_convert_type(nrow[:, 6:8],
                                                     jnp.int32)
                skip, col7 = icols[0, 0], icols[0, 1]
                if variant == "const_bounds":
                    consts = [-160.0, -12.0, -160.0, 160.0, 40.0, 160.0]
                    bget = lambda j: jnp.float32(consts[j])
                else:
                    bget = lambda j: nrow[0, j]

            def axis(lo, hi, ro, iv):
                q0 = (bget(lo) - ro) * iv
                q1 = (bget(hi) - ro) * iv
                return jnp.minimum(q0, q1), jnp.maximum(q0, q1)

            e0, x0 = axis(0, 3, rox, ivx)
            e1_, x1 = axis(1, 4, roy, ivy)
            e2_, x2 = axis(2, 5, roz, ivz)
            t_en = jnp.maximum(e0, jnp.maximum(e1_, e2_))
            t_ex = jnp.minimum(x0, jnp.minimum(x1, x2))
            closest = t_ref[:]
            hit = ((t_ex > t_en) & (t_ex > t_min)
                   & (t_en < closest) & active)
            anyhit = jnp.any(hit)
            is_leaf = col7 >= 0

            @pl.when(anyhit & is_leaf)
            def _():
                closest = t_ref[:]
                if variant == "dma_leaf":
                    crow_s, sem = scratch[1], scratch[3]
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
                    s = lambda j, b=b: fetch(b + j)
                    tt, ok = _mt(s, (rox, roy, roz), (rdx, rdy, rdz),
                                 hit, t_min, det_eps, closest)
                    closest = jnp.where(ok, tt, closest)
                t_ref[:] = closest

            return jnp.where(anyhit & (col7 < 0), -col7 - jnp.int32(1),
                             skip)

        jax.lax.while_loop(cond, body, node0)

    return kernel


def _mt(s, ro, rd, hit, t_min, det_eps, closest):
    v0x, v0y, v0z = s(0), s(1), s(2)
    e1x, e1y, e1z = s(3) - v0x, s(4) - v0y, s(5) - v0z
    e2x, e2y, e2z = s(6) - v0x, s(7) - v0y, s(8) - v0z
    rox, roy, roz = ro
    rdx, rdy, rdz = rd
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
    return tt, ok


@functools.partial(jax.jit, static_argnames=("variant",))
def traverse_t(nodes, clusters, num_nodes, comps, variant):
    rows = comps[0].shape[0]
    sub = 16 if variant == "interleave2" else 8
    grid = rows // sub
    block = pl.BlockSpec((sub, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    resident = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(make_kernel(variant),
                               t_min=1e-3, t_max=1e9, det_eps=1e-5)
    out = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    scratch = []
    if variant in ("dma_row", "dma_leaf"):
        scratch = [pltpu.SMEM((8,), jnp.float32),
                   pltpu.SMEM((128,), jnp.float32),
                   pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA]
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  resident, resident] + [block] * 7,
        out_shape=(out,),
        out_specs=(block,),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(num_nodes, nodes, clusters, *comps)[0]


def main():
    from raytracer_tpu.core.camera import default_camera
    from raytracer_tpu.core.types import RenderConfig
    from raytracer_tpu.kernels.tracer import (initial_seed,
                                              make_primary_rays, shade)
    from __graft_entry__ import _flagship_scene

    print("devices:", jax.devices(), flush=True)
    fs = _flagship_scene()
    W, H = 1280, 144
    P = W * H
    cfg = RenderConfig(width=W, height=H)
    cam = default_camera(1280, 720)
    uni = cam.uniforms()
    ty, tx = tile_order(H, W, 16, 64)
    yyt, xxt = jnp.asarray(ty + 288), jnp.asarray(tx)
    pixj = (yyt * W + xxt).astype(jnp.uint32)
    ones = jnp.ones((P,), bool)

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
        order = jnp.argsort(sort_key(o1, d1, alive1, smin, smax))
        o1 = tuple(jnp.take(c, order) for c in o1)
        d1 = tuple(jnp.take(c, order) for c in d1)
        alive1 = jnp.take(alive1, order)
        return o, d, o1, d1, alive1, r.closest_t

    po, pd, b1o, b1d, b1a, pt = gen(fs, uni)

    def to_comps(o, d, a):
        rows = P // LANES
        return tuple(c.reshape(rows, LANES) for c in (*o, *d)) + (
            a.astype(jnp.float32).reshape(rows, LANES),)

    pops = {"primaries": (to_comps(po, pd, ones), po, pd, ones),
            "bounce1": (to_comps(b1o, b1d, b1a), b1o, b1d, b1a)}
    num = jnp.asarray(fs.num_nodes, jnp.int32).reshape(1)

    @functools.partial(jax.jit, static_argnames=("k", "variant"))
    def chain(comps, salt, k, variant):
        def body(i, acc):
            cc = (comps[0] + (salt + i).astype(jnp.float32) * 1e-12,
                  *comps[1:])
            t = traverse_t(fs.nodes8, fs.clusters, num, cc, variant)
            return acc + jnp.sum(t * (t < 1e8))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    def timed(fn, k, reps=3):
        float(fn(k=k))
        t0 = time.time()
        for _ in range(reps):
            float(fn(k=k))
        return (time.time() - t0) / reps

    base = {"primaries": 5.77, "bounce1": 26.9}
    for variant in ("baseline1out", "const_bounds", "dma_row", "dma_leaf",
                    "interleave2"):
        v = "baseline" if variant == "baseline1out" else variant
        for name, (comps, o, d, a) in pops.items():
            try:
                t = traverse_t(fs.nodes8, fs.clusters, num, comps, v)
            except Exception as e:
                print(f"{variant:13s} {name:9s}: COMPILE FAIL "
                      f"{str(e)[:160]}", flush=True)
                continue
            if v in ("baseline", "dma_row", "dma_leaf", "interleave2"):
                ref = pallas_traverse(fs, o, d, a, cfg)
                want = jnp.where(ref.closest_t < cfg.t_max,
                                 ref.closest_t, 1e9)
                bad = int(jnp.sum(jnp.abs(
                    jnp.minimum(t.reshape(P), 1e9) - want) > 2e-3))
            else:
                bad = -1  # control variant, wrong by design
            fn = functools.partial(chain, comps, jnp.uint32(3), variant=v)
            t2, t4 = timed(fn, 2), timed(fn, 4)
            per = (t4 - t2) / 2
            print(f"{variant:13s} {name:9s}: {per*1e3:7.2f} ms "
                  f"(bad={bad}, baseline {base[name]})", flush=True)


if __name__ == "__main__":
    main()
