"""exp11: node bounds from SMEM — padded-row DMAs that actually compile.

exp10c/d failed: [8]-float DMAs break Mosaic broadcasting, scalar bitcast
is not an op, [2]-i32 DMAs 500 the remote compiler. This round pads node
rows to the *proven* leaf shape — [*, 128] f32 rows, links stored as exact
float ints (|v| < 2^24), decoded with a scalar f32->i32 convert.

Variants (all keep the production leaf-cluster DMA):
  base      production kernel body: bounds via VMEM lane extracts
  nodepad   node j at row j of f32[M,128]; DMA row -> SMEM every iteration,
            bounds + links as SMEM scalar loads
  nodepack  16 nodes per 128-float row; DMA only when the row changes
            (pre-order left child = node+1 -> same row 15/16 of downward
            edges); dynamic SMEM offset (node%16)*8
  spec2     nodepad + dual speculative prefetch: while the slab test and
            any() reduction run, BOTH successor rows (left, skip) are
            already DMA-ing into two SMEM slots; select by scalar where
"""
import sys, time, os, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exp6_pallas_trace import tile_order
from exp10b_scalar_cost import _mt
from raytracer_tpu.core.fast_types import CLUSTER_SIZE, TRI_STRIDE
from raytracer_tpu.kernels.pallas_trace import pallas_traverse
from raytracer_tpu.kernels.wavefront import sort_key

LANES = 128


def make_kernel(variant):
    def kernel(num_ref, nodes_ref, npad_ref, clusters_ref,
               rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
               act_ref, t_ref,
               rowa_s, rowb_s, crow_s, sema, semb, semc,
               *, t_min, t_max, det_eps):
        num_nodes = num_ref[0]
        rox, roy, roz = rox_ref[:], roy_ref[:], roz_ref[:]
        rdx, rdy, rdz = rdx_ref[:], rdy_ref[:], rdz_ref[:]
        ivx, ivy, ivz = 1.0 / rdx, 1.0 / rdy, 1.0 / rdz
        active = act_ref[:] > 0.5
        shape = rox.shape
        t_ref[:] = jnp.full(shape, t_max, jnp.float32)

        any_active = jnp.any(active)
        node0 = jnp.where(any_active, jnp.int32(0), num_nodes)

        def leafwork(col7, hit):
            dma = pltpu.make_async_copy(clusters_ref.at[col7], crow_s, semc)
            dma.start()
            dma.wait()
            closest = t_ref[:]
            for k in range(CLUSTER_SIZE):
                b = k * TRI_STRIDE
                s = lambda j, b=b: crow_s[b + j]
                tt, ok = _mt(s, (rox, roy, roz), (rdx, rdy, rdz),
                             hit, t_min, det_eps, closest)
                closest = jnp.where(ok, tt, closest)
            t_ref[:] = closest

        def slab(g, closest):
            def axis(lo, hi, ro, iv):
                q0 = (g(lo) - ro) * iv
                q1 = (g(hi) - ro) * iv
                return jnp.minimum(q0, q1), jnp.maximum(q0, q1)

            e0, x0 = axis(0, 3, rox, ivx)
            e1_, x1 = axis(1, 4, roy, ivy)
            e2_, x2 = axis(2, 5, roz, ivz)
            t_en = jnp.maximum(e0, jnp.maximum(e1_, e2_))
            t_ex = jnp.minimum(x0, jnp.minimum(x1, x2))
            return ((t_ex > t_en) & (t_ex > t_min)
                    & (t_en < closest) & active)

        if variant == "spec2":
            # rowa = row for the left-child candidate, rowb = skip
            # candidate. Bootstrap: root row into rowa, sel=0.
            dma = pltpu.make_async_copy(npad_ref.at[0], rowa_s, sema)
            dma.start()
            dma.wait()

            def cond(c):
                return c[0] < num_nodes

            def body(c):
                node, sel = c
                # Read the current row out of the selected slot first
                # (the slots are about to be overwritten).
                fsel = (sel == 1)

                def g(j):
                    return jnp.where(fsel, rowb_s[j], rowa_s[j])

                vals = [g(j) for j in range(8)]
                skip = vals[6].astype(jnp.int32)
                col7 = vals[7].astype(jnp.int32)
                is_leaf = col7 >= 0
                nl = jnp.where(is_leaf, skip, -col7 - jnp.int32(1))
                sa = jnp.where(nl < num_nodes, nl, 0)
                sb = jnp.where(skip < num_nodes, skip, 0)
                da = pltpu.make_async_copy(npad_ref.at[sa], rowa_s, sema)
                db = pltpu.make_async_copy(npad_ref.at[sb], rowb_s, semb)
                da.start()
                db.start()

                closest = t_ref[:]
                hit = slab(lambda j: vals[j], closest)
                anyhit = jnp.any(hit)

                @pl.when(anyhit & is_leaf)
                def _():
                    leafwork(col7, hit)

                da.wait()
                db.wait()
                go_left = anyhit & ~is_leaf
                nxt = jnp.where(go_left, nl, skip)
                nsel = jnp.where(go_left, jnp.int32(0), jnp.int32(1))
                return nxt, nsel

            jax.lax.while_loop(cond, body, (node0, jnp.int32(0)))
            return

        if variant == "nodepack":
            def cond(c):
                return c[0] < num_nodes

            def body(c):
                node, cur_row = c
                safe = jnp.where(node < num_nodes, node, 0)
                row = safe // 16
                off = (safe % 16) * 8

                @pl.when(row != cur_row)
                def _():
                    dma = pltpu.make_async_copy(npad_ref.at[row],
                                                rowa_s, sema)
                    dma.start()
                    dma.wait()

                def g(j):
                    return rowa_s[off + j]

                skip = g(6).astype(jnp.int32)
                col7 = g(7).astype(jnp.int32)
                closest = t_ref[:]
                hit = slab(g, closest)
                anyhit = jnp.any(hit)
                is_leaf = col7 >= 0

                @pl.when(anyhit & is_leaf)
                def _():
                    leafwork(col7, hit)

                nxt = jnp.where(anyhit & ~is_leaf, -col7 - jnp.int32(1),
                                skip)
                return nxt, row

            jax.lax.while_loop(cond, body, (node0, jnp.int32(-1)))
            return

        def cond(node):
            return node < num_nodes

        def body(node):
            if variant == "nodepad":
                dma = pltpu.make_async_copy(npad_ref.at[node], rowa_s,
                                            sema)
                dma.start()
                dma.wait()
                g = lambda j: rowa_s[j]
                skip = g(6).astype(jnp.int32)
                col7 = g(7).astype(jnp.int32)
            else:  # base: production bounds path
                nrow = nodes_ref[pl.ds(node, 1), :]
                icols = jax.lax.bitcast_convert_type(nrow[:, 6:8],
                                                     jnp.int32)
                skip, col7 = icols[0, 0], icols[0, 1]
                g = lambda j: nrow[0, j]

            closest = t_ref[:]
            hit = slab(g, closest)
            anyhit = jnp.any(hit)
            is_leaf = col7 >= 0

            @pl.when(anyhit & is_leaf)
            def _():
                leafwork(col7, hit)

            return jnp.where(anyhit & ~is_leaf, -col7 - jnp.int32(1),
                             skip)

        jax.lax.while_loop(cond, body, node0)

    return kernel


@functools.partial(jax.jit, static_argnames=("variant", "sub", "interpret"))
def traverse_t(nodes, npad, clusters, num_nodes, comps, variant, sub,
               interpret=False):
    rows = comps[0].shape[0]
    grid = rows // sub
    block = pl.BlockSpec((sub, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    resident = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(make_kernel(variant),
                               t_min=1e-3, t_max=1e9, det_eps=1e-5)
    out = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    scratch = [pltpu.SMEM((128,), jnp.float32),
               pltpu.SMEM((128,), jnp.float32),
               pltpu.SMEM((128,), jnp.float32),
               pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
               pltpu.SemaphoreType.DMA]
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  resident, resident, resident] + [block] * 7,
        out_shape=(out,),
        out_specs=(block,),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(num_nodes, nodes, npad, clusters, *comps)[0]


def build_tables(fs, variant):
    nodes = np.asarray(fs.nodes8)
    m = nodes.shape[0]
    links = nodes[:, 6:8].view(np.int32).astype(np.float32)
    if variant == "nodepack":
        rows = (m + 15) // 16
        pad = np.zeros((rows, 128), np.float32)
        flat = np.concatenate([nodes[:, :6], links], axis=1)  # [m, 8]
        pad.reshape(rows * 16, 8)[:m] = flat
        return jnp.asarray(pad)
    pad = np.zeros((m, 128), np.float32)
    pad[:, :6] = nodes[:, :6]
    pad[:, 6:8] = links
    return jnp.asarray(pad)


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
    ty, tx = tile_order(H, W, 16, 256)
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
        return o, d, o1, d1, alive1

    po, pd, b1o, b1d, b1a = gen(fs, uni)

    def to_comps(o, d, a):
        rows = P // LANES
        return tuple(c.reshape(rows, LANES) for c in (*o, *d)) + (
            a.astype(jnp.float32).reshape(rows, LANES),)

    # production sublanes: primaries 32, bounce rounds 16
    pops = {"primaries": (to_comps(po, pd, ones), po, pd, ones, 32),
            "bounce1": (to_comps(b1o, b1d, b1a), b1o, b1d, b1a, 16)}
    num = jnp.asarray(fs.num_nodes, jnp.int32).reshape(1)
    dummy_pad = jnp.zeros((8, 128), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("k", "variant", "sub"))
    def chain(comps, npad, salt, k, variant, sub):
        def body(i, acc):
            cc = (comps[0] + (salt + i).astype(jnp.float32) * 1e-12,
                  *comps[1:])
            t = traverse_t(fs.nodes8, npad, fs.clusters, num, cc,
                           variant, sub)
            return acc + jnp.sum(t * (t < 1e8))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    def timed(fn, k, reps=3):
        float(fn(k=k))
        t0 = time.time()
        for _ in range(reps):
            float(fn(k=k))
        return (time.time() - t0) / reps

    base = {"primaries": 1.43, "bounce1": 19.67}  # S=32/16 sweep numbers
    for variant in ("base", "nodepad", "nodepack", "spec2"):
        npad = (dummy_pad if variant == "base"
                else build_tables(fs, variant))
        for name, (comps, o, d, a, sub) in pops.items():
            try:
                t = traverse_t(fs.nodes8, npad, fs.clusters, num, comps,
                               variant, sub)
                t.block_until_ready()
            except Exception as e:
                print(f"{variant:9s} {name:9s}: COMPILE FAIL "
                      f"{str(e)[:200]}", flush=True)
                continue
            ref = pallas_traverse(fs, o, d, a, cfg,
                                  sublanes=sub)
            want = jnp.where(ref.closest_t < cfg.t_max,
                             ref.closest_t, 1e9)
            bad = int(jnp.sum(jnp.abs(
                jnp.minimum(t.reshape(P), 1e9) - want) > 2e-3))
            fn = functools.partial(chain, comps, npad, jnp.uint32(3),
                                   variant=variant, sub=sub)
            t2, t4 = timed(fn, 2), timed(fn, 4)
            per = (t4 - t2) / 2
            print(f"{variant:9s} {name:9s}: {per*1e3:7.2f} ms "
                  f"(bad={bad}, sweep-baseline {base[name]})", flush=True)


if __name__ == "__main__":
    main()
