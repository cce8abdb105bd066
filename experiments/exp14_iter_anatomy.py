"""exp14: per-iteration anatomy of the pack kernel + skip-row prefetch.

Which redesigns can pay? Adds controlled costs to the production pack
kernel and times the deltas on the 184k band:

  base    production pack kernel (node rows from SMEM, row-change DMA)
  red2    + one extra (unused but unfoldable) jnp.any reduction per iter
          -> marginal cost of a vector->scalar sync. If small, BVH4's
          4-child mask or 2-step lookahead is affordable.
  slab3   + two extra slab tests per iter -> marginal vector cost.
  orred   replaces jnp.any with a bit-packed or-reduce (1 reduction
          carrying 4 bits) -> is a single multi-bit reduce same cost?
  pfetch  skip-row speculative prefetch into a second SMEM slot while
          the slab test + reduction run; on a skip edge the row is
          (usually) already resident.
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
    def kernel(num_ref, npack_ref, clusters_ref,
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
        never = num_nodes < 0  # runtime-false, not foldable

        node0 = jnp.where(jnp.any(active), jnp.int32(0), num_nodes)

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

        if variant == "pfetch":
            # rowa = current-node row cache, rowb = prefetched skip row.
            # Carry (node, rowa_id, rowb_id). Invariant: row(node) is
            # resident in rowa (blocking-DMA'd when violated).
            dma = pltpu.make_async_copy(npack_ref.at[0], rowa_s, sema)
            dma.start()
            dma.wait()

            def cond(c):
                return c[0] < num_nodes

            def body(c):
                node, ra, rb, bvalid = c
                safe = jnp.where(node < num_nodes, node, 0)
                row = safe // 16
                off = (safe % 16) * 8

                # Current row must be in A. If it is in B, copy B->A via
                # DMA (SMEM->SMEM); if in neither, fetch from VMEM.
                in_a = row == ra
                in_b = bvalid & (row == rb)

                @pl.when(~in_a & in_b)
                def _():
                    d = pltpu.make_async_copy(rowb_s, rowa_s, sema)
                    d.start()
                    d.wait()

                @pl.when(~in_a & ~in_b)
                def _():
                    d = pltpu.make_async_copy(npack_ref.at[row], rowa_s,
                                              sema)
                    d.start()
                    d.wait()

                def g(j):
                    return rowa_s[off + j]

                skip = g(6).astype(jnp.int32)
                col7 = g(7).astype(jnp.int32)
                # Prefetch the skip row while the vector phase runs.
                srow = jnp.where(skip < num_nodes, skip, 0) // 16
                do_pf = srow != row
                @pl.when(do_pf)
                def _():
                    d = pltpu.make_async_copy(npack_ref.at[srow], rowb_s,
                                              semb)
                    d.start()

                closest = t_ref[:]
                hit = slab(g, closest)
                anyhit = jnp.any(hit)
                is_leaf = col7 >= 0

                @pl.when(anyhit & is_leaf)
                def _():
                    leafwork(col7, hit)

                @pl.when(do_pf)
                def _():
                    pltpu.make_async_copy(npack_ref.at[srow], rowb_s,
                                          semb).wait()

                nxt = jnp.where(anyhit & (col7 < 0), -col7 - jnp.int32(1),
                                skip)
                nxt = jnp.where(node < num_nodes, nxt, node)
                return nxt, row, srow, do_pf

            jax.lax.while_loop(cond, body,
                               (node0, jnp.int32(-1), jnp.int32(-1),
                                jnp.bool_(False)))
            return

        def cond(c):
            return c[0] < num_nodes

        def body(c):
            node, cur_row = c
            safe = jnp.where(node < num_nodes, node, 0)
            row = safe // 16
            off = (safe % 16) * 8

            @pl.when(row != cur_row)
            def _():
                dma = pltpu.make_async_copy(npack_ref.at[row], rowa_s,
                                            sema)
                dma.start()
                dma.wait()

            def g(j):
                return rowa_s[off + j]

            skip = g(6).astype(jnp.int32)
            col7 = g(7).astype(jnp.int32)
            closest = t_ref[:]
            hit = slab(g, closest)

            if variant == "slab3":
                h2 = slab(lambda j: g(j) * 1.0000001, closest)
                h3 = slab(lambda j: g(j) * 0.9999999, closest)
                hit = hit | (h2 & h3 & never)

            if variant == "red2":
                anyhit = jnp.any(hit)
                extra = jnp.any(hit ^ active)
                anyhit = anyhit | (extra & never)
            elif variant == "orred":
                # hit in the TOP bit so a max-reduce acts as its OR; the
                # low bits ride along as the extra payload a BVH4 mask
                # would carry.
                bits = (hit.astype(jnp.int32) * 8
                        + (hit & active).astype(jnp.int32) * 4
                        + (hit ^ active).astype(jnp.int32))
                m = jnp.max(bits)
                anyhit = m >= 8
            else:
                anyhit = jnp.any(hit)
            is_leaf = col7 >= 0

            @pl.when(anyhit & is_leaf)
            def _():
                leafwork(col7, hit)

            nxt = jnp.where(anyhit & (col7 < 0), -col7 - jnp.int32(1),
                            skip)
            nxt = jnp.where(node < num_nodes, nxt, node)
            return nxt, row

        jax.lax.while_loop(cond, body, (node0, jnp.int32(-1)))

    return kernel


def build_pack(fs):
    nodes = np.asarray(fs.nodes8)
    m = nodes.shape[0]
    links = nodes[:, 6:8].view(np.int32).astype(np.float32)
    rows = (m + 15) // 16
    pad = np.zeros((rows, 128), np.float32)
    flat = np.concatenate([nodes[:, :6], links], axis=1)
    pad.reshape(rows * 16, 8)[:m] = flat
    return jnp.asarray(pad)


@functools.partial(jax.jit, static_argnames=("variant", "sub"))
def traverse_t(npack, clusters, num_nodes, comps, variant, sub):
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
                  resident, resident] + [block] * 7,
        out_shape=(out,),
        out_specs=(block,),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(num_nodes, npack, clusters, *comps)[0]


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
    ty, tx = tile_order(H, W, 16, 128)
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
        order = jnp.argsort(sort_key(o1, d1, alive1, smin, smax, "pd5"))
        o1 = tuple(jnp.take(c, order) for c in o1)
        d1 = tuple(jnp.take(c, order) for c in d1)
        alive1 = jnp.take(alive1, order)
        return o, d, o1, d1, alive1

    po, pd, b1o, b1d, b1a = gen(fs, uni)

    def to_comps(o, d, a):
        rows = P // LANES
        return tuple(c.reshape(rows, LANES) for c in (*o, *d)) + (
            a.astype(jnp.float32).reshape(rows, LANES),)

    pops = {"primaries": (to_comps(po, pd, ones), po, pd, ones, 16),
            "bounce1": (to_comps(b1o, b1d, b1a), b1o, b1d, b1a, 32)}
    num = jnp.asarray(fs.num_nodes, jnp.int32).reshape(1)
    npack = build_pack(fs)

    @functools.partial(jax.jit, static_argnames=("k", "variant", "sub"))
    def chain(comps, salt, k, variant, sub):
        def body(i, acc):
            cc = (comps[0] + (salt + i).astype(jnp.float32) * 1e-12,
                  *comps[1:])
            t = traverse_t(npack, fs.clusters, num, cc, variant, sub)
            return acc + jnp.sum(t * (t < 1e8))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    def timed(fn, k, reps=3):
        float(fn(k=k))
        t0 = time.time()
        for _ in range(reps):
            float(fn(k=k))
        return (time.time() - t0) / reps

    for variant in ("base", "red2", "slab3", "orred", "pfetch"):
        for name, (comps, o, d, a, sub) in pops.items():
            try:
                t = traverse_t(npack, fs.clusters, num, comps, variant,
                               sub)
                t.block_until_ready()
            except Exception as e:
                print(f"{variant:7s} {name:9s}: COMPILE FAIL "
                      f"{str(e)[:160]}", flush=True)
                continue
            ref = pallas_traverse(fs, o, d, a, cfg, sublanes=sub)
            want = jnp.where(ref.closest_t < cfg.t_max, ref.closest_t,
                             1e9)
            bad = int(jnp.sum(jnp.abs(
                jnp.minimum(t.reshape(P), 1e9) - want) > 2e-3))
            fn = functools.partial(chain, comps, jnp.uint32(3),
                                   variant=variant, sub=sub)
            t2, t4 = timed(fn, 2), timed(fn, 4)
            per = (t4 - t2) / 2
            print(f"{variant:7s} {name:9s}: {per*1e3:7.2f} ms (bad={bad})",
                  flush=True)


if __name__ == "__main__":
    main()
