"""exp18: does near-first push ordering pay on BVH8?

Processing near subtrees first tightens closest-t before far subtrees
are popped, culling whole visits (`t_en < closest` at test time). The
vector-swap version crashed Mosaic (exp16); here ordering touches only
SCALARS: per child, key = centroid . mean-tile-direction (mean computed
once per tile); a 19-comparator Batcher network sorts (key, meta, push)
triples; pushes go far-to-near so the nearest pops first.

  base   exp17 BVH8 kernel (build-order pushes)
  near   scalar-sorted pushes
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
from raytracer_tpu.bvh.bvh4 import collapse4
from raytracer_tpu.core.fast_types import CLUSTER_SIZE, TRI_STRIDE
from raytracer_tpu.kernels.pallas_trace import pallas_traverse
from raytracer_tpu.kernels.wavefront import sort_key

LANES = 128
STACK_CAP = 256
WIDTH = 8

# Batcher odd-even merge sort network for 8 elements (19 comparators).
NET8 = [(0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6), (5, 7),
        (1, 2), (5, 6), (0, 4), (3, 7), (1, 5), (2, 6), (1, 4), (3, 6),
        (2, 4), (3, 5), (3, 4)]


def make_kernel(variant):
    near = variant == "near"

    def kernel(num_ref, npack_ref, clusters_ref,
               rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
               act_ref, t_ref,
               stack_s, row_s, crow_s, sema, csem,
               *, t_min, t_max, det_eps):
        rox, roy, roz = rox_ref[:], roy_ref[:], roz_ref[:]
        rdx, rdy, rdz = rdx_ref[:], rdy_ref[:], rdz_ref[:]
        ivx, ivy, ivz = 1.0 / rdx, 1.0 / rdy, 1.0 / rdz
        active = act_ref[:] > 0.5
        shape = rox.shape
        t_ref[:] = jnp.full(shape, t_max, jnp.float32)

        if near:
            mdx = jnp.sum(jnp.where(active, rdx, 0.0))
            mdy = jnp.sum(jnp.where(active, rdy, 0.0))
            mdz = jnp.sum(jnp.where(active, rdz, 0.0))

        boot = pltpu.make_async_copy(npack_ref.at[0], row_s, sema)
        boot.start()
        boot.wait()
        have0 = jnp.any(active)

        def cond(c):
            return c[0]

        def body(c):
            have, nid, sp, resident, pending = c

            @pl.when(pending)
            def _():
                pltpu.make_async_copy(npack_ref.at[resident], row_s,
                                      sema).wait()

            closest = t_ref[:]
            any_c, meta_c, hit_c, key_c = [], [], [], []
            for cc in range(WIDTH):
                b = 16 * cc
                g = lambda j, b=b: row_s[b + j]
                meta = g(6).astype(jnp.int32)
                lo0 = (g(0) - rox) * ivx
                hi0 = (g(3) - rox) * ivx
                lo1 = (g(1) - roy) * ivy
                hi1 = (g(4) - roy) * ivy
                lo2 = (g(2) - roz) * ivz
                hi2 = (g(5) - roz) * ivz
                t_en = jnp.maximum(jnp.minimum(lo0, hi0),
                                   jnp.maximum(jnp.minimum(lo1, hi1),
                                               jnp.minimum(lo2, hi2)))
                t_ex = jnp.minimum(jnp.maximum(lo0, hi0),
                                   jnp.minimum(jnp.maximum(lo1, hi1),
                                               jnp.maximum(lo2, hi2)))
                hit = ((t_ex > t_en) & (t_ex > t_min)
                       & (t_en < closest) & active)
                hit_c.append(hit)
                meta_c.append(meta)
                any_c.append(jnp.any(hit) & (meta != 0))
                if near:
                    key_c.append((g(0) + g(3)) * mdx + (g(1) + g(4)) * mdy
                                 + (g(2) + g(5)) * mdz)

            if near:
                # sort (key desc, meta, push) so pushes go far-to-near
                trip = [[key_c[i], meta_c[i],
                         (any_c[i] & (meta_c[i] > 0))] for i in
                        range(WIDTH)]
                for i, j in NET8:
                    a, b_ = trip[i], trip[j]
                    sw = b_[0] > a[0]  # descending by key
                    for f in range(3):
                        ai, bi = a[f], b_[f]
                        a[f] = jnp.where(sw, bi, ai)
                        b_[f] = jnp.where(sw, ai, bi)
                push_src = [(t[2], t[1]) for t in trip]
            else:
                push_src = [(any_c[i] & (meta_c[i] > 0), meta_c[i])
                            for i in range(WIDTH)]

            off = jnp.int32(0)
            for push, meta in push_src:
                @pl.when(push)
                def _(meta=meta, off=off):
                    stack_s[sp + off] = meta - jnp.int32(1)

                off = off + push.astype(jnp.int32)
            sp2 = sp + off
            have2 = sp2 > 0
            sp3 = jnp.maximum(sp2 - 1, 0)
            nid2 = stack_s[sp3]
            pend2 = have2 & (nid2 != resident)

            @pl.when(pend2)
            def _():
                pltpu.make_async_copy(npack_ref.at[nid2], row_s,
                                      sema).start()

            for group in range(0, WIDTH, 4):
                for cc in range(group, group + 4):
                    @pl.when(any_c[cc] & (meta_c[cc] < 0))
                    def _(cc=cc):
                        col7 = -meta_c[cc] - jnp.int32(1)
                        pltpu.make_async_copy(clusters_ref.at[col7],
                                              crow_s.at[cc % 4],
                                              csem.at[cc % 4]).start()
                for cc in range(group, group + 4):
                    @pl.when(any_c[cc] & (meta_c[cc] < 0))
                    def _(cc=cc):
                        col7 = -meta_c[cc] - jnp.int32(1)
                        pltpu.make_async_copy(clusters_ref.at[col7],
                                              crow_s.at[cc % 4],
                                              csem.at[cc % 4]).wait()
                        cl = t_ref[:]
                        for k in range(CLUSTER_SIZE):
                            b = k * TRI_STRIDE
                            s = (lambda j, b=b, cc=cc:
                                 crow_s[cc % 4, b + j])
                            tt, ok = _mt(s, (rox, roy, roz),
                                         (rdx, rdy, rdz),
                                         hit_c[cc], t_min, det_eps, cl)
                            cl = jnp.where(ok, tt, cl)
                        t_ref[:] = cl

            return have2, nid2, sp3, nid2, pend2

        jax.lax.while_loop(cond, body,
                           (have0, jnp.int32(0), jnp.int32(0),
                            jnp.int32(0), jnp.bool_(False)))

    return kernel


@functools.partial(jax.jit, static_argnames=("variant", "sub", "interpret"))
def traverse_v(npack, clusters, num_nodes, comps, variant, sub,
               interpret=False):
    rows = comps[0].shape[0]
    grid = rows // sub
    block = pl.BlockSpec((sub, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    resident = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(make_kernel(variant),
                               t_min=1e-3, t_max=1e9, det_eps=1e-5)
    out = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    scratch = [pltpu.SMEM((STACK_CAP,), jnp.int32),
               pltpu.SMEM((128,), jnp.float32),
               pltpu.SMEM((4, 128), jnp.float32),
               pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA((4,))]
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
        interpret=interpret,
    )(num_nodes, npack, clusters, *comps)[0]


def main():
    from raytracer_tpu.core.camera import default_camera
    from raytracer_tpu.core.types import RenderConfig
    from raytracer_tpu.kernels.tracer import (initial_seed,
                                              make_primary_rays, shade)
    from __graft_entry__ import _flagship_scene

    print("devices:", jax.devices(), flush=True)
    fs = _flagship_scene()
    npack8, n8 = collapse4(np.asarray(fs.nodes8), int(fs.num_nodes),
                           width=8)
    npack8 = jnp.asarray(npack8)
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

    pops = {"bounce1 s8": (to_comps(b1o, b1d, b1a), b1o, b1d, b1a, 8),
            "bounce1 s16": (to_comps(b1o, b1d, b1a), b1o, b1d, b1a, 16),
            "bounce1 s32": (to_comps(b1o, b1d, b1a), b1o, b1d, b1a, 32)}
    num = jnp.asarray(n8, jnp.int32).reshape(1)

    @functools.partial(jax.jit, static_argnames=("k", "variant", "sub"))
    def chain(comps, salt, k, variant, sub):
        def body(i, acc):
            cc = (comps[0] + (salt + i).astype(jnp.float32) * 1e-12,
                  *comps[1:])
            t = traverse_v(npack8, fs.clusters, num, cc, variant, sub)
            return acc + jnp.sum(t * (t < 1e8))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    def timed(fn, k, reps=5):
        float(fn(k=k))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(fn(k=k))
            ts.append(time.time() - t0)
        return min(ts)

    for variant in ("near",):
        for name, (comps, o, d, a, sub) in pops.items():
            try:
                t = traverse_v(npack8, fs.clusters, num, comps, variant,
                               sub)
                t.block_until_ready()
            except Exception as e:
                print(f"{variant:5s} {name:9s}: COMPILE FAIL "
                      f"{str(e)[:160]}", flush=True)
                continue
            ref = pallas_traverse(fs, o, d, a, cfg, sublanes=sub)
            want = jnp.where(ref.closest_t < cfg.t_max, ref.closest_t,
                             1e9)
            bad = int(jnp.sum(jnp.abs(
                jnp.minimum(t.reshape(P), 1e9) - want) > 2e-3))
            fn = functools.partial(chain, comps, jnp.uint32(3),
                                   variant=variant, sub=sub)
            t2, t8 = timed(fn, 2), timed(fn, 8)
            per = (t8 - t2) / 6
            print(f"{variant:5s} {name:9s} S={sub}: {per*1e3:7.2f} ms "
                  f"(bad={bad})", flush=True)


if __name__ == "__main__":
    main()
