"""exp16: BVH4 kernel tuning — next-top prefetch + near-first ordering.

  base   production _trace4_kernel shape (1-output copy)
  pf     restructured loop: after pushes, the next stack top is known;
         its node row DMA starts immediately and overlaps the leaf
         phase + loop backedge, with the wait at the next iteration top
  ord    children processed near-first (scalar sort of 4 by min-lane
         t_enter); each leaf child's hit mask is re-tested against the
         tightened closest before its cluster DMA (skips pruned leaves)
  pford  both
Also sweeps bounce sublanes {16, 32, 48} for the winner.
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


def make_kernel(variant):
    prefetch = variant in ("pf", "pford", "pfrc")
    ordered = variant in ("ord", "pford")
    recheck = ordered or variant in ("rc", "pfrc")

    def kernel(num_ref, npack_ref, clusters_ref,
               rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
               act_ref, t_ref,
               stack_s, row_s, crow_s, sema, semc,
               *, t_min, t_max, det_eps):
        rox, roy, roz = rox_ref[:], roy_ref[:], roz_ref[:]
        rdx, rdy, rdz = rdx_ref[:], rdy_ref[:], rdz_ref[:]
        ivx, ivy, ivz = 1.0 / rdx, 1.0 / rdy, 1.0 / rdz
        active = act_ref[:] > 0.5
        shape = rox.shape
        t_ref[:] = jnp.full(shape, t_max, jnp.float32)

        def leafwork(col7, hit):
            d = pltpu.make_async_copy(clusters_ref.at[col7], crow_s, semc)
            d.start()
            d.wait()
            cl = t_ref[:]
            for k in range(CLUSTER_SIZE):
                b = k * TRI_STRIDE
                s = lambda j, b=b: crow_s[b + j]
                tt, ok = _mt(s, (rox, roy, roz), (rdx, rdy, rdz),
                             hit, t_min, det_eps, cl)
                cl = jnp.where(ok, tt, cl)
            t_ref[:] = cl

        def slab_phase(nid):
            """Reads row_s; returns per-child info (row_s dead after)."""
            base0 = (nid % 2) * 64
            closest = t_ref[:]
            info = []
            for cc in range(4):
                b = base0 + 16 * cc
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
                nonempty = meta != 0
                anyh = jnp.any(hit) & nonempty
                if ordered:
                    big = jnp.float32(1e30)
                    tkey = jnp.min(jnp.where(hit, t_en, big))
                    tkey = jnp.where(anyh, tkey, big)
                else:
                    tkey = jnp.float32(0)
                info.append([anyh, meta, hit, t_en, tkey])
            if ordered:
                # scalar sort network on 4 entries by tkey (near first)
                def swap(i, j):
                    a, b_ = info[i], info[j]
                    sw = b_[4] < a[4]
                    for f in range(5):
                        ai, bi = a[f], b_[f]
                        a[f] = jnp.where(sw, bi, ai)
                        b_[f] = jnp.where(sw, ai, bi)
                for i, j in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
                    swap(i, j)
            return info

        def leaf_phase(info):
            for cc in range(4):
                anyh, meta, hit, t_en, _ = info[cc]
                if recheck and cc > 0:
                    # re-test against the (possibly tightened) closest
                    hit = hit & (t_en < t_ref[:])
                    anyh = anyh & jnp.any(hit)

                @pl.when(anyh & (meta < 0))
                def _(meta=meta, hit=hit):
                    leafwork(-meta - jnp.int32(1), hit)

        def push_list(info):
            off = jnp.int32(0)
            # push far-to-near so the nearest pops first
            order_ = reversed(range(4)) if ordered else range(4)
            pushes = []
            for cc in order_:
                anyh, meta = info[cc][0], info[cc][1]
                push = anyh & (meta > 0)
                pushes.append((push, meta, off))
                off = off + push.astype(jnp.int32)
            return pushes, off

        if prefetch:
            d = pltpu.make_async_copy(npack_ref.at[0], row_s, sema)
            d.start()
            d.wait()
            have0 = jnp.any(active)

            def cond(c):
                return c[0]

            def body(c):
                have, nid, sp, resident, pending = c

                @pl.when(pending)
                def _():
                    pltpu.make_async_copy(npack_ref.at[resident], row_s,
                                          sema).wait()

                info = slab_phase(nid)      # row_s dead after this
                pushes, off = push_list(info)
                for push, meta, o in pushes:
                    @pl.when(push)
                    def _(meta=meta, o=o):
                        stack_s[sp + o] = meta - jnp.int32(1)
                sp2 = sp + off
                have2 = sp2 > 0
                sp3 = jnp.maximum(sp2 - 1, 0)
                nid2 = stack_s[sp3]
                row2 = nid2 // 2
                pend2 = have2 & (row2 != resident)

                @pl.when(pend2)
                def _():
                    pltpu.make_async_copy(npack_ref.at[row2], row_s,
                                          sema).start()

                leaf_phase(info)            # overlaps the node-row DMA
                return have2, nid2, sp3, row2, pend2

            jax.lax.while_loop(cond, body,
                               (have0, jnp.int32(0), jnp.int32(0),
                                jnp.int32(0), jnp.bool_(False)))
            return

        stack_s[0] = jnp.int32(0)
        sp0 = jnp.where(jnp.any(active), jnp.int32(1), jnp.int32(0))

        def cond(c):
            return c[0] > 0

        def body(c):
            sp, cur_row = c
            sp = sp - 1
            nid = stack_s[sp]
            row = nid // 2

            @pl.when(row != cur_row)
            def _():
                d = pltpu.make_async_copy(npack_ref.at[row], row_s, sema)
                d.start()
                d.wait()

            info = slab_phase(nid)
            pushes, off = push_list(info)
            for push, meta, o in pushes:
                @pl.when(push)
                def _(meta=meta, o=o):
                    stack_s[sp + o] = meta - jnp.int32(1)
            leaf_phase(info)
            return sp + off, row

        jax.lax.while_loop(cond, body, (sp0, jnp.int32(-1)))

    return kernel


@functools.partial(jax.jit, static_argnames=("variant", "sub", "interpret"))
def traverse_t(npack, clusters, num_nodes, comps, variant, sub,
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
    npack4, n4 = collapse4(np.asarray(fs.nodes8), int(fs.num_nodes))
    npack4 = jnp.asarray(npack4)
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
    num = jnp.asarray(n4, jnp.int32).reshape(1)

    @functools.partial(jax.jit, static_argnames=("k", "variant", "sub"))
    def chain(comps, salt, k, variant, sub):
        def body(i, acc):
            cc = (comps[0] + (salt + i).astype(jnp.float32) * 1e-12,
                  *comps[1:])
            t = traverse_t(npack4, fs.clusters, num, cc, variant, sub)
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

    for variant in ("rc", "pfrc"):
        for name, (comps, o, d, a, sub) in pops.items():
            try:
                t = traverse_t(npack4, fs.clusters, num, comps, variant,
                               sub)
                t.block_until_ready()
            except Exception as e:
                print(f"{variant:6s} {name:9s}: COMPILE FAIL "
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
            print(f"{variant:6s} {name:9s} S={sub}: {per*1e3:7.2f} ms "
                  f"(bad={bad})", flush=True)

    # sublane sweep for bounce with the best compiling variant
    comps, o, d, a, _ = pops["bounce1"]
    for sub in (16, 48):
        if (P // LANES) % sub:
            continue
        fn = functools.partial(chain, comps, jnp.uint32(3),
                               variant="pfrc", sub=sub)
        try:
            t2, t8 = timed(fn, 2), timed(fn, 8)
        except Exception as e:
            print(f"pfrc bounce1 S={sub}: FAIL {str(e)[:120]}",
                  flush=True)
            continue
        per = (t8 - t2) / 6
        print(f"pfrc bounce1 S={sub}: {per*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
