"""exp10c: can SMEM staging of the *node* row cut internal-iteration cost?

Production kernel (leaf DMA landed): primaries 3.77 ms, bounce-1 sorted
26.5 ms on the 184k band. Internal iterations (58k at bounce-1) dominate;
the 6 bound extracts + 2 link extracts per iteration are the suspects.

Variants (all keep the leaf-row DMA):
  row_dma       DMA node row [8] f32 -> SMEM each iteration, scalar loads
                + scalar bitcasts for links
  row_dma2      speculative: while testing node N, both successor rows
                (left = -col7-1 and skip) are already DMA-ing into two
                SMEM slots; pick by scalar select after the test
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
from exp10b_scalar_cost import _mt

LANES = 128


def make_kernel(variant):
    def kernel(num_ref, nodes_ref, links_ref, clusters_ref,
               rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
               act_ref, t_ref,
               rowa_s, rowb_s, la_s, lb_s, crow_s,
               sema, semb, semc, seml, semm,
               *, t_min, t_max, det_eps):
        num_nodes = num_ref[0]
        rox, roy, roz = rox_ref[:], roy_ref[:], roz_ref[:]
        rdx, rdy, rdz = rdx_ref[:], rdy_ref[:], rdz_ref[:]
        ivx, ivy, ivz = 1.0 / rdx, 1.0 / rdy, 1.0 / rdz
        active = act_ref[:] > 0.5
        shape = rox.shape
        t_ref[:] = jnp.full(shape, t_max, jnp.float32)
        node0 = jnp.where(jnp.any(active), jnp.int32(0), num_nodes)

        def slab(bget):
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
            return ((t_ex > t_en) & (t_ex > t_min)
                    & (t_en < closest) & active)

        def leaf_mt(col7, hit):
            dma = pltpu.make_async_copy(clusters_ref.at[col7], crow_s,
                                        semc)
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

        if variant == "row_dma":
            def cond(node):
                return node < num_nodes

            def body(node):
                dma = pltpu.make_async_copy(nodes_ref.at[node],
                                            rowa_s.at[0], sema)
                dml = pltpu.make_async_copy(links_ref.at[node],
                                            la_s.at[0], seml)
                dma.start()
                dml.start()
                dma.wait()
                dml.wait()
                skip = la_s[0, 0]
                col7 = la_s[0, 1]
                hit = slab(lambda j: rowa_s[0, j])
                anyhit = jnp.any(hit)
                is_leaf = col7 >= 0

                @pl.when(anyhit & is_leaf)
                def _():
                    leaf_mt(col7, hit)

                return jnp.where(anyhit & (col7 < 0),
                                 -col7 - jnp.int32(1), skip)

            jax.lax.while_loop(cond, body, node0)
            return

        # row_dma2: speculative two-successor prefetch. Slot refs hold the
        # row of the CURRENT node's two candidates; carry tells which slot
        # the current node's row is in. Iteration i: current row already
        # in SMEM (prefetched at i-1); issue DMAs for both successors into
        # the two slots of the *other* buffer pair, overlap with the slab
        # test, then select.
        def start2(left, skip, buf):
            a, b = (rowa_s, rowb_s)
            sa, sb = (sema, semb)
            # buf selects halves: each slot ref is [2, 8]; buf row 0/1
            d1 = pltpu.make_async_copy(
                nodes_ref.at[left], a.at[buf], sa)
            d2 = pltpu.make_async_copy(
                nodes_ref.at[skip], b.at[buf], sb)
            d1.start()
            d2.start()
            return d1, d2

        # Prologue: current = node0 (clamped); fetch its row into slot 0
        # of buffer a.
        safe0 = jnp.where(node0 < num_nodes, node0, 0)
        d = pltpu.make_async_copy(nodes_ref.at[safe0], rowa_s.at[0], sema)
        dl = pltpu.make_async_copy(links_ref.at[safe0], la_s.at[0], seml)
        d.start()
        dl.start()
        d.wait()
        dl.wait()

        def cond(c):
            return c[0] < num_nodes

        def body(c):
            node, buf = c
            cur = lambda j: rowa_s[buf, j]
            skip = la_s[buf, 0]
            col7 = la_s[buf, 1]
            left = -col7 - jnp.int32(1)
            is_leaf = col7 >= 0
            nbuf = 1 - buf
            # Speculative fetches of both successors (left only valid for
            # internal nodes; clamp).
            lsafe = jnp.where(is_leaf, skip, left)
            lsafe = jnp.clip(lsafe, 0, num_nodes - 1)
            ssafe = jnp.clip(skip, 0, num_nodes - 1)
            da = pltpu.make_async_copy(nodes_ref.at[lsafe],
                                       rowa_s.at[nbuf], sema)
            db = pltpu.make_async_copy(nodes_ref.at[ssafe],
                                       rowb_s.at[nbuf], semb)
            dla = pltpu.make_async_copy(links_ref.at[lsafe],
                                        la_s.at[nbuf], seml)
            dlb = pltpu.make_async_copy(links_ref.at[ssafe],
                                        lb_s.at[nbuf], semm)
            da.start()
            db.start()
            dla.start()
            dlb.start()

            hit = slab(cur)
            anyhit = jnp.any(hit)

            @pl.when(anyhit & is_leaf)
            def _():
                leaf_mt(col7, hit)

            da.wait()
            db.wait()
            dla.wait()
            dlb.wait()
            descend = anyhit & ~is_leaf
            # If descending, next row is in rowa_s[nbuf]; else rowb_s.
            @pl.when(~descend)
            def _():
                for j in range(8):
                    rowa_s[nbuf, j] = rowb_s[nbuf, j]
                la_s[nbuf, 0] = lb_s[nbuf, 0]
                la_s[nbuf, 1] = lb_s[nbuf, 1]

            nxt = jnp.where(descend, left, skip)
            return nxt, nbuf

        jax.lax.while_loop(cond, body, (node0, jnp.int32(0)))

    return kernel


@functools.partial(jax.jit, static_argnames=("variant",))
def traverse_t(nodes, links, clusters, num_nodes, comps, variant):
    rows = comps[0].shape[0]
    grid = rows // 8
    block = pl.BlockSpec((8, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    resident = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(make_kernel(variant),
                               t_min=1e-3, t_max=1e9, det_eps=1e-5)
    out = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  resident, resident, resident] + [block] * 7,
        out_shape=(out,),
        out_specs=(block,),
        scratch_shapes=[pltpu.SMEM((2, 8), jnp.float32),
                        pltpu.SMEM((2, 8), jnp.float32),
                        pltpu.SMEM((2, 2), jnp.int32),
                        pltpu.SMEM((2, 2), jnp.int32),
                        pltpu.SMEM((CLUSTER_SIZE * TRI_STRIDE,),
                                   jnp.float32),
                        pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(num_nodes, nodes, links, clusters, *comps)[0]


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
        o1, d1, col, att, s, a1 = shade(
            r, o, d, (zero,)*3, (one,)*3, s, ones, jnp.bool_(True), cfg)
        smin = tuple(scene.nodes8[0, ax] for ax in range(3))
        smax = tuple(scene.nodes8[0, 3 + ax] for ax in range(3))
        order = jnp.argsort(sort_key(o1, d1, a1, smin, smax))
        return (o, d, tuple(jnp.take(c, order) for c in o1),
                tuple(jnp.take(c, order) for c in d1), jnp.take(a1, order))

    po, pd, b1o, b1d, b1a = gen(fs, uni)
    links = jnp.asarray(np.asarray(fs.nodes8)[:, 6:8].view(np.int32))

    def pack(o, d, a):
        return jnp.stack(list(o) + list(d) + [a.astype(jnp.float32)], -1)

    def comps_of(pk, salt_i):
        eps = salt_i.astype(jnp.float32) * 1e-12
        o = (pk[:, 0] + eps, pk[:, 1], pk[:, 2])
        d = (pk[:, 3], pk[:, 4], pk[:, 5])
        a = pk[:, 6] > 0.5
        rows = P // LANES
        return tuple(c.reshape(rows, LANES) for c in (*o, *d)) + (
            (pk[:, 6] + eps * 0).reshape(rows, LANES),)

    num = jnp.asarray(fs.num_nodes, jnp.int32).reshape(1)

    @functools.partial(jax.jit, static_argnames=("k", "variant"))
    def chain(pk, salt, k, variant):
        def body(i, acc):
            cc = comps_of(pk, salt + i)
            t = traverse_t(fs.nodes8, links, fs.clusters, num, cc,
                           variant)
            return acc + jnp.sum(t * (t < 1e8))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    SALT = [11]

    def timed(pk, k, variant, reps=4):
        float(chain(pk, jnp.uint32(99999), k, variant))
        t0 = time.time()
        for _ in range(reps):
            SALT[0] += 1000
            float(chain(pk, jnp.uint32(SALT[0]), k, variant))
        return (time.time() - t0) / reps

    pops = {"primaries": (pack(po, pd, ones), po, pd, ones),
            "bounce1": (pack(b1o, b1d, b1a), b1o, b1d, b1a)}
    base = {"primaries": 3.77, "bounce1": 26.5}
    for variant in ("row_dma", "row_dma2"):
        for name, (pk, o, d, a) in pops.items():
            try:
                cc = comps_of(pk, jnp.uint32(0))
                t = traverse_t(fs.nodes8, links, fs.clusters, num, cc,
                               variant)
            except Exception as e:
                print(f"{variant:9s} {name:9s}: COMPILE FAIL "
                      f"{str(e)[:300]}", flush=True)
                continue
            ref = pallas_traverse(fs, o, d, a, cfg)
            want = jnp.where(ref.closest_t < cfg.t_max, ref.closest_t, 1e9)
            bad = int(jnp.sum(jnp.abs(
                jnp.minimum(t.reshape(P), 1e9) - want) > 2e-3))
            t2 = timed(pk, 2, variant)
            t8 = timed(pk, 8, variant)
            per = (t8 - t2) / 6
            print(f"{variant:9s} {name:9s}: {per*1e3:7.2f} ms (bad={bad}, "
                  f"prod-8out {base[name]})", flush=True)


if __name__ == "__main__":
    main()
