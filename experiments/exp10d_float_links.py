"""exp10d: node-row SMEM staging with FLOAT-encoded links.

Mosaic has no scalar bitcast, and tiny i32 DMAs failed to compile — but
links stored as float *values* (exact integers < 2^24) need only a scalar
f32->i32 convert, which is a normal op. Node row becomes pure f32[8]:
bounds 0-5, skip@6, col7@7 as floats.

Variants:
  row_dma    DMA [8] f32 node row -> SMEM per iteration, scalar loads
  row_dma2   speculative both-successor prefetch (two SMEM slots)
If [8] DMAs still fail to compile, pad the row to [128] f32 (rowpad
variants) — 512 B DMAs are proven (leaf path).
"""
import sys, time, os, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.core.fast_types import CLUSTER_SIZE, TRI_STRIDE
from raytracer_tpu.kernels.pallas_trace import pallas_traverse, pick_tile
from raytracer_tpu.kernels.wavefront import sort_key
from exp10b_scalar_cost import _mt

LANES = 128


def make_kernel(variant, rowlen):
    def kernel(num_ref, nodes_ref, clusters_ref,
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
                dma.start()
                dma.wait()
                skip = rowa_s[0, 6].astype(jnp.int32)
                col7 = rowa_s[0, 7].astype(jnp.int32)
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

        # row_dma2: speculative two-successor prefetch.
        safe0 = jnp.where(node0 < num_nodes, node0, 0)
        d = pltpu.make_async_copy(nodes_ref.at[safe0], rowa_s.at[0], sema)
        d.start()
        d.wait()

        def cond(c):
            return c[0] < num_nodes

        def body(c):
            node, buf = c
            skip = rowa_s[buf, 6].astype(jnp.int32)
            col7 = rowa_s[buf, 7].astype(jnp.int32)
            left = -col7 - jnp.int32(1)
            is_leaf = col7 >= 0
            nbuf = 1 - buf
            lsafe = jnp.clip(jnp.where(is_leaf, skip, left), 0,
                             num_nodes - 1)
            ssafe = jnp.clip(skip, 0, num_nodes - 1)
            da = pltpu.make_async_copy(nodes_ref.at[lsafe],
                                       rowa_s.at[nbuf], sema)
            db = pltpu.make_async_copy(nodes_ref.at[ssafe],
                                       rowb_s.at[nbuf], semb)
            da.start()
            db.start()

            hit = slab(lambda j: rowa_s[buf, j])
            anyhit = jnp.any(hit)

            @pl.when(anyhit & is_leaf)
            def _():
                leaf_mt(col7, hit)

            da.wait()
            db.wait()
            descend = anyhit & ~is_leaf

            @pl.when(~descend)
            def _():
                for j in range(8):
                    rowa_s[nbuf, j] = rowb_s[nbuf, j]

            return jnp.where(descend, left, skip), nbuf

        jax.lax.while_loop(cond, body, (node0, jnp.int32(0)))

    return kernel


@functools.partial(jax.jit, static_argnames=("variant", "rowlen"))
def traverse_t(nodesf, clusters, num_nodes, comps, variant, rowlen):
    rows = comps[0].shape[0]
    grid = rows // 8
    block = pl.BlockSpec((8, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    resident = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(make_kernel(variant, rowlen),
                               t_min=1e-3, t_max=1e9, det_eps=1e-5)
    out = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  resident, resident] + [block] * 7,
        out_shape=(out,),
        out_specs=(block,),
        scratch_shapes=[pltpu.SMEM((2, rowlen), jnp.float32),
                        pltpu.SMEM((2, rowlen), jnp.float32),
                        pltpu.SMEM((CLUSTER_SIZE * TRI_STRIDE,),
                                   jnp.float32),
                        pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(num_nodes, nodesf, clusters, *comps)[0]


def main():
    from raytracer_tpu.core.camera import default_camera
    from raytracer_tpu.core.types import RenderConfig
    from raytracer_tpu.kernels.tracer import (initial_seed,
                                              make_primary_rays, shade)
    from __graft_entry__ import _flagship_scene

    print("devices:", jax.devices(), flush=True)
    fs = _flagship_scene()
    nodes = np.asarray(fs.nodes8)
    links = nodes[:, 6:8].view(np.int32)
    for rowlen in (8, 128):
        nf = np.zeros((nodes.shape[0], rowlen), np.float32)
        nf[:, 0:6] = nodes[:, 0:6]
        nf[:, 6] = links[:, 0].astype(np.float32)
        nf[:, 7] = links[:, 1].astype(np.float32)
        if rowlen == 8:
            nodesf8 = jnp.asarray(nf)
        else:
            nodesf128 = jnp.asarray(nf)

    W, H = 1280, 144
    P = W * H
    cfg = RenderConfig(width=W, height=H)
    cam = default_camera(1280, 720)
    uni = cam.uniforms()
    th, tw = pick_tile(H, W)
    yy = np.arange(H)[:, None].repeat(W, 1)
    xx = np.arange(W)[None, :].repeat(H, 0)
    tm = lambda a: (a.reshape(H // th, th, W // tw, tw)
                    .transpose(0, 2, 1, 3).reshape(-1))
    yyt, xxt = jnp.asarray(tm(yy) + 288), jnp.asarray(tm(xx))
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

    def pack(o, d, a):
        return jnp.stack(list(o) + list(d) + [a.astype(jnp.float32)], -1)

    num = jnp.asarray(fs.num_nodes, jnp.int32).reshape(1)

    @functools.partial(jax.jit, static_argnames=("k", "variant", "rowlen"))
    def chain(nodesf, pk, salt, k, variant, rowlen):
        def body(i, acc):
            eps = (salt + i).astype(jnp.float32) * 1e-12
            o = (pk[:, 0] + eps, pk[:, 1], pk[:, 2])
            d = (pk[:, 3], pk[:, 4], pk[:, 5])
            rows = P // LANES
            cc = tuple(c.reshape(rows, LANES) for c in (*o, *d)) + (
                pk[:, 6].reshape(rows, LANES),)
            t = traverse_t(nodesf, fs.clusters, num, cc, variant, rowlen)
            return acc + jnp.sum(t * (t < 1e8))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    SALT = [23]

    def timed(nodesf, pk, k, variant, rowlen, reps=4):
        float(chain(nodesf, pk, jnp.uint32(77777), k, variant, rowlen))
        t0 = time.time()
        for _ in range(reps):
            SALT[0] += 613
            float(chain(nodesf, pk, jnp.uint32(SALT[0]), k, variant,
                        rowlen))
        return (time.time() - t0) / reps

    pops = {"primaries": (pack(po, pd, ones), po, pd, ones),
            "bounce1": (pack(b1o, b1d, b1a), b1o, b1d, b1a)}
    base = {"primaries": 3.77, "bounce1": 26.5}
    for variant in ("row_dma", "row_dma2"):
        for rowlen, nodesf in ((8, nodesf8), (128, nodesf128)):
            for name, (pk, o, d, a) in pops.items():
                try:
                    rows = P // LANES
                    cc = tuple(c.reshape(rows, LANES)
                               for c in (*o, *d)) + (
                        a.astype(jnp.float32).reshape(rows, LANES),)
                    t = traverse_t(nodesf, fs.clusters, num, cc, variant,
                                   rowlen)
                except Exception as e:
                    print(f"{variant:9s} row{rowlen:3d} {name:9s}: "
                          f"COMPILE FAIL {str(e)[:160]}", flush=True)
                    continue
                ref = pallas_traverse(fs, o, d, a, cfg)
                want = jnp.where(ref.closest_t < cfg.t_max,
                                 ref.closest_t, 1e9)
                bad = int(jnp.sum(jnp.abs(
                    jnp.minimum(t.reshape(P), 1e9) - want) > 2e-3))
                t2 = timed(nodesf, pk, 2, variant, rowlen)
                t8 = timed(nodesf, pk, 8, variant, rowlen)
                per = (t8 - t2) / 6
                print(f"{variant:9s} row{rowlen:3d} {name:9s}: "
                      f"{per*1e3:7.2f} ms (bad={bad}, prod {base[name]})",
                      flush=True)


if __name__ == "__main__":
    main()
