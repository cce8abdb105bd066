"""exp15: 4-wide BVH traversal with an SMEM stack.

exp14 measured extra slab tests and extra vector->scalar reductions as
~free: per-iteration cost is dominated by DMA wait + scalar loads + loop
overhead. A BVH4 visit tests 4 child boxes for ~the cost of today's 1,
halving the visit count. Layout: one BVH4 node = 64 floats (4 children x
[min(3) max(3) meta pad]); 2 nodes per 128-float packed row (the proven
DMA shape). meta float-encoded: >0 internal (bvh4 id+1), <0 leaf
(-(cluster+1)), 0 empty. Traversal keeps a per-tile SMEM stack of node
ids — no skip links.
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
STACK_CAP = 48


def collapse4(nodes8, num_nodes):
    """Binary pre-order nodes8 -> BVH4 arrays.

    Returns (packed [R,128] f32, n4). Collapse: take a binary internal
    node's two children; repeatedly expand the largest-area internal
    child until 4 slots are filled or all slots are leaves/empty.
    """
    nodes = np.asarray(nodes8)[:num_nodes]
    links = nodes[:, 6:8].view(np.int32)
    skip, col7 = links[:, 0], links[:, 1]

    def area(b):
        d = np.maximum(b[3:6] - b[0:3], 0.0)
        return 2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

    out = []  # list of (children list of ('leaf', cluster, bounds) or
    #           ('int', binary_id, bounds))

    def children_of(b):  # binary children of internal binary node b
        left = b + 1
        right = skip[left]
        return [left, right]

    # BVH4 nodes reference binary ids first; second pass maps to bvh4 ids.
    b2q = {}
    order = []

    def build(b):  # binary internal node id -> bvh4 node id
        if b in b2q:
            return b2q[b]
        my = len(out)
        b2q[b] = my
        out.append(None)
        order.append(b)
        slots = children_of(b)
        while len(slots) < 4:
            # expand the largest-area internal slot
            best, best_a = -1, -1.0
            for i, s in enumerate(slots):
                if col7[s] < 0:  # internal
                    a = area(nodes[s])
                    if a > best_a:
                        best, best_a = i, a
            if best < 0:
                break
            s = slots.pop(best)
            slots.extend(children_of(s))
        ent = []
        for s in slots:
            if col7[s] >= 0:
                ent.append(("leaf", int(col7[s]), nodes[s, :6]))
            else:
                ent.append(("int", s, nodes[s, :6]))
        out[my] = ent
        return my

    if col7[0] >= 0:  # root is a leaf: single pseudo node
        out.append([("leaf", int(col7[0]), nodes[0, :6])])
        order.append(-1)
    else:
        build(0)
        # recursion-free: build() only creates the node; expand children
        # breadth-first
        qi = 0
        while qi < len(out):
            ent = out[qi]
            for e in ent:
                if e[0] == "int" and e[1] not in b2q:
                    build(e[1])
            qi += 1

    n4 = len(out)
    arr = np.zeros((n4, 64), np.float32)
    for qid, ent in enumerate(out):
        for c, e in enumerate(ent):
            base = 16 * c
            arr[qid, base:base + 6] = e[2]
            if e[0] == "leaf":
                arr[qid, base + 6] = -(e[1] + 1)
            else:
                arr[qid, base + 6] = b2q[e[1]] + 1
        for c in range(len(ent), 4):
            arr[qid, 16 * c + 6] = 0.0  # empty
    rows = (n4 + 1) // 2
    packed = np.zeros((rows, 128), np.float32)
    packed.reshape(rows * 2, 64)[:n4] = arr
    return jnp.asarray(packed), n4


def make_kernel():
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

        stack_s[0] = jnp.int32(0)
        sp0 = jnp.where(jnp.any(active), jnp.int32(1), jnp.int32(0))

        def cond(c):
            return c[0] > 0

        def body(c):
            sp, cur_row = c
            sp = sp - 1
            nid = stack_s[sp]
            row = nid // 2
            base0 = (nid % 2) * 64

            @pl.when(row != cur_row)
            def _():
                d = pltpu.make_async_copy(npack_ref.at[row], row_s, sema)
                d.start()
                d.wait()

            closest = t_ref[:]
            any_c = []
            meta_c = []
            hit_c = []
            for cc in range(4):
                b = base0 + 16 * cc

                def g(j, b=b):
                    return row_s[b + j]

                meta = g(6).astype(jnp.int32)
                e0 = (g(0) - rox) * ivx
                x0 = (g(3) - rox) * ivx
                e1_ = (g(1) - roy) * ivy
                x1 = (g(4) - roy) * ivy
                e2_ = (g(2) - roz) * ivz
                x2 = (g(5) - roz) * ivz
                lo0, hi0 = jnp.minimum(e0, x0), jnp.maximum(e0, x0)
                lo1, hi1 = jnp.minimum(e1_, x1), jnp.maximum(e1_, x1)
                lo2, hi2 = jnp.minimum(e2_, x2), jnp.maximum(e2_, x2)
                t_en = jnp.maximum(lo0, jnp.maximum(lo1, lo2))
                t_ex = jnp.minimum(hi0, jnp.minimum(hi1, hi2))
                hit = ((t_ex > t_en) & (t_ex > t_min)
                       & (t_en < closest) & active)
                hit_c.append(hit)
                meta_c.append(meta)
                any_c.append(jnp.any(hit) & (meta != 0))

            # Leaf children: inline cluster tests.
            for cc in range(4):
                @pl.when(any_c[cc] & (meta_c[cc] < 0))
                def _(cc=cc):
                    col7 = -meta_c[cc] - jnp.int32(1)
                    d = pltpu.make_async_copy(clusters_ref.at[col7],
                                              crow_s, semc)
                    d.start()
                    d.wait()
                    cl = t_ref[:]
                    for k in range(CLUSTER_SIZE):
                        b = k * TRI_STRIDE
                        s = lambda j, b=b: crow_s[b + j]
                        tt, ok = _mt(s, (rox, roy, roz),
                                     (rdx, rdy, rdz),
                                     hit_c[cc], t_min, det_eps, cl)
                        cl = jnp.where(ok, tt, cl)
                    t_ref[:] = cl

            # Internal children: push (reverse order; any order is
            # correct under strict closest-t).
            off = jnp.int32(0)
            for cc in range(4):
                push = any_c[cc] & (meta_c[cc] > 0)

                @pl.when(push)
                def _(cc=cc, off=off):
                    stack_s[sp + off] = meta_c[cc] - jnp.int32(1)

                off = off + push.astype(jnp.int32)

            return sp + off, row

        jax.lax.while_loop(cond, body, (sp0, jnp.int32(-1)))

    return kernel


@functools.partial(jax.jit, static_argnames=("sub", "interpret"))
def traverse4(npack, clusters, num_nodes, comps, sub, interpret=False):
    rows = comps[0].shape[0]
    grid = rows // sub
    block = pl.BlockSpec((sub, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    resident = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(make_kernel(),
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
    npack4, n4 = collapse4(fs.nodes8, int(fs.num_nodes))
    print(f"bvh4: {n4} nodes ({int(fs.num_nodes)} binary)", flush=True)
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

    @functools.partial(jax.jit, static_argnames=("k", "sub"))
    def chain(comps, salt, k, sub):
        def body(i, acc):
            cc = (comps[0] + (salt + i).astype(jnp.float32) * 1e-12,
                  *comps[1:])
            t = traverse4(npack4, fs.clusters, num, cc, sub)
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

    for name, (comps, o, d, a, sub) in pops.items():
        t = traverse4(npack4, fs.clusters, num, comps, sub)
        t.block_until_ready()
        ref = pallas_traverse(fs, o, d, a, cfg, sublanes=sub)
        want = jnp.where(ref.closest_t < cfg.t_max, ref.closest_t, 1e9)
        bad = int(jnp.sum(jnp.abs(
            jnp.minimum(t.reshape(P), 1e9) - want) > 2e-3))
        fn = functools.partial(chain, comps, jnp.uint32(3), sub=sub)
        t2, t8 = timed(fn, 2), timed(fn, 8)
        per = (t8 - t2) / 6
        print(f"bvh4 {name:9s} S={sub}: {per*1e3:7.2f} ms (bad={bad})",
              flush=True)
        # binary baseline with identical timing method
        @functools.partial(jax.jit, static_argnames=("k",))
        def bchain(comps, salt, k, sub=sub):
            def body(i, acc):
                cc = (comps[0] + (salt + i).astype(jnp.float32) * 1e-12,
                      *comps[1:])
                oo = (cc[0].reshape(P), cc[1].reshape(P), cc[2].reshape(P))
                dd = (cc[3].reshape(P), cc[4].reshape(P), cc[5].reshape(P))
                r = pallas_traverse(fs, oo, dd, cc[6].reshape(P) > 0.5,
                                    cfg, sublanes=sub)
                return acc + jnp.sum(r.closest_t * r.hit)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        bfn = functools.partial(bchain, comps, jnp.uint32(3))
        t2, t8 = timed(bfn, 2), timed(bfn, 8)
        per = (t8 - t2) / 6
        print(f"bin  {name:9s} S={sub}: {per*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
