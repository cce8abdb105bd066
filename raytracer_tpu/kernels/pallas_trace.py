"""Pallas per-tile BVH traversal: the VMEM-resident fast path.

This is the TPU-native analogue of the reference's per-8x8-workgroup
compute-shader traversal (``shaders/compute_dynamic_ray.comp:157,179-210``):
where a GPU workgroup walks the BVH with per-thread stacks, a TPU core
walks it with **one scalar node pointer per multi-kilo-ray tile**, the whole
node/cluster table resident in VMEM.

Why this shape (all measured, PERF_NOTES.md):

* XLA lockstep traversal pays max-over-all-rays iterations and is bound by
  the HBM gather row-rate (~376 Mrows/s). Here the node fetch is a scalar
  ``dynamic_slice`` from VMEM (Mosaic has no vector gather — also measured)
  and costs ~nothing.
* The Pallas grid is sequential on a TPU core, so a per-tile ``while_loop``
  exit means total work is *sum over tiles of each tile's own walk length*,
  not frame-max. A tile of coherent rays stops as soon as its union walk is
  done.
* Ray state is [8, 128] blocks (one f32 vreg per component): every vector
  op runs with all VPU lanes busy. Triangle data is consumed as [1, 1]
  broadcast slices of the gathered 128-float cluster row — never through a
  trailing dim of 3 (vreg-padding cliff).

Grouping changes traversal *order* only: strict ``t < closest_t``
comparisons keep the closest hit identical to the per-ray tracer (and the
GLSL reference) to float precision.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.core.fast_types import (CLUSTER_ROW, CLUSTER_SIZE,
                                           FastScene, LEAF_CID_BITS,
                                           LEAF_CID_MASK, SUB_MASK,
                                           SUB_SHIFT, SUBS_PER_ROW,
                                           TRI_STRIDE, WIDE_WIDTH)
from raytracer_tpu.core.types import RenderConfig
from raytracer_tpu.kernels.tracer import TraversalResult

import os as _os

# One tile = `sublanes` f32 vector register planes of rays sharing one
# walk. Bigger tiles amortize per-visit scalar costs over more rays but
# union more divergent needs; the optimum shifts DOWN as per-visit costs
# shrink. With the BVH8 stack kernel (exp17 sweep, 184k flagship band):
# primaries S=8 1.00 ms (184 Mrays/s), sorted bounce-1 S=16 8.09 ms.
# Floor of 8: Mosaic requires the sublane dim of a VMEM block be a
# multiple of 8 (or the full array) — smaller values fail to lower.
PRIMARY_SUBLANES = max(8, int(_os.environ.get("RAYTPU_PALLAS_SUBLANES",
                                              "8")))
BOUNCE_SUBLANES = max(8, int(_os.environ.get("RAYTPU_PALLAS_BSUBLANES",
                                             "16")))
BLOCK_LANES = 128
BLOCK = PRIMARY_SUBLANES * BLOCK_LANES  # primary-path tile, rays
# Tree steps per while-loop iteration (amortizes loop overhead; the second
# step is masked out once the tile's walk finishes).
TRACE_UNROLL = int(_os.environ.get("RAYTPU_PALLAS_UNROLL", "1"))


def _trace_kernel(num_ref, nodes_ref, npack_ref, clusters_ref,
                  rox_ref, roy_ref, roz_ref,
                  rdx_ref, rdy_ref, rdz_ref, act_ref,
                  t_ref, nx_ref, ny_ref, nz_ref,
                  ar_ref, ag_ref, ab_ref, mt_ref,
                  nrow_smem, nrow_sem, crow_smem, crow_sem,
                  *, t_min, t_max, det_eps, flip_normals, node_src):
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

    def cond(carry):
        return carry[0] < num_nodes

    def step(carry):
        node, cur_row = carry
        valid = node < num_nodes
        safe = jnp.where(valid, node, 0)
        if node_src == "pack":
            # 16 nodes per 128-float packed row, links as exact float
            # ints; DMA VMEM->SMEM only when the row changes. Pre-order
            # left child = node+1, so downward edges stay in-row 15/16 of
            # the time; bounds + links become SMEM scalar loads instead
            # of VMEM lane extracts (1.8x on sorted bounce-1 — exp11).
            row = safe // 16
            off = (safe % 16) * 8

            @pl.when(row != cur_row)
            def _():
                dma = pltpu.make_async_copy(npack_ref.at[row],
                                            nrow_smem, nrow_sem)
                dma.start()
                dma.wait()

            def nget(j):
                return nrow_smem[off + j]

            skip = nget(6).astype(jnp.int32)
            col7 = nget(7).astype(jnp.int32)
        else:  # "extract"
            row = cur_row
            nrow = nodes_ref[pl.ds(safe, 1), :]            # f32 [1, 8]
            icols = jax.lax.bitcast_convert_type(nrow[:, 6:8], jnp.int32)
            skip = icols[0, 0]
            col7 = icols[0, 1]  # leaf -> cluster id; internal -> -(left+1)

            def nget(j):
                return nrow[0, j]

        # Slab test: node bounds as true scalar loads (Mosaic broadcasts
        # scalars to vregs; [1,1]-vector broadcasts it does not — exp7).
        def axis(lo, hi, ro, iv):
            q0 = (nget(lo) - ro) * iv
            q1 = (nget(hi) - ro) * iv
            return jnp.minimum(q0, q1), jnp.maximum(q0, q1)

        e0, x0 = axis(0, 3, rox, ivx)
        e1_, x1 = axis(1, 4, roy, ivy)
        e2_, x2 = axis(2, 5, roz, ivz)
        t_enter = jnp.maximum(e0, jnp.maximum(e1_, e2_))
        t_exit = jnp.minimum(x0, jnp.minimum(x1, x2))
        closest = t_ref[:]
        hit = ((t_exit > t_enter) & (t_exit > t_min)
               & (t_enter < closest) & active)
        anyhit = jnp.any(hit) & valid
        is_leaf = col7 >= 0

        @pl.when(anyhit & is_leaf)
        def _():
            # Stage the cluster row in SMEM: the 104 per-triangle scalar
            # reads below then come from scalar memory instead of VMEM
            # lane extracts (1.5x whole-traversal win — exp10b). At
            # CLUSTER_SIZE < 8 the leaf is a subcluster of a shared
            # 128-float row (core/fast_types.py): DMA the whole row,
            # read at the subcluster's scalar offset.
            crow = col7 >> SUB_SHIFT if SUBS_PER_ROW > 1 else col7
            dma = pltpu.make_async_copy(clusters_ref.at[crow],
                                        crow_smem, crow_sem)
            dma.start()
            dma.wait()
            if SUBS_PER_ROW > 1:
                cbase = (col7 & jnp.int32(SUB_MASK)) \
                    * jnp.int32(CLUSTER_SIZE * TRI_STRIDE)
            else:
                cbase = 0  # python int: T=8 indexing is unchanged
            closest = t_ref[:]
            nx, ny, nz = nx_ref[:], ny_ref[:], nz_ref[:]
            ar, ag, ab = ar_ref[:], ag_ref[:], ab_ref[:]
            mt = mt_ref[:]
            for k in range(CLUSTER_SIZE):
                b = k * TRI_STRIDE

                def s(j, b=b):  # scalar load (broadcasts to vregs)
                    return crow_smem[cbase + b + j]

                # Record: v0, e1, e2, albedo, type, unit normal — edges and
                # normal precomputed at pack time (core/fast_types.py).
                v0x, v0y, v0z = s(0), s(1), s(2)
                e1x, e1y, e1z = s(3), s(4), s(5)
                e2x, e2y, e2z = s(6), s(7), s(8)
                nux, nuy, nuz = s(13), s(14), s(15)

                # Möller–Trumbore vs all 1024 rays
                # (compute_dynamic_ray.comp:105-129).
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

                # Flip toward the ray deferred to walk end (bit-identical:
                # only the winner's normal survives).
                closest = jnp.where(ok, tt, closest)
                nx = jnp.where(ok, nux, nx)
                ny = jnp.where(ok, nuy, ny)
                nz = jnp.where(ok, nuz, nz)
                ar = jnp.where(ok, s(9), ar)
                ag = jnp.where(ok, s(10), ag)
                ab = jnp.where(ok, s(11), ab)
                mt = jnp.where(ok, s(12), mt)
            t_ref[:] = closest
            nx_ref[:], ny_ref[:], nz_ref[:] = nx, ny, nz
            ar_ref[:], ag_ref[:], ab_ref[:] = ar, ag, ab
            mt_ref[:] = mt

        nxt = jnp.where(anyhit & (col7 < 0), -col7 - jnp.int32(1), skip)
        return jnp.where(valid, nxt, node), row

    def body(carry):
        for _ in range(TRACE_UNROLL):
            carry = step(carry)
        return carry

    jax.lax.while_loop(cond, body, (node0, jnp.int32(-1)))
    if flip_normals:
        # Deferred flip of the winner's unit normal (see the leaf loop).
        # No-hit lanes hold n == 0: dot == 0, sgn == 1, unchanged.
        fnx, fny, fnz = nx_ref[:], ny_ref[:], nz_ref[:]
        flip = (rdx * fnx + rdy * fny + rdz * fnz) > 0.0
        sgn = jnp.where(flip, -1.0, 1.0)
        nx_ref[:] = sgn * fnx
        ny_ref[:] = sgn * fny
        nz_ref[:] = sgn * fnz


from raytracer_tpu.core.fast_types import WIDE_ROWS

WIDE = WIDE_WIDTH  # children per wide node (8: one 128-float row per
#                    node; 16: two rows, node i at rows 2i, 2i+1)


def batcher_network(n: int) -> list[tuple[int, int]]:
    """Batcher odd-even mergesort comparator network for n a power of two
    (19 comparators at n=8, 63 at n=16) — orders child pushes near-first
    by centroid projection in the traversal kernels."""
    net = []
    p = 1
    while p < n:
        k = p
        while k >= 1:
            for j in range(k % p, n - k, 2 * k):
                for i in range(min(k, n - j - k)):
                    if (i + j) // (2 * p) == (i + j + k) // (2 * p):
                        net.append((i + j, i + j + k))
            k //= 2
        p *= 2
    return net


# The historical hand-written 8-network (a different but equivalent
# 19-comparator Batcher ordering) is kept verbatim at width 8 so
# traversal order — hence equal-t tie wins — stays bit-identical to the
# long-measured kernel; the generator covers width 16.
_HIST8 = [(0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6), (5, 7),
          (1, 2), (5, 6), (0, 4), (3, 7), (1, 5), (2, 6), (1, 4), (3, 6),
          (2, 4), (3, 5), (3, 4)]
_NET8 = _HIST8 if WIDE == 8 else batcher_network(WIDE)


def _trace4_kernel(num_ref, npack_ref, clusters_ref,
                   rox_ref, roy_ref, roz_ref,
                   rdx_ref, rdy_ref, rdz_ref, act_ref,
                   t_ref, nx_ref, ny_ref, nz_ref,
                   ar_ref, ag_ref, ab_ref, mt_ref,
                   stack_smem, nrow_smem, nrow_sem, crow_smem, crow_sem,
                   *, t_min, t_max, det_eps, flip_normals):
    """Wide-BVH traversal: SMEM stack of node ids, WIDE child slab tests
    per visit (extra vector work + reductions are ~free — exp14/15/17),
    leaf children inline via overlapped cluster-row DMAs."""
    rox, roy, roz = rox_ref[:], roy_ref[:], roz_ref[:]
    rdx, rdy, rdz = rdx_ref[:], rdy_ref[:], rdz_ref[:]
    ivx, ivy, ivz = 1.0 / rdx, 1.0 / rdy, 1.0 / rdz
    active = act_ref[:] > 0.5

    shape = rox.shape
    t_ref[:] = jnp.full(shape, t_max, jnp.float32)
    zero = jnp.zeros(shape, jnp.float32)
    for ref in (nx_ref, ny_ref, nz_ref, ar_ref, ag_ref, ab_ref, mt_ref):
        ref[:] = zero

    # Mean tile direction (one-time reductions): orders child pushes
    # near-first, which tightens closest-t before far subtrees pop and
    # culls whole visits (sorted bounce-1 6.10 vs 7.81 ms — exp18).
    mdx = jnp.sum(jnp.where(active, rdx, 0.0))
    mdy = jnp.sum(jnp.where(active, rdy, 0.0))
    mdz = jnp.sum(jnp.where(active, rdz, 0.0))

    # Prefetching loop shape (exp16 "pf", ~9% faster than DMA-at-top):
    # after the pushes, the next stack top is known, so its node-row DMA
    # starts before the leaf phase and overlaps the cluster work + loop
    # backedge; the wait sits at the next iteration's top.
    def node_rows(nid):
        """Table slice holding wide node ``nid`` (WIDE_ROWS rows)."""
        if WIDE_ROWS == 1:
            return npack_ref.at[nid]
        return npack_ref.at[pl.ds(nid * WIDE_ROWS, WIDE_ROWS)]

    boot = pltpu.make_async_copy(node_rows(jnp.int32(0)), nrow_smem,
                                 nrow_sem)
    boot.start()
    boot.wait()
    have0 = jnp.any(active)

    def cond(carry):
        return carry[0]

    def body(carry):
        have, nid, sp, resident, pending = carry

        @pl.when(pending)
        def _():
            pltpu.make_async_copy(node_rows(resident), nrow_smem,
                                  nrow_sem).wait()

        closest = t_ref[:]
        any_c, meta_c, hit_c, key_c = [], [], [], []
        for cc in range(WIDE):
            b = 16 * cc

            def g(j, b=b):
                if WIDE_ROWS == 1:
                    return nrow_smem[b + j]
                return nrow_smem[(b + j) // 128, (b + j) % 128]

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
            key_c.append((g(0) + g(3)) * mdx + (g(1) + g(4)) * mdy
                         + (g(2) + g(5)) * mdz)

        # Pushes + next-top prefetch BEFORE the leaf phase: nrow_smem is
        # dead once the slab loop has extracted bounds and metas. Pushes
        # are sorted far-to-near (scalar Batcher network on centroid
        # projections) so the nearest subtree pops first.
        trip = [[key_c[i], meta_c[i], any_c[i] & (meta_c[i] > 0)]
                for i in range(WIDE)]
        for i, j in _NET8:
            a_, b_ = trip[i], trip[j]
            sw = b_[0] > a_[0]  # descending key = far first
            for f in range(3):
                ai, bi = a_[f], b_[f]
                a_[f] = jnp.where(sw, bi, ai)
                b_[f] = jnp.where(sw, ai, bi)

        off = jnp.int32(0)
        for _, pmeta, push in trip:
            @pl.when(push)
            def _(pmeta=pmeta, off=off):
                stack_smem[sp + off] = pmeta - jnp.int32(1)

            off = off + push.astype(jnp.int32)
        sp2 = sp + off
        have2 = sp2 > 0
        sp3 = jnp.maximum(sp2 - 1, 0)
        nid2 = stack_smem[sp3]
        pend2 = have2 & (nid2 != resident)

        @pl.when(pend2)
        def _():
            pltpu.make_async_copy(node_rows(nid2), nrow_smem,
                                  nrow_sem).start()

        # Leaf phase, two passes: start every hit leaf child's cluster
        # DMA first (per-child SMEM slots), then wait+process — child 0's
        # triangle tests overlap children 1..3's DMAs (and all of them
        # overlap the next-node prefetch above).
        for group in range(0, WIDE, 4):
            # Groups of 4: start the group's DMAs (per-child slots), then
            # wait+process — slots are reused across groups, so a group's
            # processing must finish before the next group's starts.
            # Leaf metas are count-encoded (bvh/bvh4.py): cluster id in
            # the low LEAF_CID_BITS, live-triangle count above. The
            # second half-cluster is processed only when count > 4 —
            # ~21% of flagship leaves are at most half full, and their
            # padding triangles can never hit (det == 0), so skipping is
            # exactly result-neutral.
            for cc in range(group, group + 4):
                @pl.when(any_c[cc] & (meta_c[cc] < 0))
                def _(cc=cc):
                    lid = -meta_c[cc] - jnp.int32(1)
                    cid = lid & jnp.int32(LEAF_CID_MASK)
                    # At CLUSTER_SIZE < 8 a leaf is a subcluster of a
                    # shared 128-float row (core/fast_types.py): DMA
                    # the whole row, offset the scalar reads below.
                    crow = cid >> SUB_SHIFT if SUBS_PER_ROW > 1 else cid
                    pltpu.make_async_copy(clusters_ref.at[crow],
                                          crow_smem.at[cc % 4],
                                          crow_sem.at[cc % 4]).start()

            def mt_half(cc, lo_k, hi_k):
                if SUBS_PER_ROW > 1:
                    cid_s = (-meta_c[cc] - jnp.int32(1)) \
                        & jnp.int32(LEAF_CID_MASK)
                    cbase = (cid_s & jnp.int32(SUB_MASK)) \
                        * jnp.int32(CLUSTER_SIZE * TRI_STRIDE)
                else:
                    cbase = 0  # python int: T=8 indexing is unchanged
                cl = t_ref[:]
                nx, ny, nz = nx_ref[:], ny_ref[:], nz_ref[:]
                ar, ag, ab = ar_ref[:], ag_ref[:], ab_ref[:]
                mt = mt_ref[:]
                for k in range(lo_k, hi_k):
                    b = k * TRI_STRIDE

                    def s(j, b=b, cc=cc):
                        return crow_smem[cc % 4, cbase + b + j]

                    # Precomputed record: v0, e1, e2, albedo, type,
                    # unit normal (pack time, core/fast_types.py).
                    v0x, v0y, v0z = s(0), s(1), s(2)
                    e1x, e1y, e1z = s(3), s(4), s(5)
                    e2x, e2y, e2z = s(6), s(7), s(8)
                    nux, nuy, nuz = s(13), s(14), s(15)

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
                    ok &= (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
                    ok &= (u + v <= 1.0)
                    ok &= (tt > t_min) & (tt < cl) & hit_c[cc]

                    # Normal flip toward the ray is DEFERRED to walk end
                    # (flipping only the final winner is bit-identical;
                    # ~9 vector ops per tri saved).
                    cl = jnp.where(ok, tt, cl)
                    nx = jnp.where(ok, nux, nx)
                    ny = jnp.where(ok, nuy, ny)
                    nz = jnp.where(ok, nuz, nz)
                    ar = jnp.where(ok, s(9), ar)
                    ag = jnp.where(ok, s(10), ag)
                    ab = jnp.where(ok, s(11), ab)
                    mt = jnp.where(ok, s(12), mt)
                t_ref[:] = cl
                nx_ref[:], ny_ref[:], nz_ref[:] = nx, ny, nz
                ar_ref[:], ag_ref[:], ab_ref[:] = ar, ag, ab
                mt_ref[:] = mt

            for cc in range(group, group + 4):
                is_leaf_c = any_c[cc] & (meta_c[cc] < 0)

                @pl.when(is_leaf_c)
                def _(cc=cc):
                    lid = -meta_c[cc] - jnp.int32(1)
                    cid = lid & jnp.int32(LEAF_CID_MASK)
                    crow = cid >> SUB_SHIFT if SUBS_PER_ROW > 1 else cid
                    pltpu.make_async_copy(clusters_ref.at[crow],
                                          crow_smem.at[cc % 4],
                                          crow_sem.at[cc % 4]).wait()
                    mt_half(cc, 0, CLUSTER_SIZE // 2)

                @pl.when(is_leaf_c
                         & ((-meta_c[cc] - 1)
                            >> jnp.int32(LEAF_CID_BITS)
                            >= jnp.int32(CLUSTER_SIZE // 2)))
                def _(cc=cc):
                    mt_half(cc, CLUSTER_SIZE // 2, CLUSTER_SIZE)

        return have2, nid2, sp3, nid2, pend2

    jax.lax.while_loop(cond, body, (have0, jnp.int32(0), jnp.int32(0),
                                    jnp.int32(0), jnp.bool_(False)))
    if flip_normals:
        # Deferred flip of the winner's unit normal (see mt_half).
        # No-hit lanes hold n == 0: dot == 0, sgn == 1, unchanged.
        fnx, fny, fnz = nx_ref[:], ny_ref[:], nz_ref[:]
        flip = (rdx * fnx + rdy * fny + rdz * fnz) > 0.0
        sgn = jnp.where(flip, -1.0, 1.0)
        nx_ref[:] = sgn * fnx
        ny_ref[:] = sgn * fny
        nz_ref[:] = sgn * fnz


# SMEM stack capacity: each visit pops 1 and pushes <= WIDE entries, so
# occupancy <= (WIDE-1)*depth + 1. bvh/bvh4.py (STACK_CAP there) refuses
# to build a wide table deeper than this bound; keep the two in sync.
STACK4_CAP = 256  # 1 KB of SMEM (2 KB proven)


@functools.partial(jax.jit, static_argnames=("sublanes", "t_min", "t_max",
                                             "det_eps", "flip_normals",
                                             "interpret"))
def _trace4_call(num_nodes4, nodes4, clusters, comps, sublanes,
                 t_min, t_max, det_eps, flip_normals, interpret):
    rows = comps[0].shape[0]
    grid = rows // sublanes
    block = pl.BlockSpec((sublanes, BLOCK_LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    resident = pl.BlockSpec(memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _trace4_kernel, t_min=t_min, t_max=t_max, det_eps=det_eps,
        flip_normals=flip_normals)
    out = jax.ShapeDtypeStruct((rows, BLOCK_LANES), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  resident, resident] + [block] * 7,
        out_shape=(out,) * 8,
        out_specs=(block,) * 8,
        scratch_shapes=[pltpu.SMEM((STACK4_CAP,), jnp.int32),
                        pltpu.SMEM((128,) if WIDE_ROWS == 1
                                   else (WIDE_ROWS, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SMEM((4, CLUSTER_ROW), jnp.float32),
                        pltpu.SemaphoreType.DMA((4,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(num_nodes4, nodes4, clusters, *comps)


@functools.partial(jax.jit, static_argnames=("sublanes", "t_min", "t_max",
                                             "det_eps", "flip_normals",
                                             "interpret", "node_src"))
def _trace_call(num_nodes, nodes, clusters, comps, sublanes,
                t_min, t_max, det_eps, flip_normals, interpret, node_src):
    rows = comps[0].shape[0]
    grid = rows // sublanes
    block = pl.BlockSpec((sublanes, BLOCK_LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    resident = pl.BlockSpec(memory_space=pltpu.VMEM)  # whole table, on-chip

    if node_src == "pack":
        # Derived packed layout: 16 nodes per 128-float row, links
        # converted from bitcast-i32 to exact float ints (node/cluster
        # counts < 2^24). Rebuilt per call — a [M,8] elementwise op, noise
        # next to traversal; keeps FastScene single-source.
        m = nodes.shape[0]
        mpad = -(-m // 16) * 16
        links_f = jax.lax.bitcast_convert_type(
            nodes[:, 6:8], jnp.int32).astype(jnp.float32)
        flat = jnp.concatenate([nodes[:, :6], links_f], axis=1)
        npack = jnp.zeros((mpad, 8), jnp.float32).at[:m].set(
            flat).reshape(mpad // 16, 128)
    else:
        npack = jnp.zeros((8, 128), jnp.float32)  # unused placeholder

    kernel = functools.partial(
        _trace_kernel, t_min=t_min, t_max=t_max, det_eps=det_eps,
        flip_normals=flip_normals, node_src=node_src)
    out = jax.ShapeDtypeStruct((rows, BLOCK_LANES), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  resident, resident, resident] + [block] * 7,
        out_shape=(out,) * 8,
        out_specs=(block,) * 8,
        scratch_shapes=[pltpu.SMEM((128,), jnp.float32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SMEM((CLUSTER_ROW,), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            # Tables (nodes + clusters ~9 MB at 50k tris) + whatever
            # block/operand staging XLA decides to scope into VMEM; 12 MB
            # was too tight when callers pass loop-invariant ray state
            # (hoisted operands get VMEM-scoped — measured, exp9).
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(num_nodes, nodes, npack, clusters, *comps)


def pick_tile(h: int, w: int, block: int = 0):
    """Most compact pixel tile with ``block`` rays that divides the frame
    (squarer = more coherent — measured, exp6)."""
    block = block or BLOCK
    th = 1
    while th * th < block:
        th *= 2
    while th >= 1:
        tw = block // th
        if h % th == 0 and w % tw == 0:
            return th, tw
        th //= 2
    return None


def pallas_traverse(scene: FastScene, ray_o, ray_d, active,
                    cfg: RenderConfig,
                    interpret: bool | None = None,
                    sublanes: int = 0,
                    node_src: str | None = None) -> TraversalResult:
    """Closest-hit for flat [P] SoA rays, P a multiple of the tile size
    (``sublanes``*128 rays; 0 = PRIMARY_SUBLANES default).

    Consecutive tile-sized groups should be spatially coherent (the caller
    orders primaries tile-major); correctness does not depend on it.
    ``node_src``: "pack" (default) fetches node rows via change-detected
    SMEM DMAs from a 16-node packed table; "extract" reads bounds as VMEM
    lane extracts (RAYTPU_NODE_SRC overrides the default for A/B).

    NOTE on the env knobs: RAYTPU_NODE_SRC and RAYTPU_TRAVERSE are read at
    *trace time*. Once a caller's jit cache is warm, changing them has no
    effect, and two traces in one process can disagree with the current
    env. They are A/B measurement switches, deliberately not part of
    RenderConfig; set them before the first render of the process.
    """
    sublanes = sublanes or PRIMARY_SUBLANES
    if node_src is None:
        node_src = _os.environ.get("RAYTPU_NODE_SRC", "pack")
    block = sublanes * BLOCK_LANES
    p = ray_o[0].shape[0]
    if p % block:
        raise ValueError(f"ray count {p} not a multiple of {block}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    rows = p // BLOCK_LANES
    comps = tuple(c.reshape(rows, BLOCK_LANES)
                  for c in (*ray_o, *ray_d)) + (
        active.astype(jnp.float32).reshape(rows, BLOCK_LANES),)

    use_bvh4 = (getattr(scene, "nodes4", None) is not None
                and node_src != "extract"
                and _os.environ.get("RAYTPU_TRAVERSE", "bvh4") == "bvh4")
    if use_bvh4:
        num4 = jnp.asarray(scene.num_nodes4, jnp.int32).reshape(1)
        outs = _trace4_call(num4, scene.nodes4, scene.clusters, comps,
                            sublanes, float(cfg.t_min), float(cfg.t_max),
                            float(cfg.det_eps),
                            cfg.shading != "fixed_light", interpret)
    else:
        num = jnp.asarray(scene.num_nodes, jnp.int32).reshape(1)
        outs = _trace_call(num, scene.nodes8, scene.clusters, comps,
                           sublanes, float(cfg.t_min), float(cfg.t_max),
                           float(cfg.det_eps),
                           cfg.shading != "fixed_light", interpret,
                           node_src)
    t, nx, ny, nz, ar, ag, ab, mt = (o.reshape(p) for o in outs)
    return TraversalResult(t, t < cfg.t_max, (nx, ny, nz), (ar, ag, ab), mt)
