"""Traverse + shade in one Pallas call: the per-tile bounce kernel.

The TPU analogue of the reference megakernel's per-workgroup bounce loop
(``compute_dynamic_ray.comp:179-210``): each tile loops traverse ->
shade -> respawn internally until its rays die or hit the bounce cap
``bcap``, removing per-round sort, shade fusion, and dispatch overhead.

Two production uses:
* ``bcap=1`` — ONE fused round for the sorted-wavefront path
  (kernels/wavefront.py, the default bounce engine): the per-round sort/
  compaction stays in XLA, but traversal + the whole material model run
  in one kernel, so ray state makes a single HBM round trip per round
  instead of one per shade fusion.
* ``bcap=max_bounces-1`` — the whole chain after ONE sort
  (RAYTPU_BOUNCE=pmega). Measured SLOWER at full frame (2.75 vs
  6.11 FPS, exp20): without in-kernel compaction every tile re-walks
  until its last ray dies. Kept as the base for a future
  occupancy-compacting variant.

Shading is the full material model ported to Mosaic: PCG32 (vector u32
ops incl. the variable-amount shift, ``compute_dynamic_ray.comp:52-56``),
the reference's masked in-sphere rejection sampling (stream-aligned draw
for draw with kernels/rng.py, bounded at REJECTION_ROUNDS on both sides),
sky gradient (``:81-85``), Lambertian / metal / fuzzy metal / emissive
(``:132-154``).

State rides in 15 blocks (o3 d3 color3 atten3 seed act budget) -> 18
outputs (advanced state + per-tile rays-traced and final-live count rows
+ the next round's pd5 sort key). Seeds ride in an int32
block: bitcast-int f32 data through XLA f32 ops flushes denormals and
canonicalizes NaNs on TPU (see CLAUDE.md / bvh/lbvh.py).

Mosaic notes: no u32->f32 cast (emulated via i32 + wraparound add);
nested while loops (bounce loop around the walk loop) compile fine.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.core.fast_types import (CLUSTER_ROW, CLUSTER_SIZE,
                                           LEAF_CID_BITS, LEAF_CID_MASK,
                                           SUB_MASK, SUB_SHIFT,
                                           SUBS_PER_ROW, TRI_STRIDE)
from raytracer_tpu.kernels.rng import REJECTION_ROUNDS

LANES = 128
# Keep in sync with bvh/bvh4.py STACK_CAP: the collapse refuses to build
# trees whose worst-case stack occupancy ((WIDTH-1)*depth + 1) exceeds it.
STACK_CAP = 256
# Wide-node width and table rows per node (1 at 8, 2 at 16) — single
# source core/fast_types.py (RAYTPU_WIDE A/B knob; see the note there).
from raytracer_tpu.core.fast_types import WIDE_ROWS, WIDE_WIDTH  # noqa: E402

WIDTH = WIDE_WIDTH
from raytracer_tpu.kernels.pallas_trace import _NET8 as NET8  # noqa: E402

SPHERE_ITERS = REJECTION_ROUNDS


def _pcg(v):
    state = v * jnp.uint32(747796405) + jnp.uint32(2891336453)
    shift = (state >> jnp.uint32(28)) + jnp.uint32(4)
    word = ((state >> shift) ^ state) * jnp.uint32(277803737)
    return (word >> jnp.uint32(22)) ^ word


def _unit(seed):
    # Mosaic has no u32->f32 cast; go through i32 with a wraparound fix.
    i = jax.lax.bitcast_convert_type(seed, jnp.int32)
    f = i.astype(jnp.float32)
    f = jnp.where(i < 0, f + jnp.float32(4294967296.0), f)
    return f / jnp.float32(4294967295.0)


def _draw(seed, active):
    ns = jnp.where(active, _pcg(seed), seed)
    return ns, _unit(ns)


def _sphere(seed, active):
    """rng.random_vec3_in_unit_sphere: 3 discarded draws then 3 draws per
    rejection round, bounded; masked identically to the XLA version."""
    for _ in range(3):
        seed, dummy = _draw(seed, active)
    x = jnp.zeros_like(dummy)
    y = jnp.zeros_like(dummy)
    z = jnp.zeros_like(dummy)
    need = active
    for _ in range(SPHERE_ITERS):
        seed, cx = _draw(seed, need)
        seed, cy = _draw(seed, need)
        seed, cz = _draw(seed, need)
        cx = cx * 2.0 - 1.0
        cy = cy * 2.0 - 1.0
        cz = cz * 2.0 - 1.0
        inside = (cx * cx + cy * cy + cz * cz) < 1.0
        take = need & inside
        x = jnp.where(take, cx, x)
        y = jnp.where(take, cy, y)
        z = jnp.where(take, cz, z)
        need = need & ~inside
    return seed, x, y, z


class _RowView:
    """[:]-get/set view of one leading-dim row of a 3-D Pallas ref.

    Lets the kernel core below address a field either as its own
    [sub, LANES] ref (legacy 14-block interface) or as row ``idx`` of a
    packed [fields, sub, LANES] ref (packed interface) with identical
    syntax; the leading index is a Python int, so Mosaic sees a static
    leading-dim slice of a VMEM block.
    """

    __slots__ = ("ref", "idx")

    def __init__(self, ref, idx):
        self.ref = ref
        self.idx = idx

    def __getitem__(self, _):
        return self.ref[self.idx]

    def __setitem__(self, _, value):
        self.ref[self.idx] = value


def _kernel_core(num_ref, npack_ref, clusters_ref, ins, outs,
                 bud_in, bud_r,
                 sky_ref, bcap_ref, bounds_ref, rays_r, live_r, key_r,
                 stack_s, row_s, crow_s, sema, csem,
                 t_s, nx_s, ny_s, nz_s, tar_s, tag_s, tab_s, tmt_s,
                 tcid_s,
                 *, t_min, t_max, det_eps, fuzz_const, emissive_emits,
                 ordered=True, key_mode="pd5"):
        # Two state layouts: 14 refs (with color columns) or 11 refs —
        # the "no-color" carry exploits the invariant that a ray's color
        # is written ONLY in the round it dies (miss -> sky, emissive ->
        # add-and-die, absorb/kill -> black): the death deposit rides in
        # the attenuation columns instead, cutting 3 columns of per-round
        # sort traffic and 6 of the kernel's HBM block transfers.
        carry_color = len(outs) == 14
        if carry_color:
            (rox_r, roy_r, roz_r, rdx_r, rdy_r, rdz_r,
             cr_r, cg_r, cb_r, ar_r, ag_r, ab_r, seed_r, act_r) = outs
        else:
            (rox_r, roy_r, roz_r, rdx_r, rdy_r, rdz_r,
             ar_r, ag_r, ab_r, seed_r, act_r) = outs
        # Copy state into the output refs; everything below mutates those.
        for src, dst in zip(ins, outs):
            dst[:] = src[:]
        if bud_in is None:
            # No per-ray budget wired (packed interface): never gates.
            bud_r[:] = jnp.full_like(bud_r[:], jnp.int32(1 << 30))
        else:
            bud_r[:] = bud_in[:]
        # Count rows ride (1, 8, 128) blocks — Mosaic requires sublane
        # block dims divisible by 8, so the counts live in sublane 0 and
        # the rest are zeroed here (consumers jnp.sum the whole array).
        rays_r[:] = jnp.zeros_like(rays_r[:])
        live_r[:] = jnp.zeros_like(live_r[:])
        if key_mode == "cid":
            # Must init OUTSIDE the bounce loop too: a tile whose rays
            # are all dead on entry never runs walk() (bcond gates on
            # any(act)), yet the key emission below still reads tcid_s —
            # uninitialized VMEM garbage shifted <<3 could set bit 31
            # and sort dead rays AHEAD of live ones (interpret mode
            # zero-fills scratch; real VMEM does not).
            tcid_s[:] = jnp.zeros_like(tcid_s[:])

        sky_on = sky_ref[0] > 0
        bcap = bcap_ref[0]

        def walk():
            rox, roy, roz = rox_r[:], roy_r[:], roz_r[:]
            rdx, rdy, rdz = rdx_r[:], rdy_r[:], rdz_r[:]
            ivx, ivy, ivz = 1.0 / rdx, 1.0 / rdy, 1.0 / rdz
            active = act_r[:] > 0.5
            shape = rox.shape
            t_s[:] = jnp.full(shape, t_max, jnp.float32)
            zero = jnp.zeros(shape, jnp.float32)
            for r in (nx_s, ny_s, nz_s, tar_s, tag_s, tab_s, tmt_s):
                r[:] = zero
            if key_mode == "cid":
                tcid_s[:] = jnp.zeros(shape, jnp.int32)

            if ordered:
                mdx = jnp.sum(jnp.where(active, rdx, 0.0))
                mdy = jnp.sum(jnp.where(active, rdy, 0.0))
                mdz = jnp.sum(jnp.where(active, rdz, 0.0))

            def node_rows(nid):
                # Table slice of wide node ``nid`` (WIDE_ROWS rows).
                if WIDE_ROWS == 1:
                    return npack_ref.at[nid]
                return npack_ref.at[pl.ds(nid * WIDE_ROWS, WIDE_ROWS)]

            boot = pltpu.make_async_copy(node_rows(jnp.int32(0)), row_s,
                                         sema)
            boot.start()
            boot.wait()

            def cond(c):
                return c[0]

            def body(c):
                have, nid, sp, resident, pending = c

                @pl.when(pending)
                def _():
                    pltpu.make_async_copy(node_rows(resident), row_s,
                                          sema).wait()

                closest = t_s[:]
                any_c, meta_c, hit_c, key_c = [], [], [], []
                for cc in range(WIDTH):
                    b = 16 * cc
                    if WIDE_ROWS == 1:
                        g = lambda j, b=b: row_s[b + j]
                    else:
                        g = (lambda j, b=b:
                             row_s[(b + j) // 128, (b + j) % 128])
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
                    if ordered:
                        key_c.append((g(0) + g(3)) * mdx
                                     + (g(1) + g(4)) * mdy
                                     + (g(2) + g(5)) * mdz)

                # ordered=False (deep incoherent rounds): skip the
                # near-first push network — the tile's mean direction is
                # ~zero there, so the centroid key is noise and the 19
                # scalar comparator swaps buy no pruning.
                if ordered:
                    trip = [[key_c[i], meta_c[i],
                             any_c[i] & (meta_c[i] > 0)]
                            for i in range(WIDTH)]
                    for i, j in NET8:
                        a_, b_ = trip[i], trip[j]
                        sw = b_[0] > a_[0]
                        for f in range(3):
                            ai, bi = a_[f], b_[f]
                            a_[f] = jnp.where(sw, bi, ai)
                            b_[f] = jnp.where(sw, ai, bi)
                else:
                    trip = [[None, meta_c[i], any_c[i] & (meta_c[i] > 0)]
                            for i in range(WIDTH)]

                off = jnp.int32(0)
                for _, pmeta, push in trip:
                    @pl.when(push)
                    def _(pmeta=pmeta, off=off):
                        stack_s[sp + off] = pmeta - jnp.int32(1)

                    off = off + push.astype(jnp.int32)
                sp2 = sp + off
                have2 = sp2 > 0
                sp3 = jnp.maximum(sp2 - 1, 0)
                nid2 = stack_s[sp3]
                pend2 = have2 & (nid2 != resident)

                @pl.when(pend2)
                def _():
                    pltpu.make_async_copy(node_rows(nid2), row_s,
                                          sema).start()

                # Count-encoded leaf metas (bvh/bvh4.py): cluster id in
                # the low LEAF_CID_BITS, live-triangle count above; the
                # second half-cluster runs only when count > 4 (padding
                # tris have det == 0, so skipping is result-neutral).
                def mt_half(cc, lo_k, hi_k):
                    if SUBS_PER_ROW > 1:
                        # Subcluster scalar offset into the shared
                        # 128-float row (core/fast_types.py).
                        cid_b = (-meta_c[cc] - jnp.int32(1)) \
                            & jnp.int32(LEAF_CID_MASK)
                        cbase = (cid_b & jnp.int32(SUB_MASK)) \
                            * jnp.int32(CLUSTER_SIZE * TRI_STRIDE)
                    else:
                        cbase = 0  # python int: T=8 unchanged
                    cl = t_s[:]
                    nx, ny, nz = nx_s[:], ny_s[:], nz_s[:]
                    tar, tag, tab = tar_s[:], tag_s[:], tab_s[:]
                    tmt = tmt_s[:]
                    if key_mode == "cid":
                        # winner cluster id, for the emitted sort key
                        tci = tcid_s[:]
                        cid_i = (-meta_c[cc] - jnp.int32(1)) \
                            & jnp.int32(LEAF_CID_MASK)
                    for k in range(lo_k, hi_k):
                        b = k * TRI_STRIDE
                        s = (lambda j, b=b, cc=cc:
                             crow_s[cc % 4, cbase + b + j])
                        # Precomputed record: v0, e1, e2, albedo,
                        # type, unit normal (core/fast_types.py).
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
                        sx = rox - v0x
                        sy = roy - v0y
                        sz = roz - v0z
                        u = invd * (sx * pvx + sy * pvy + sz * pvz)
                        qx = sy * e1z - sz * e1y
                        qy = sz * e1x - sx * e1z
                        qz = sx * e1y - sy * e1x
                        v = invd * (rdx * qx + rdy * qy + rdz * qz)
                        tt = invd * (e2x * qx + e2y * qy
                                     + e2z * qz)
                        ok &= (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
                        ok &= (u + v <= 1.0)
                        ok &= (tt > t_min) & (tt < cl) & hit_c[cc]
                        # Normal flip toward the ray is DEFERRED to the
                        # end of the walk: flipping only the final
                        # winner is bit-identical (same dot, same
                        # products) and saves ~9 vector ops per tri.
                        cl = jnp.where(ok, tt, cl)
                        nx = jnp.where(ok, nux, nx)
                        ny = jnp.where(ok, nuy, ny)
                        nz = jnp.where(ok, nuz, nz)
                        tar = jnp.where(ok, s(9), tar)
                        tag = jnp.where(ok, s(10), tag)
                        tab = jnp.where(ok, s(11), tab)
                        tmt = jnp.where(ok, s(12), tmt)
                        if key_mode == "cid":
                            tci = jnp.where(ok, cid_i, tci)
                    t_s[:] = cl
                    nx_s[:], ny_s[:], nz_s[:] = nx, ny, nz
                    tar_s[:], tag_s[:], tab_s[:] = tar, tag, tab
                    tmt_s[:] = tmt
                    if key_mode == "cid":
                        tcid_s[:] = tci

                for group in range(0, WIDTH, 4):
                    for cc in range(group, group + 4):
                        @pl.when(any_c[cc] & (meta_c[cc] < 0))
                        def _(cc=cc):
                            lid = -meta_c[cc] - jnp.int32(1)
                            cid = lid & jnp.int32(LEAF_CID_MASK)
                            # Subcluster row (core/fast_types.py).
                            crw = (cid >> SUB_SHIFT
                                   if SUBS_PER_ROW > 1 else cid)
                            pltpu.make_async_copy(clusters_ref.at[crw],
                                                  crow_s.at[cc % 4],
                                                  csem.at[cc % 4]).start()
                    for cc in range(group, group + 4):
                        is_leaf_c = any_c[cc] & (meta_c[cc] < 0)

                        @pl.when(is_leaf_c)
                        def _(cc=cc):
                            lid = -meta_c[cc] - jnp.int32(1)
                            cid = lid & jnp.int32(LEAF_CID_MASK)
                            crw = (cid >> SUB_SHIFT
                                   if SUBS_PER_ROW > 1 else cid)
                            pltpu.make_async_copy(clusters_ref.at[crw],
                                                  crow_s.at[cc % 4],
                                                  csem.at[cc % 4]).wait()
                            mt_half(cc, 0, CLUSTER_SIZE // 2)

                        @pl.when(is_leaf_c
                                 & ((-meta_c[cc] - 1)
                                    >> jnp.int32(LEAF_CID_BITS)
                                    >= jnp.int32(CLUSTER_SIZE // 2)))
                        def _(cc=cc):
                            mt_half(cc, CLUSTER_SIZE // 2, CLUSTER_SIZE)

                return have2, nid2, sp3, nid2, pend2

            have0 = jnp.any(active)
            jax.lax.while_loop(cond, body,
                               (have0, jnp.int32(0), jnp.int32(0),
                                jnp.int32(0), jnp.bool_(False)))
            # Deferred normal flip (see mt_half): orient the WINNER's
            # unit normal against the ray once, instead of per tri.
            # No-hit lanes hold n == 0: dot == 0, sgn == 1, unchanged.
            fnx, fny, fnz = nx_s[:], ny_s[:], nz_s[:]
            flip = (rdx * fnx + rdy * fny + rdz * fnz) > 0.0
            sgn = jnp.where(flip, -1.0, 1.0)
            nx_s[:] = sgn * fnx
            ny_s[:] = sgn * fny
            nz_s[:] = sgn * fnz

        def shade():
            alive = act_r[:] > 0.5
            t = t_s[:]
            hit = alive & (t < t_max)
            miss = alive & ~(t < t_max)

            rox, roy, roz = rox_r[:], roy_r[:], roz_r[:]
            rdx, rdy, rdz = rdx_r[:], rdy_r[:], rdz_r[:]
            dlen = jnp.sqrt(rdx * rdx + rdy * rdy + rdz * rdz)
            idl = 1.0 / jnp.where(dlen > 0.0, dlen, 1.0)
            uy = rdy * idl
            tsky = 0.5 * (uy + 1.0)
            omt = 1.0 - tsky
            zero = jnp.zeros_like(omt)
            skr = jnp.where(sky_on, omt + tsky * 0.5, zero)
            skg = jnp.where(sky_on, omt + tsky * 0.7, zero)
            skb = jnp.where(sky_on, omt + tsky * 1.0, zero)

            atr, atg, atb = ar_r[:], ag_r[:], ab_r[:]
            if carry_color:
                cr, cg, cb = cr_r[:], cg_r[:], cb_r[:]
                cr = jnp.where(miss, atr * skr, cr)
                cg = jnp.where(miss, atg * skg, cg)
                cb = jnp.where(miss, atb * skb, cb)

            mt = tmt_s[:]
            albr, albg, albb = tar_s[:], tag_s[:], tab_s[:]
            nx, ny, nz = nx_s[:], ny_s[:], nz_s[:]
            is_lam = mt == 0.0
            is_metal = (mt == 1.0) | (mt == 2.0)
            is_emis = mt == 3.0

            seed = seed_r[:].astype(jnp.uint32)
            needs = hit & (is_lam | is_metal)
            seed, sphx, sphy, sphz = _sphere(seed, needs)
            slen = jnp.sqrt(sphx * sphx + sphy * sphy + sphz * sphz)
            isl = 1.0 / jnp.where(needs & (slen > 0.0), slen, 1.0)
            usx, usy, usz = sphx * isl, sphy * isl, sphz * isl
            lamx, lamy, lamz = nx + usx, ny + usy, nz + usz
            laml = jnp.sqrt(lamx * lamx + lamy * lamy + lamz * lamz)
            degen = laml < 1e-4
            lamx = jnp.where(degen, nx, lamx)
            lamy = jnp.where(degen, ny, lamy)
            lamz = jnp.where(degen, nz, lamz)

            fz = jnp.where(mt == 2.0, jnp.float32(fuzz_const), 0.0)
            ndx, ndy, ndz = rdx * idl, rdy * idl, rdz * idl
            dn = ndx * nx + ndy * ny + ndz * nz
            refx = ndx - 2.0 * dn * nx
            refy = ndy - 2.0 * dn * ny
            refz = ndz - 2.0 * dn * nz
            metx = refx + fz * sphx
            mety = refy + fz * sphy
            metz = refz + fz * sphz

            rawx = jnp.where(is_lam, lamx, metx)
            rawy = jnp.where(is_lam, lamy, mety)
            rawz = jnp.where(is_lam, lamz, metz)
            rl = jnp.sqrt(rawx * rawx + rawy * rawy + rawz * rawz)
            irl = 1.0 / jnp.where(rl > 0.0, rl, 1.0)
            newx, newy, newz = rawx * irl, rawy * irl, rawz * irl

            met_ok = (newx * nx + newy * ny + newz * nz) > 0.0
            scattered = hit & (is_lam | (is_metal & met_ok))
            if carry_color:
                if emissive_emits:
                    emis = hit & is_emis
                    cr = jnp.where(emis, cr + albr * atr, cr)
                    cg = jnp.where(emis, cg + albg * atg, cg)
                    cb = jnp.where(emis, cb + albb * atb, cb)
                ar_n = jnp.where(scattered, atr * albr, atr)
                ag_n = jnp.where(scattered, atg * albg, atg)
                ab_n = jnp.where(scattered, atb * albb, atb)
                cr_r[:], cg_r[:], cb_r[:] = cr, cg, cb
            else:
                # No-color carry: a dying ray's atten column BECOMES its
                # deposit (same products as the color writes above —
                # bit-identical sums at the XLA-side scatter): miss ->
                # atten * sky; emissive (when it emits) -> albedo * atten
                # (its color was necessarily 0: only dying rays write
                # color, and dead rays don't hit); any other death
                # (absorbed metal, non-emitting emissive) -> black.
                dep_r = jnp.where(miss, atr * skr, zero)
                dep_g = jnp.where(miss, atg * skg, zero)
                dep_b = jnp.where(miss, atb * skb, zero)
                if emissive_emits:
                    emis = hit & is_emis
                    dep_r = jnp.where(emis, albr * atr, dep_r)
                    dep_g = jnp.where(emis, albg * atg, dep_g)
                    dep_b = jnp.where(emis, albb * atb, dep_b)
                # Dead-on-entry rays keep their existing deposit.
                dep_r = jnp.where(alive, dep_r, atr)
                dep_g = jnp.where(alive, dep_g, atg)
                dep_b = jnp.where(alive, dep_b, atb)
                ar_n = jnp.where(scattered, atr * albr, dep_r)
                ag_n = jnp.where(scattered, atg * albg, dep_g)
                ab_n = jnp.where(scattered, atb * albb, dep_b)

            hx = rox + rdx * t
            hy = roy + rdy * t
            hz = roz + rdz * t
            ar_r[:], ag_r[:], ab_r[:] = ar_n, ag_n, ab_n
            rox_r[:] = jnp.where(scattered, hx, rox)
            roy_r[:] = jnp.where(scattered, hy, roy)
            roz_r[:] = jnp.where(scattered, hz, roz)
            rdx_r[:] = jnp.where(scattered, newx, rdx)
            rdy_r[:] = jnp.where(scattered, newy, rdy)
            rdz_r[:] = jnp.where(scattered, newz, rdz)
            seed_r[:] = seed.astype(jnp.int32)
            act_r[:] = scattered.astype(jnp.float32)

        def bcond(b):
            return (b < bcap) & jnp.any(act_r[:] > 0.5)

        def bbody(b):
            # Per-tile count row: summing over sublanes in-kernel keeps
            # the XLA-side rays/live reductions at [grid, 128] instead of
            # [w] (the cond-loop slice_reduce fusions were ~5 ms/frame).
            rays_r[0, 0:1, :] = rays_r[0, 0:1, :] + jnp.sum(
                act_r[:], axis=0, keepdims=True)
            entered = act_r[:] > 0.5
            walk()
            shade()
            # Per-ray bounces-left budget (the cross-band tail's kill
            # rule, kernels/wavefront.wavefront_tail): every iteration a
            # ray enters alive costs 1; at 0 the ray dies here, so the
            # emitted key/live/act all reflect it. Uniform-budget callers
            # pass a huge budget and rely on bcap alone.
            bud_r[:] = bud_r[:] - entered.astype(jnp.int32)
            if not carry_color:
                # A budget kill is a kill-to-black: the dying ray's atten
                # column must become its (black) deposit.
                killed = (bud_r[:] <= 0) & (act_r[:] > 0.5)
                zero = jnp.zeros_like(ar_r[:])
                ar_r[:] = jnp.where(killed, zero, ar_r[:])
                ag_r[:] = jnp.where(killed, zero, ag_r[:])
                ab_r[:] = jnp.where(killed, zero, ab_r[:])
            act_r[:] = jnp.where(bud_r[:] > 0, act_r[:],
                                 jnp.zeros_like(act_r[:]))
            return b + 1

        jax.lax.while_loop(bcond, bbody, jnp.int32(0))
        live_r[0, 0:1, :] = jnp.sum(act_r[:], axis=0, keepdims=True)

        # Next round's sort key (kernels/wavefront.sort_key with the
        # dead flag at bit 30 so plain i32 argsort still packs dead rays
        # at the tail), emitted from the advanced state: the XLA-side key
        # fusion re-read six [w] f32 columns every round. bounds_ref:
        # SMEM [6] f32 = scene min/max (the BVH root box).
        dead = (act_r[:] <= 0.5).astype(jnp.int32)
        if key_mode == "pd5":
            chans = []
            for ax, o_r in enumerate((rox_r, roy_r, roz_r)):
                lo = bounds_ref[ax]
                span = jnp.maximum(bounds_ref[3 + ax] - lo, 1e-6)
                chans.append(jnp.clip((o_r[:] - lo) / span * 31.0,
                                      0.0, 31.0).astype(jnp.int32))
            for d_r in (rdx_r, rdy_r, rdz_r):
                chans.append(jnp.clip((d_r[:] + 1.0) * 15.5,
                                      0.0, 31.0).astype(jnp.int32))
            key = dead << 30
            for b in range(5):
                for i, c in enumerate(chans):
                    key = key | (((c >> b) & 1) << (6 * b + i))
        else:
            # position-major keys (exp28 key sweep: bounce-1 tile unions
            # x0.68-0.75 visits vs pd5): high bits = where the ray
            # starts, low 3 bits = direction octant.
            octant = ((rdx_r[:] > 0.0).astype(jnp.int32)
                      | ((rdy_r[:] > 0.0).astype(jnp.int32) << 1)
                      | ((rdz_r[:] > 0.0).astype(jnp.int32) << 2))
            if key_mode == "cid":
                # winner cluster id of the LAST walk: rays leaving the
                # same leaf share (almost all of) their next walk.
                key = (dead << 30) | (tcid_s[:] << 3) | octant
            else:  # om9
                morton = jnp.zeros_like(dead)
                for ax, o_r in enumerate((rox_r, roy_r, roz_r)):
                    lo = bounds_ref[ax]
                    span = jnp.maximum(bounds_ref[3 + ax] - lo, 1e-6)
                    q = jnp.clip((o_r[:] - lo) / span * 511.0,
                                 0.0, 511.0).astype(jnp.int32)
                    # _part1by2 in i32 (wavefront._part1by2 bit-equal:
                    # all intermediates < 2^31, masks keep sign clear)
                    q = q & jnp.int32(0x3FF)
                    q = (q | (q << 16)) & jnp.int32(0x030000FF)
                    q = (q | (q << 8)) & jnp.int32(0x0300F00F)
                    q = (q | (q << 4)) & jnp.int32(0x030C30C3)
                    q = (q | (q << 2)) & jnp.int32(0x09249249)
                    morton = morton | (q << ax)
                morton = morton & jnp.int32((1 << 27) - 1)
                key = (dead << 30) | (morton << 3) | octant
        key_r[:] = key


def make_kernel(fuzz_const, emissive_emits, ordered=True,
                key_mode="pd5", carry_color=True):
    """Flat-block kernel for either state layout: 15 blocks (with color
    columns) or 12 (no-color carry — death deposits ride atten, see
    _kernel_core). State order: o3 d3 [color3] atten3 seed act budget.
    The tcid scratch exists only for key_mode="cid"."""
    ns = 15 if carry_color else 12

    def kernel(*args, t_min, t_max, det_eps):
        num_ref, npack_ref, clusters_ref = args[:3]
        ins = args[3:3 + ns]
        sky_ref, bcap_ref, bounds_ref = args[3 + ns:6 + ns]
        outs = args[6 + ns:6 + 2 * ns]
        rays_r, live_r, key_r = args[6 + 2 * ns:9 + 2 * ns]
        scratch = args[9 + 2 * ns:]
        (stack_s, row_s, crow_s, sema, csem, t_s, nx_s, ny_s, nz_s,
         tar_s, tag_s, tab_s, tmt_s) = scratch[:13]
        tcid_s = scratch[13] if key_mode == "cid" else None
        _kernel_core(
            num_ref, npack_ref, clusters_ref, ins[:-1], outs[:-1],
            ins[-1], outs[-1],
            sky_ref, bcap_ref, bounds_ref, rays_r, live_r, key_r,
            stack_s, row_s, crow_s, sema, csem,
            t_s, nx_s, ny_s, nz_s, tar_s, tag_s, tab_s, tmt_s, tcid_s,
            t_min=t_min, t_max=t_max, det_eps=det_eps,
            fuzz_const=fuzz_const, emissive_emits=emissive_emits,
            ordered=ordered, key_mode=key_mode)

    return kernel


# Packed-state field order (kernels/wavefront.py carries ray state in this
# layout across rounds so the per-round XLA glue is one gather per array
# instead of a stack/take/unpack per field): sf f32 rows 0-11 = o3 d3
# color3 atten3, row 12 = alive flag (0.0/1.0 — a genuine float, not a
# bitcast); si i32 row 0 = PCG seed bits, rows 1+ pass through the kernel
# untouched (row 1 = pixel id; the merged band-tail phase adds row 2 =
# per-ray bounces-left budget).
SF_FIELDS = 13
SI_FIELDS = 2


def make_kernel_packed(fuzz_const, emissive_emits, ordered=True,
                       key_mode="pd5"):
    def kernel(num_ref, npack_ref, clusters_ref, sfi, sii,
               sky_ref, bcap_ref, bounds_ref, sfo, sio, rays_r, live_r,
               key_r,
               stack_s, row_s, crow_s, sema, csem, bud_s,
               t_s, nx_s, ny_s, nz_s, tar_s, tag_s, tab_s, tmt_s,
               *maybe_tcid, t_min, t_max, det_eps):
        tcid_s = maybe_tcid[0] if maybe_tcid else None
        ins = tuple(_RowView(sfi, f) for f in range(12)) + (
            _RowView(sii, 0), _RowView(sfi, 12))
        outs = tuple(_RowView(sfo, f) for f in range(12)) + (
            _RowView(sio, 0), _RowView(sfo, 12))
        for r in range(1, sii.shape[0]):
            sio[r] = sii[r]
        _kernel_core(
            num_ref, npack_ref, clusters_ref, ins, outs,
            None, bud_s,
            sky_ref, bcap_ref, bounds_ref, rays_r, live_r, key_r,
            stack_s, row_s, crow_s, sema, csem,
            t_s, nx_s, ny_s, nz_s, tar_s, tag_s, tab_s, tmt_s, tcid_s,
            t_min=t_min, t_max=t_max, det_eps=det_eps,
            fuzz_const=fuzz_const, emissive_emits=emissive_emits,
            ordered=ordered, key_mode=key_mode)

    return kernel


@functools.partial(jax.jit, static_argnames=("sub", "fuzz", "emis",
                                             "t_min", "t_max", "det_eps",
                                             "interpret", "ordered",
                                             "key_mode"))
def bounce_megakernel_packed(npack, clusters, num_nodes, sf, si, bcap,
                             sky, bounds, sub, fuzz, emis, t_min=1e-3,
                             t_max=1e4, det_eps=1e-5, interpret=False,
                             ordered=True, key_mode="pd5"):
    """Packed-state fused round: sf [SF_FIELDS, rows, 128] f32,
    si [>=SI_FIELDS, rows, 128] i32 (layout above; extra i32 rows pass
    through). Returns (sf', si', rays[grid,8,128], live[grid,8,128],
    key[rows,128]) with identical semantics to ``bounce_megakernel``
    (same kernel core); only the ref plumbing differs. ``bounds``: [6]
    f32 scene min/max for the emitted pd5 key."""
    rows = sf.shape[1]
    si_fields = si.shape[0]
    grid = rows // sub
    blockf = pl.BlockSpec((SF_FIELDS, sub, LANES), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    blocki = pl.BlockSpec((si_fields, sub, LANES), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    blockr = pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    blockk = pl.BlockSpec((sub, LANES), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    resident = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(make_kernel_packed(fuzz, emis, ordered,
                                                  key_mode),
                               t_min=t_min, t_max=t_max, det_eps=det_eps)
    out_shape = (jax.ShapeDtypeStruct((SF_FIELDS, rows, LANES),
                                      jnp.float32),
                 jax.ShapeDtypeStruct((si_fields, rows, LANES), jnp.int32),
                 jax.ShapeDtypeStruct((grid, 8, LANES), jnp.float32),
                 jax.ShapeDtypeStruct((grid, 8, LANES), jnp.float32),
                 jax.ShapeDtypeStruct((rows, LANES), jnp.int32))
    scratch = ([pltpu.SMEM((STACK_CAP,), jnp.int32),
                pltpu.SMEM((128,) if WIDE_ROWS == 1
                           else (WIDE_ROWS, 128), jnp.float32),
                pltpu.SMEM((4, CLUSTER_ROW), jnp.float32),
                pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA((4,)),
                pltpu.VMEM((sub, LANES), jnp.int32)]
               + [pltpu.VMEM((sub, LANES), jnp.float32)] * 8
               + ([pltpu.VMEM((sub, LANES), jnp.int32)]
                  if key_mode == "cid" else []))
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  resident, resident, blockf, blocki]
        + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 3,
        out_shape=out_shape,
        out_specs=(blockf, blocki, blockr, blockr, blockk),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(num_nodes, npack, clusters, sf, si, sky, bcap, bounds)


def _bounce_call(npack, clusters, num_nodes, state, bcap, sky, bounds,
                 sub, fuzz, emis, t_min, t_max, det_eps, interpret,
                 ordered, key_mode, carry_color):
    """Shared pallas_call plumbing for both flat state layouts."""
    ns = 15 if carry_color else 12
    assert len(state) == ns, (len(state), ns)
    rows = state[0].shape[0]
    grid = rows // sub
    block = pl.BlockSpec((sub, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    cblock = pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    resident = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(
        make_kernel(fuzz, emis, ordered, key_mode, carry_color),
        t_min=t_min, t_max=t_max, det_eps=det_eps)
    outf = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    outi = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)
    outc = jax.ShapeDtypeStruct((grid, 8, LANES), jnp.float32)
    # advanced state (seed i32, act f32, budget i32 at the end) + per-tile
    # rays/live count rows + next-round key
    out_shape = ((outf,) * (ns - 3)
                 + (outi, outf, outi, outc, outc, outi))
    scratch = ([pltpu.SMEM((STACK_CAP,), jnp.int32),
                pltpu.SMEM((128,) if WIDE_ROWS == 1
                           else (WIDE_ROWS, 128), jnp.float32),
                pltpu.SMEM((4, CLUSTER_ROW), jnp.float32),
                pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA((4,))]
               + [pltpu.VMEM((sub, LANES), jnp.float32)] * 8
               + ([pltpu.VMEM((sub, LANES), jnp.int32)]
                  if key_mode == "cid" else []))
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  resident, resident] + [block] * ns
        + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 3,
        out_shape=out_shape,
        out_specs=(block,) * ns + (cblock, cblock, block),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(num_nodes, npack, clusters, *state, sky, bcap, bounds)


@functools.partial(jax.jit, static_argnames=("sub", "fuzz", "emis",
                                             "t_min", "t_max", "det_eps",
                                             "interpret", "ordered",
                                             "key_mode"))
def bounce_megakernel12(npack, clusters, num_nodes, state, bcap, sky,
                        bounds, sub, fuzz, emis, t_min=1e-3, t_max=1e4,
                        det_eps=1e-5, interpret=False, ordered=True,
                        key_mode="pd5"):
    """No-color-carry fused round: state = 12 blocks [rows,128] (o3 d3
    atten3 seed(i32) act budget(i32)). Returns 15 blocks: advanced state
    (a dying ray's atten becomes its color deposit; budget kills black
    it out), [grid,8,128] rays/live count rows (sublane 0), next-round key. Semantics
    otherwise identical to ``bounce_megakernel``."""
    return _bounce_call(npack, clusters, num_nodes, state, bcap, sky,
                        bounds, sub, fuzz, emis, t_min, t_max, det_eps,
                        interpret, ordered, key_mode, carry_color=False)


@functools.partial(jax.jit, static_argnames=("sub", "fuzz", "emis",
                                             "t_min", "t_max", "det_eps",
                                             "interpret", "ordered",
                                             "key_mode"))
def bounce_megakernel(npack, clusters, num_nodes, state, bcap, sky,
                bounds, sub,
                fuzz, emis, t_min=1e-3, t_max=1e4, det_eps=1e-5,
                interpret=False, ordered=True, key_mode="pd5"):
    """state: tuple of 15 blocks [rows,128]: o3 d3 color3 atten3
    seed(i32) act(f32) budget(i32, per-ray bounces-left — pass a huge
    constant to gate on ``bcap`` alone). Returns 18 blocks: advanced
    state (budget decremented per iteration a ray entered alive, act
    zeroed at 0), [grid,8,128] rays-traced and final-live count rows (sublane 0)
    (summed over sublanes in-kernel so the callers' reductions stay
    tiny), and the next round's sort key [rows,128] i32 (``bounds``:
    [6] f32 scene min/max). t_min/t_max/det_eps come from the caller's
    RenderConfig so this path cannot diverge from the wave/mega paths."""
    return _bounce_call(npack, clusters, num_nodes, state, bcap, sky,
                        bounds, sub, fuzz, emis, t_min, t_max, det_eps,
                        interpret, ordered, key_mode, carry_color=True)
