"""exp35: close the LBVH tree-quality gap (VERDICT r3 item 4) — CPU study.

exp31 measured the on-device Karras LBVH tree rendering 1.53x slower
than the host SAH tree on two_humans. Candidate fix: PLOC (Meister &
Bittner 2018, parallel locally-ordered clustering) over the same
Morton-sorted leaf clusters — agglomerative bottom-up merging of the
lowest-union-surface-area neighbor pairs inside a sliding window, which
is (a) near sweep-SAH quality and (b) data-parallel enough to jit
(every iteration is dense [n]-vector work + a compaction).

This experiment prices the candidate with exp28's production-walk
replay before building the jitted version:

  tree A: host SAH (the flagship builder)          <- quality target
  tree B: Karras over Morton 8-runs (current live-edit tree)
  tree C: PLOC over the same Morton 8-run clusters <- the candidate
  tree D: PLOC with leaves re-cut from the tree     (leaf-content bound)

Metric: visits/tile + leaf visits/tile + pair tests on primary and
sorted bounce-1 tiles of the two_humans geometry (the exp28 census
machinery); per r3f, per-visit fixed cost dominates, so visit counts
ARE the cost model.

Run from the repo root: python experiments/exp35_tree_quality.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from exp28_fatleaf_stats import (TILE, build_wide, sort_key, walk_tile)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def two_humans_soup():
    from raytracer_tpu.scene.objloader import load_obj
    from raytracer_tpu.utils import assets

    body = load_obj(assets.asset_path("FinalBaseMesh.obj"))
    a = body * 2.0 + np.array([-8, -10, 0], np.float32)
    b = body * 2.0 + np.array([8, -10, 0], np.float32)
    plane = (assets.make_ground_plane()
             * np.array([150, 1, 150], np.float32)
             + np.array([0, -10, 0], np.float32))
    return np.concatenate([plane, a, b]).astype(np.float32)


def _sa(lo, hi):
    d = np.maximum(hi - lo, 0.0)
    return d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]


def ploc(lo, hi, window=8):
    """NumPy PLOC over [L] ordered clusters. Returns (left, right,
    int_lo, int_hi) in the lbvh numbering: internal 0..L-2 with root 0,
    leaf k -> (L-1)+k; children encode that numbering."""
    ln = lo.shape[0]
    assert ln >= 2
    node_id = np.arange(ln, dtype=np.int64) + (ln - 1)
    cur_lo = lo.astype(np.float32).copy()
    cur_hi = hi.astype(np.float32).copy()
    left = np.zeros(ln - 1, np.int64)
    right = np.zeros(ln - 1, np.int64)
    int_lo = np.zeros((ln - 1, 3), np.float32)
    int_hi = np.zeros((ln - 1, 3), np.float32)
    created = 0
    n = ln
    iters = 0
    while n > 1:
        iters += 1
        w = min(window, n - 1)
        best_cost = np.full(n, np.inf, np.float32)
        best_j = np.full(n, -1, np.int64)
        for dlt in range(1, w + 1):
            u_lo = np.minimum(cur_lo[:n - dlt], cur_lo[dlt:n])
            u_hi = np.maximum(cur_hi[:n - dlt], cur_hi[dlt:n])
            c = _sa(u_lo, u_hi)
            m1 = c < best_cost[:n - dlt]
            best_cost[:n - dlt][m1] = c[m1]
            best_j[:n - dlt][m1] = np.arange(dlt, n)[m1]
            m2 = c < best_cost[dlt:n]
            best_cost[dlt:n][m2] = c[m2]
            best_j[dlt:n][m2] = np.arange(0, n - dlt)[m2]
        i_arr = np.arange(n)
        mutual = (best_j[best_j] == i_arr) & (i_arr < best_j)
        idx_i = i_arr[mutual]
        idx_j = best_j[mutual]
        k = idx_i.shape[0]
        assert k > 0, "global min pair is always mutual"
        cidx = created + np.arange(k)
        left[cidx] = node_id[idx_i]
        right[cidx] = node_id[idx_j]
        int_lo[cidx] = np.minimum(cur_lo[idx_i], cur_lo[idx_j])
        int_hi[cidx] = np.maximum(cur_hi[idx_i], cur_hi[idx_j])
        created += k
        # merged node replaces position i (keeps Morton order), j dies;
        # internal ids are CREATION indices for now (disjoint from leaf
        # ids, which are >= L-1 ... wait: creation indices 0..L-2 and
        # leaf ids L-1..2L-2 are disjoint by construction).
        node_id[idx_i] = cidx
        cur_lo[idx_i] = int_lo[cidx]
        cur_hi[idx_i] = int_hi[cidx]
        keep = np.ones(n, bool)
        keep[idx_j] = False
        m = int(keep.sum())
        node_id[:m] = node_id[:n][keep]
        cur_lo[:m] = cur_lo[:n][keep]
        cur_hi[:m] = cur_hi[:n][keep]
        n = m
    # Remap creation index c -> final internal id (L-2) - c (root -> 0).
    def remap(x):
        return np.where(x >= ln - 1, x, (ln - 2) - x)

    fl = np.zeros(ln - 1, np.int64)
    fr = np.zeros(ln - 1, np.int64)
    flo = np.zeros((ln - 1, 3), np.float32)
    fhi = np.zeros((ln - 1, 3), np.float32)
    fin = (ln - 2) - np.arange(ln - 1)
    fl[fin] = remap(left)
    fr[fin] = remap(right)
    flo[fin] = int_lo
    fhi[fin] = int_hi
    log(f"  ploc: {iters} iterations")
    return fl, fr, flo, fhi


def ploc_capped(lo, hi, counts, cap=8, window=8):
    """Phase-1 PLOC over triangles: merges allowed only while the
    combined triangle count stays <= cap. Stops when no mutual allowed
    pair remains. Returns (members, order) where members[i] = list of
    original item indices of surviving cluster i (in final active
    order)."""
    ln = lo.shape[0]
    cur_lo = lo.astype(np.float32).copy()
    cur_hi = hi.astype(np.float32).copy()
    cnt = counts.astype(np.int64).copy()
    members = [[i] for i in range(ln)]
    slot = np.arange(ln)  # active position -> members index
    n = ln
    iters = 0
    while n > 1:
        iters += 1
        w = min(window, n - 1)
        best_cost = np.full(n, np.inf, np.float32)
        best_j = np.full(n, -1, np.int64)
        for dlt in range(1, w + 1):
            u_lo = np.minimum(cur_lo[:n - dlt], cur_lo[dlt:n])
            u_hi = np.maximum(cur_hi[:n - dlt], cur_hi[dlt:n])
            c = _sa(u_lo, u_hi)
            fits = (cnt[:n - dlt] + cnt[dlt:n]) <= cap
            c = np.where(fits, c, np.inf)
            m1 = c < best_cost[:n - dlt]
            best_cost[:n - dlt][m1] = c[m1]
            best_j[:n - dlt][m1] = np.arange(dlt, n)[m1]
            m2 = c < best_cost[dlt:n]
            best_cost[dlt:n][m2] = c[m2]
            best_j[dlt:n][m2] = np.arange(0, n - dlt)[m2]
        i_arr = np.arange(n)
        has = best_j >= 0
        bj = np.where(has, best_j, 0)
        mutual = has & (best_j[bj] == i_arr) & (i_arr < best_j)
        idx_i = i_arr[mutual]
        idx_j = best_j[mutual]
        if idx_i.shape[0] == 0:
            break
        for a, b in zip(idx_i, idx_j):
            members[slot[a]].extend(members[slot[b]])
        cur_lo[idx_i] = np.minimum(cur_lo[idx_i], cur_lo[idx_j])
        cur_hi[idx_i] = np.maximum(cur_hi[idx_i], cur_hi[idx_j])
        cnt[idx_i] += cnt[idx_j]
        keep = np.ones(n, bool)
        keep[idx_j] = False
        m = int(keep.sum())
        slot[:m] = slot[:n][keep]
        cur_lo[:m] = cur_lo[:n][keep]
        cur_hi[:m] = cur_hi[:n][keep]
        cnt[:m] = cnt[:n][keep]
        n = m
    log(f"  ploc_capped: {iters} iterations, {n} leaves "
        f"(mean fill {ln / n:.1f}/{cap})")
    return [members[slot[i]] for i in range(n)]


def preorder_nodes8_sized(left, right, int_lo, int_hi, leaf_lo, leaf_hi):
    """Pre-order emit using subtree sizes (skip = my + size)."""
    ln = left.shape[0] + 1
    m = 2 * ln - 1
    # subtree sizes bottom-up: process internal ids in increasing-
    # creation order? Final numbering has root 0; children have LARGER
    # internal ids than parents? Not guaranteed by remap... compute
    # sizes by iterating until fixpoint instead (vector passes).
    size = np.ones(m, np.int64)  # leaves 1
    # children arrays per internal id
    known = np.zeros(ln - 1, bool)
    sz = np.zeros(ln - 1, np.int64)

    def child_size(c):
        return np.where(c >= ln - 1, 1, np.where(known[np.minimum(c, ln - 2)],
                                                 sz[np.minimum(c, ln - 2)], -1))

    for _ in range(200):
        if known.all():
            break
        ls = child_size(left)
        rs = child_size(right)
        ok = (~known) & (ls > 0) & (rs > 0)
        sz[ok] = ls[ok] + rs[ok] + 1
        known |= ok
    assert known.all(), "size fixpoint did not converge"

    nodes = np.zeros((m, 8), np.float32)
    skip = np.zeros(m, np.int32)
    col7 = np.zeros(m, np.int32)
    stack = [(0, m)]
    out = 0
    while stack:
        g, sk = stack.pop()
        my = out
        skip[my] = sk
        if g >= ln - 1:
            out += 1
            nodes[my, 0:3] = leaf_lo[g - (ln - 1)]
            nodes[my, 3:6] = leaf_hi[g - (ln - 1)]
            col7[my] = g - (ln - 1)
        else:
            out += 1
            nodes[my, 0:3] = int_lo[g]
            nodes[my, 3:6] = int_hi[g]
            col7[my] = -(my + 1 + 1)
            lsz = 1 if left[g] >= ln - 1 else sz[left[g]]
            right_at = my + 1 + int(lsz)
            stack.append((int(right[g]), sk))       # right: inherits skip
            stack.append((int(left[g]), right_at))  # left: skip to right
    nodes[:, 6] = skip.view(np.float32)
    nodes[:, 7] = col7.view(np.float32)
    return nodes, m


def wide_from_binary(nodes8, m, counts):
    from raytracer_tpu.bvh import bvh4

    wide, n_wide = bvh4.collapse4(nodes8, m, width=8,
                                  cluster_counts=counts)
    return wide, n_wide


def lbvh_cluster_tree(verts):
    """Run the production jitted device build on CPU; return its wide
    table + cluster triangle soup (starts/counts/tris reconstructed from
    the packed records)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from raytracer_tpu.bvh.lbvh import (build_fast_scene_device,
                                        pad_to_cluster_multiple)

    mats = np.zeros((verts.shape[0], 4), np.float32)
    mats[:, 0:3] = 0.6
    pverts, pmats = pad_to_cluster_multiple(verts, mats)
    scene = jax.jit(build_fast_scene_device)(jnp.asarray(pverts),
                                             jnp.asarray(pmats))
    wide = np.asarray(scene.nodes4)
    n_wide = int(scene.num_nodes4)
    cl = np.asarray(scene.clusters).reshape(-1, 16)  # [T,16] records
    v0 = cl[:, 0:3]
    v1 = v0 + cl[:, 3:6]
    v2 = v0 + cl[:, 6:9]
    tris = np.stack([v0, v1, v2], axis=1).astype(np.float32)
    t = tris.shape[0]
    ncl = t // 8
    starts = np.arange(ncl, dtype=np.int64) * 8
    counts = np.full(ncl, 8, np.int64)
    return wide, n_wide, starts, counts, tris


def cluster_aabbs(tris):
    """Per-8-run AABBs with the builder's thin-axis epsilon."""
    from raytracer_tpu.bvh.build import AABB_EPS

    lo = tris.min(axis=1)
    hi = tris.max(axis=1)
    thin = (hi - lo) < AABB_EPS
    lo = np.where(thin, lo - AABB_EPS, lo)
    hi = np.where(thin, hi + AABB_EPS, hi)
    ncl = tris.shape[0] // 8
    cl_lo = lo.reshape(ncl, 8, 3).min(axis=1)
    cl_hi = hi.reshape(ncl, 8, 3).max(axis=1)
    return cl_lo, cl_hi


def main():
    verts = two_humans_soup()
    log(f"two_humans soup: {verts.shape[0]} tris")
    rng = np.random.default_rng(5)

    # --- trees ---
    t0 = time.time()
    sah = build_wide(verts, 8)
    log(f"tree A (host SAH): {sah[1]} wide nodes ({time.time()-t0:.1f}s)")

    t0 = time.time()
    lb = lbvh_cluster_tree(verts)
    log(f"tree B (Karras/Morton-8): {lb[1]} wide nodes "
        f"({time.time()-t0:.1f}s)")

    # tree C: PLOC over B's clusters (same leaves, better topology).
    t0 = time.time()
    tris_b = lb[4]
    cl_lo, cl_hi = cluster_aabbs(tris_b)
    fl, fr, flo, fhi = ploc(cl_lo, cl_hi, window=8)
    nodes8_c, m_c = preorder_nodes8_sized(fl, fr, flo, fhi, cl_lo, cl_hi)
    counts_c = np.full(cl_lo.shape[0], 8, np.int32)
    wide_c, nw_c = wide_from_binary(nodes8_c, m_c, counts_c)
    ploc_tree = (wide_c, nw_c, lb[2], lb[3], tris_b)
    log(f"tree C (PLOC/Morton-8 leaves): {nw_c} wide nodes "
        f"({time.time()-t0:.1f}s)")

    # --- rays: primaries + sorted bounce-1 (exp28 methodology) ---
    from raytracer_tpu.core.camera import default_camera

    cam = default_camera(1280, 720)
    w, h = 1280, 720
    xs = (np.arange(w) + 0.5) / w
    ys = (np.arange(h) + 0.5) / h
    u, v = np.meshgrid(xs, ys)
    u, v = u.ravel(), v.ravel()
    llc = np.asarray(cam.lower_left_corner, np.float64)
    horiz = np.asarray(cam.horizontal, np.float64)
    vert = np.asarray(cam.vertical, np.float64)
    orig = np.asarray(cam.origin, np.float64)
    d = (llc + u[:, None] * horiz + v[:, None] * vert - orig)
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    o = np.broadcast_to(orig.astype(np.float32), d.shape).copy()
    pick = rng.choice(w * h, 4 * TILE, replace=False)
    o_p, d_p = o[pick], d[pick]
    smin = verts.reshape(-1, 3).min(0)
    smax = verts.reshape(-1, 3).max(0)

    wide, n_wide, starts, counts, tris = sah
    hits_o, hits_d = [], []
    for ti in range(4):
        sl = slice(ti * TILE, (ti + 1) * TILE)
        closest, winv, _ = walk_tile(wide, o_p[sl, 0], o_p[sl, 1],
                                     o_p[sl, 2], d_p[sl, 0], d_p[sl, 1],
                                     d_p[sl, 2], starts, counts, tris)
        hit = winv >= 0
        hp = o_p[sl][hit] + closest[hit, None] * d_p[sl][hit]
        tv = tris[winv[hit]]
        n = np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])
        n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-30)
        dd = d_p[sl][hit]
        n = np.where((n * dd).sum(1, keepdims=True) > 0, -n, n)
        sph = rng.normal(size=n.shape)
        sph /= np.linalg.norm(sph, axis=1, keepdims=True)
        nd = n + sph
        nd /= np.maximum(np.linalg.norm(nd, axis=1, keepdims=True), 1e-30)
        hits_o.append(hp)
        hits_d.append(nd.astype(np.float32))
    o_b = np.concatenate(hits_o)
    d_b = np.concatenate(hits_d)
    kb = sort_key(o_b, d_b, smin, smax)
    sb = np.argsort(kb, kind="stable")
    o_b, d_b = o_b[sb], d_b[sb]
    log(f"bounce-1 rays: {o_b.shape[0]}")

    # tree D: triangle-level PLOC with a size-8 cap phase (agglomerative
    # leaves), then PLOC over the formed clusters to the root.
    t0 = time.time()
    from raytracer_tpu.bvh.build import AABB_EPS

    tlo = verts.min(axis=1)
    thi = verts.max(axis=1)
    thin = (thi - tlo) < AABB_EPS
    tlo = np.where(thin, tlo - AABB_EPS, tlo)
    thi = np.where(thin, thi + AABB_EPS, thi)
    # Morton-sort the triangles first (the device path sorts anyway).
    ctr = (tlo + thi) * 0.5
    ext = np.maximum(verts.reshape(-1, 3).max(0) - verts.reshape(-1, 3).min(0),
                     1e-12)
    un = (ctr - verts.reshape(-1, 3).min(0)) / ext
    q = lambda a: np.clip(a * 1024.0, 0, 1023).astype(np.uint64)

    def expand(v):
        v = (v * np.uint64(0x00010001)) & np.uint64(0xFF0000FF)
        v = (v * np.uint64(0x00000101)) & np.uint64(0x0F00F00F)
        v = (v * np.uint64(0x00000011)) & np.uint64(0xC30C30C3)
        v = (v * np.uint64(0x00000005)) & np.uint64(0x49249249)
        return v
    code = (expand(q(un[:, 0])) << np.uint64(2)) | \
        (expand(q(un[:, 1])) << np.uint64(1)) | expand(q(un[:, 2]))
    mo = np.argsort(code, kind="stable")
    tlo_s, thi_s = tlo[mo], thi[mo]
    tris_d = verts[mo]
    groups = ploc_capped(tlo_s, thi_s, np.ones(len(mo)), cap=8, window=8)
    ld = len(groups)
    tris_pack = []
    starts_d = np.zeros(ld, np.int64)
    counts_d = np.zeros(ld, np.int64)
    d_lo = np.zeros((ld, 3), np.float32)
    d_hi = np.zeros((ld, 3), np.float32)
    at = 0
    for i, g in enumerate(groups):
        starts_d[i] = at
        counts_d[i] = len(g)
        at += len(g)
        tris_pack.append(tris_d[g])
        d_lo[i] = tlo_s[g].min(axis=0)
        d_hi[i] = thi_s[g].max(axis=0)
    tris_pack = np.concatenate(tris_pack)
    fl, fr, flo, fhi = ploc(d_lo, d_hi, window=8)
    nodes8_d, m_d = preorder_nodes8_sized(fl, fr, flo, fhi, d_lo, d_hi)
    wide_d, nw_d = wide_from_binary(nodes8_d, m_d,
                                    counts_d.astype(np.int32))
    ploc_tri_tree = (wide_d, nw_d, starts_d, counts_d, tris_pack)
    log(f"tree D (PLOC tris, capped leaves): {nw_d} wide nodes, "
        f"{ld} leaves ({time.time()-t0:.1f}s)")

    # tree E: the device-friendly variant of D — leaves start as FIXED
    # Morton 4-runs (guaranteed leaf count T/4, static shapes under jit)
    # and the capped PLOC phase may pair them into 8s; topology = full
    # PLOC. Quality question: how much of D's leaf win survives the
    # fixed 4-run start?
    t0 = time.time()
    ne = (len(mo) // 4) * 4
    r_lo = tlo_s[:ne].reshape(-1, 4, 3).min(axis=1)
    r_hi = thi_s[:ne].reshape(-1, 4, 3).max(axis=1)
    groups_e = ploc_capped(r_lo, r_hi, np.full(r_lo.shape[0], 4),
                           cap=8, window=8)
    le = len(groups_e)
    tris_e = []
    starts_e = np.zeros(le, np.int64)
    counts_e = np.zeros(le, np.int64)
    e_lo = np.zeros((le, 3), np.float32)
    e_hi = np.zeros((le, 3), np.float32)
    at = 0
    for i, g in enumerate(groups_e):
        idxs = np.concatenate([np.arange(r * 4, r * 4 + 4) for r in g])
        starts_e[i] = at
        counts_e[i] = len(idxs)
        at += len(idxs)
        tris_e.append(tris_d[idxs])
        e_lo[i] = tlo_s[idxs].min(axis=0)
        e_hi[i] = thi_s[idxs].max(axis=0)
    tris_e = np.concatenate(tris_e)
    fl, fr, flo, fhi = ploc(e_lo, e_hi, window=8)
    nodes8_e, m_e = preorder_nodes8_sized(fl, fr, flo, fhi, e_lo, e_hi)
    wide_e, nw_e = wide_from_binary(nodes8_e, m_e,
                                    counts_e.astype(np.int32))
    ploc4_tree = (wide_e, nw_e, starts_e, counts_e, tris_e)
    log(f"tree E (PLOC, fixed 4-run start): {nw_e} wide nodes, "
        f"{le} leaves ({time.time()-t0:.1f}s)")

    results = {}
    for name, tree in (("A_sah", sah), ("B_karras", lb),
                       ("C_ploc", ploc_tree),
                       ("D_ploc_tri", ploc_tri_tree),
                       ("E_ploc_4run", ploc4_tree)):
        wide, n_wide, starts, counts, tris = tree
        for pop, (oo, dd) in (("primary", (o_p, d_p)),
                              ("bounce1", (o_b, d_b))):
            agg = dict(visits=0, leaf_visits=0, pair_tests=0)
            n_tiles = min(4, oo.shape[0] // TILE)
            for ti in range(n_tiles):
                sl = slice(ti * TILE, (ti + 1) * TILE)
                _, _, st = walk_tile(wide, oo[sl, 0], oo[sl, 1],
                                     oo[sl, 2], dd[sl, 0], dd[sl, 1],
                                     dd[sl, 2], starts, counts, tris)
                for k in agg:
                    agg[k] += st[k]
            for k in agg:
                agg[k] /= n_tiles
            results[(name, pop)] = agg
            log(f"{name:9s} {pop:8s}: visits/tile {agg['visits']:7.1f}  "
                f"leaf visits {agg['leaf_visits']:7.1f}  "
                f"pair tests {agg['pair_tests']:9.1f}")

    log("ratios vs A_sah (visits are the cost — r3f):")
    for pop in ("primary", "bounce1"):
        base = results[("A_sah", pop)]
        for name in ("B_karras", "C_ploc", "D_ploc_tri", "E_ploc_4run"):
            r = results[(name, pop)]
            log(f"  {name} {pop}: visits x{r['visits']/base['visits']:.2f}"
                f"  leaves x{r['leaf_visits']/base['leaf_visits']:.2f}"
                f"  events x{(r['visits']+r['leaf_visits'])/(base['visits']+base['leaf_visits']):.2f}")


if __name__ == "__main__":
    main()
