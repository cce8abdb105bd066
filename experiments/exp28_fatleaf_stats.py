"""exp28: traversal statistics vs leaf size on the flagship geometry.

Decides the fat-leaf question for the MXU det-MT path (exp27): at leaf
size T the tree is ~T/8x shallower (fewer slab visits / per-visit scalar
overheads) but each leaf visit tests T triangles (pair tests grow unless
leaf visits shrink enough). This simulates the production tile-packet
walk (kernels/pallas_mega.py walk(): shared SMEM stack per [16,128]
tile, per-child vectorized slab test with per-ray closest pruning,
near-first push ordering by child-centroid key against the tile's mean
direction, per-ray Moller-Trumbore at leaves) in NumPy on the real
48.9k-tri flagship scene, for primaries and Lambert-scattered bounce-1
rays (sorted into tiles by the pd5-style key like the wavefront path).

Output per (population, T): wide-node visits/tile, leaf visits/tile,
pair tests/ray, plus the classic-vs-det VPU/MXU cost model applied to
those counts.

Pure NumPy + host builder — runs anywhere, no TPU needed.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TILE = 2048
T_MIN = 1e-3
T_MAX = 1e4
DET_EPS = 1e-5


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def flagship_soup():
    from raytracer_tpu.scene.objloader import load_obj
    from raytracer_tpu.utils import assets

    body = load_obj(assets.asset_path("FinalBaseMesh.obj"))
    body = body * 2.0 + np.array([0, -10, 0], np.float32)
    plane = (assets.make_ground_plane()
             * np.array([150, 1, 150], np.float32)
             + np.array([0, -10, 0], np.float32))
    return np.concatenate([plane, body]).astype(np.float32)


def build_wide(verts, leaf_size):
    """Host BVH at `leaf_size` + 8-wide collapse; returns (wide rows
    [R,128] f32 with metas, per-cluster (start, count), ordered tris)."""
    from raytracer_tpu.bvh.build import build_bvh_numpy
    from raytracer_tpu.bvh import bvh4
    from raytracer_tpu.core import fast_types

    bvh = build_bvh_numpy(verts, leaf_size=leaf_size)
    m = bvh.num_nodes
    leaf_mask = bvh.node_tri >= 0
    num_leaves = int(leaf_mask.sum())
    leaf_ids = np.empty(m, np.int32)
    leaf_ids[leaf_mask] = np.arange(num_leaves, dtype=np.int32)
    internal = np.nonzero(~leaf_mask)[0]
    leaf_ids[internal] = -(internal.astype(np.int32) + 2)
    nodes8 = np.zeros((m, 8), np.float32)
    nodes8[:, 0:3] = bvh.node_min
    nodes8[:, 3:6] = bvh.node_max
    nodes8[:, 6] = bvh.node_skip.astype(np.int32).view(np.float32)
    nodes8[:, 7] = leaf_ids.view(np.float32)

    # collapse4 asserts counts within CLUSTER_SIZE; bypass the encoding
    # (we read counts from our own table) by passing None and tracking
    # (start, count) per cluster id here.
    # Encode count=1 in the metas (count bits would overflow f32
    # exactness at leaf_size > 8); real counts are tracked separately.
    ones = np.ones(num_leaves, np.int32)
    wide, n_wide = bvh4.collapse4(nodes8, m, width=8, cluster_counts=ones)
    starts = bvh.node_tri[leaf_mask].astype(np.int64)
    counts = bvh.node_ntri[leaf_mask].astype(np.int64)
    tris = verts[bvh.order]
    return wide, n_wide, starts, counts, tris


def decode_meta(meta_f, leaf_size):
    """meta float -> (is_leaf, cid, wide_child) following bvh4.leaf_meta
    with CLUSTER_SIZE = leaf_size (count bits ignored: we track counts
    separately)."""
    from raytracer_tpu.core.fast_types import LEAF_CID_MASK

    meta = int(meta_f)
    if meta == 0:
        return None
    if meta > 0:
        return ("int", meta - 1)
    lid = -meta - 1
    return ("leaf", lid & LEAF_CID_MASK)


def walk_tile(wide, ox, oy, oz, dx, dy, dz, starts, counts, tris,
              leaf_size=8):
    """The pallas_mega walk in NumPy over one tile. Returns (closest,
    win  [tile] i64 winner tri or -1, stats dict). ``leaf_size`` only
    feeds the ``halves`` stat (the kernel's count-gated mt_half: the
    second half runs iff count > leaf_size//2)."""
    n = ox.shape[0]
    inv = lambda d: 1.0 / d
    ivx, ivy, ivz = inv(dx), inv(dy), inv(dz)
    closest = np.full(n, T_MAX, np.float32)
    win = np.full(n, -1, np.int64)
    mdx, mdy, mdz = dx.sum(), dy.sum(), dz.sum()
    visits = leaf_visits = pair_tests = pushes = halves = 0
    half_gran = max(leaf_size // 2, 1)
    stack = [0]
    while stack:
        nid = stack.pop()
        visits += 1
        row = wide[nid]
        entries = []
        for cc in range(8):
            b = 16 * cc
            meta = decode_meta(row[b + 6], 0)
            if meta is None:
                continue
            lo = row[b:b + 3]
            hi = row[b + 3:b + 6]
            l0 = (lo[0] - ox) * ivx
            h0 = (hi[0] - ox) * ivx
            l1 = (lo[1] - oy) * ivy
            h1 = (hi[1] - oy) * ivy
            l2 = (lo[2] - oz) * ivz
            h2 = (hi[2] - oz) * ivz
            t_en = np.maximum(np.minimum(l0, h0),
                              np.maximum(np.minimum(l1, h1),
                                         np.minimum(l2, h2)))
            t_ex = np.minimum(np.maximum(l0, h0),
                              np.minimum(np.maximum(l1, h1),
                                         np.maximum(l2, h2)))
            hit = (t_ex > t_en) & (t_ex > T_MIN) & (t_en < closest)
            if not hit.any():
                continue
            key = ((lo[0] + hi[0]) * mdx + (lo[1] + hi[1]) * mdy
                   + (lo[2] + hi[2]) * mdz)
            entries.append((key, meta, hit))
        # near-first: larger key pushed earlier -> popped later; the
        # kernel sorts descending and pushes in that order, so the
        # nearest (smallest key) child is on TOP. Emulate: push internals
        # sorted by key DESCENDING; process leaves immediately.
        ints = [e for e in entries if e[1][0] == "int"]
        if _ORDERED:
            ints = sorted(ints, key=lambda e: -e[0])
        for key, meta, hit in ints:
            stack.append(meta[1])
            pushes += 1
        for key, meta, hit in entries:
            if meta[0] != "leaf":
                continue
            leaf_visits += 1
            cid = meta[1]
            s0, cnt = starts[cid], counts[cid]
            pair_tests += cnt * int(hit.sum())
            halves += 1 + (1 if cnt > half_gran else 0)
            sel = np.nonzero(hit)[0]
            tv = tris[s0:s0 + cnt]
            v0 = tv[:, 0]
            e1 = tv[:, 1] - tv[:, 0]
            e2 = tv[:, 2] - tv[:, 0]
            o = np.stack([ox[sel], oy[sel], oz[sel]], -1)[:, None]
            d = np.stack([dx[sel], dy[sel], dz[sel]], -1)[:, None]
            pv = np.cross(d, e2[None])
            det = (e1[None] * pv).sum(-1)
            ok = np.abs(det) >= DET_EPS
            invd = 1.0 / np.where(ok, det, 1.0)
            s = o - v0[None]
            u = invd * (s * pv).sum(-1)
            q = np.cross(s, e1[None])
            v = invd * (d * q).sum(-1)
            tt = invd * (e2[None] * q).sum(-1)
            ok &= (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
            ok &= (tt > T_MIN) & (tt < closest[sel, None])
            tt = np.where(ok, tt, T_MAX).astype(np.float32)
            k = tt.argmin(axis=1)
            tbest = tt[np.arange(len(sel)), k]
            better = tbest < closest[sel]
            closest[sel] = np.where(better, tbest, closest[sel])
            win[sel] = np.where(better, s0 + k, win[sel])
    stats = dict(visits=visits, leaf_visits=leaf_visits, halves=halves,
                 pair_tests=pair_tests)
    return closest, win, stats


def sort_key(o, d, smin, smax):
    """pd5-style 30-bit interleave (kernels/wavefront.sort_key shape)."""
    chans = []
    for ax in range(3):
        span = max(smax[ax] - smin[ax], 1e-6)
        chans.append(np.clip((o[:, ax] - smin[ax]) / span * 31, 0,
                             31).astype(np.int64))
    for ax in range(3):
        chans.append(np.clip((d[:, ax] + 1) * 15.5, 0, 31).astype(np.int64))
    key = np.zeros(o.shape[0], np.int64)
    for b in range(5):
        for i, c in enumerate(chans):
            key |= ((c >> b) & 1) << (6 * b + i)
    return key


def main():
    verts = flagship_soup()
    log(f"flagship soup: {verts.shape[0]} tris")
    rng = np.random.default_rng(3)

    # primary rays from the reference camera pose
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

    smin, smax = verts.reshape(-1, 3).min(0), verts.reshape(-1, 3).max(0)

    results = {}
    trees = {}
    for T in (8, 32, 64):
        t0 = time.time()
        trees[T] = build_wide(verts, T)
        wide, n_wide, starts, counts, tris = trees[T]
        log(f"T={T}: wide nodes {n_wide}, clusters {len(starts)}, "
            f"mean fill {counts.mean():.1f}/{T} "
            f"(built {time.time() - t0:.1f}s)")

    # bounce-1 rays via the T=8 tree's primary hits
    wide, n_wide, starts, counts, tris = trees[8]
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
    log(f"bounce-1 rays: {o_b.shape[0]}")
    # sorted into tiles like the wavefront path
    kb = sort_key(o_b, d_b, smin, smax)
    sb = np.argsort(kb, kind="stable")
    o_b, d_b = o_b[sb], d_b[sb]

    for T in (8, 32, 64):
        wide, n_wide, starts, counts, tris = trees[T]
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
            results[(pop, T)] = agg
            log(f"T={T:2d} {pop:8s}: visits/tile {agg['visits']:7.1f}  "
                f"leaf visits/tile {agg['leaf_visits']:7.1f}  "
                f"pair tests/ray {agg['pair_tests'] / TILE:7.1f}")

    # cost model: per-visit slab ~8x22 vector ops + per-visit fixed ~F;
    # classic pair ~71 ops/8-lane-tri; det pair ~matmul + ~20/T ops.
    log("ratios vs T=8 (visits, leaf visits, pair tests):")
    for pop in ("primary", "bounce1"):
        base = results[(pop, 8)]
        for T in (32, 64):
            r = results[(pop, T)]
            log(f"  {pop} T={T}: visits x{r['visits'] / base['visits']:.2f}"
                f"  leaves x{r['leaf_visits'] / base['leaf_visits']:.2f}"
                f"  pairs x{r['pair_tests'] / base['pair_tests']:.2f}")


def key_sweep():
    """Part 2: sort-KEY quality — bounce-round tile-union size under
    different keys. The kernel emits the next round's key from the
    advanced state (pallas_mega.py), so any key computable there (incl.
    the winning leaf cluster id) is production-free; the union visit
    count it produces directly scales the bounce megakernel's time."""
    verts = flagship_soup()
    rng = np.random.default_rng(5)
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
    n_pool = 24 * TILE  # a ~49k-ray pool: tile locality grows with pool
    pick = rng.choice(w * h, n_pool, replace=False)
    o_p, d_p = o[pick], d[pick]

    wide, n_wide, starts, counts, tris = build_wide(verts, 8)
    smin = verts.reshape(-1, 3).min(0)
    smax = verts.reshape(-1, 3).max(0)

    t0 = time.time()
    hits_o, hits_d, hits_cid = [], [], []
    for ti in range(n_pool // TILE):
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
        nd = (n + sph)
        nd /= np.maximum(np.linalg.norm(nd, axis=1, keepdims=True), 1e-30)
        hits_o.append(hp)
        hits_d.append(nd.astype(np.float32))
        # winning cluster id: flat tri index // CLUSTER_SIZE would be
        # wrong for underfull leaves — map via starts
        cid = np.searchsorted(starts, winv[hit], side="right") - 1
        hits_cid.append(cid.astype(np.int64))
    o_b = np.concatenate(hits_o)
    d_b = np.concatenate(hits_d)
    cid_b = np.concatenate(hits_cid)
    log(f"key sweep pool: {o_b.shape[0]} bounce-1 rays "
        f"(primaries walked in {time.time() - t0:.0f}s)")

    def morton(chans, bits):
        key = np.zeros(chans[0].shape[0], np.int64)
        for b in range(bits):
            for i, c in enumerate(chans):
                key |= ((c >> b) & 1) << (len(chans) * b + i)
        return key

    def quant(x, lo, hi, bits):
        span = np.maximum(hi - lo, 1e-6)
        return np.clip((x - lo) / span * (2 ** bits - 1), 0,
                       2 ** bits - 1).astype(np.int64)

    # hit-region bbox: where bounce origins actually live
    blo, bhi = o_b.min(0), o_b.max(0)

    keys = {}
    oc = [quant(o_b[:, ax], smin[ax], smax[ax], 5) for ax in range(3)]
    dc = [quant(d_b[:, ax], -1.0, 1.0, 5) for ax in range(3)]
    keys["pd5 (prod)"] = morton(oc + dc, 5)
    oct3 = ((d_b[:, 0] > 0).astype(np.int64)
            | ((d_b[:, 1] > 0).astype(np.int64) << 1)
            | ((d_b[:, 2] > 0).astype(np.int64) << 2))
    om = [quant(o_b[:, ax], smin[ax], smax[ax], 9) for ax in range(3)]
    keys["oct_morton"] = (oct3 << 27) | morton(om, 9)
    ob = [quant(o_b[:, ax], blo[ax], bhi[ax], 8) for ax in range(3)]
    keys["pd_hitbox8+d3"] = morton(ob + [quant(d_b[:, ax], -1, 1, 8)
                                         for ax in range(3)], 8)[:]
    keys["o_hitbox9<<3|oct"] = (morton(ob, 8) << 3) | oct3
    # position-major with the STATIC scene bbox (already a kernel input):
    # if ~equal to the hitbox variant, production needs no dynamic bbox
    os9 = [quant(o_b[:, ax], smin[ax], smax[ax], 9) for ax in range(3)]
    keys["o_scene9<<3|oct"] = (morton(os9, 9) << 3) | oct3
    os7 = [quant(o_b[:, ax], smin[ax], smax[ax], 7) for ax in range(3)]
    keys["o_scene7<<3|oct"] = (morton(os7, 7) << 3) | oct3
    os10 = [quant(o_b[:, ax], smin[ax], smax[ax], 10) for ax in range(3)]
    keys["pos10 (no dir)"] = morton(os10, 10)
    keys["cid<<3|oct"] = (cid_b << 3) | oct3
    keys["cid<<6|dmorton2"] = (cid_b << 6) | morton(
        [quant(d_b[:, ax], -1, 1, 2) for ax in range(3)], 2)
    keys["oct<<k|cid"] = (oct3 << 20) | cid_b
    # cluster-morton: morton of the CLUSTER CENTROID (coarser than origin
    # but exactly kernel-emittable), then direction bits
    ccent = np.stack([tris[starts[c]:starts[c] + counts[c]].mean((0, 1))
                      for c in range(len(starts))])
    oc2 = [quant(ccent[cid_b, ax], smin[ax], smax[ax], 5)
           for ax in range(3)]
    keys["ccent5+d5"] = morton(oc2 + dc, 5)

    n_tiles = o_b.shape[0] // TILE
    log(f"walking {n_tiles} tiles per key ...")
    for name, key in keys.items():
        order = np.argsort(key, kind="stable")
        oo, dd = o_b[order], d_b[order]
        agg = dict(visits=0, leaf_visits=0, pair_tests=0)
        for ti in range(n_tiles):
            sl = slice(ti * TILE, (ti + 1) * TILE)
            _, _, st = walk_tile(wide, oo[sl, 0], oo[sl, 1], oo[sl, 2],
                                 dd[sl, 0], dd[sl, 1], dd[sl, 2],
                                 starts, counts, tris)
            for k in agg:
                agg[k] += st[k]
        log(f"  {name:18s}: visits/tile {agg['visits'] / n_tiles:7.1f}  "
            f"leaf/tile {agg['leaf_visits'] / n_tiles:7.1f}  "
            f"pairs/ray {agg['pair_tests'] / n_tiles / TILE:6.1f}")


def generic_collapse(nodes8, m, width):
    """collapse4's expansion policy (largest-area internal slot) for any
    width, as plain (bounds [n, w, 6], metas [n, w]) arrays: metas > 0
    internal wide id + 1, < 0 -(cid+1), 0 empty."""
    nodes = np.asarray(nodes8)[:m]
    links = nodes[:, 6:8].view(np.int32)
    skip, col7 = links[:, 0], links[:, 1]

    def area(b):
        d = np.maximum(b[3:6] - b[0:3], 0.0)
        return 2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

    out, b2q, pending = [], {}, []

    def create(b):
        if b in b2q:
            return b2q[b]
        my = len(out)
        b2q[b] = my
        left = b + 1
        slots = [left, skip[left]]
        while len(slots) < width:
            best, best_a = -1, -1.0
            for i, s in enumerate(slots):
                if col7[s] < 0 and area(nodes[s]) > best_a:
                    best, best_a = i, area(nodes[s])
            if best < 0:
                break
            s = slots.pop(best)
            slots.extend([s + 1, skip[s + 1]])
        ent = []
        for s in slots:
            if col7[s] >= 0:
                ent.append(("leaf", int(col7[s]), nodes[s, :6]))
            else:
                ent.append(("int", int(s), nodes[s, :6]))
                pending.append(int(s))
        out.append(ent)
        return my

    create(0)
    while pending:
        create(pending.pop())
    n = len(out)
    bounds = np.zeros((n, width, 6), np.float32)
    metas = np.zeros((n, width), np.int64)
    for qid, ent in enumerate(out):
        for c, e in enumerate(ent):
            bounds[qid, c] = e[2]
            metas[qid, c] = (-(e[1] + 1) if e[0] == "leaf"
                             else b2q[e[1]] + 1)
    return bounds, metas


def walk_tile_generic(bounds, metas, ox, oy, oz, dx, dy, dz,
                      starts, counts, tris):
    """walk_tile on the generic width-w structure (no MT pruning detail
    change: identical semantics, parameterized width)."""
    width = metas.shape[1]
    n = ox.shape[0]
    ivx, ivy, ivz = 1.0 / dx, 1.0 / dy, 1.0 / dz
    closest = np.full(n, T_MAX, np.float32)
    mdx, mdy, mdz = dx.sum(), dy.sum(), dz.sum()
    visits = leaf_visits = pair_tests = 0
    stack = [0]
    while stack:
        nid = stack.pop()
        visits += 1
        entries = []
        for cc in range(width):
            meta = metas[nid, cc]
            if meta == 0:
                continue
            lo = bounds[nid, cc, 0:3]
            hi = bounds[nid, cc, 3:6]
            l0, h0 = (lo[0] - ox) * ivx, (hi[0] - ox) * ivx
            l1, h1 = (lo[1] - oy) * ivy, (hi[1] - oy) * ivy
            l2, h2 = (lo[2] - oz) * ivz, (hi[2] - oz) * ivz
            t_en = np.maximum(np.minimum(l0, h0),
                              np.maximum(np.minimum(l1, h1),
                                         np.minimum(l2, h2)))
            t_ex = np.minimum(np.maximum(l0, h0),
                              np.minimum(np.maximum(l1, h1),
                                         np.maximum(l2, h2)))
            hit = (t_ex > t_en) & (t_ex > T_MIN) & (t_en < closest)
            if not hit.any():
                continue
            key = ((lo[0] + hi[0]) * mdx + (lo[1] + hi[1]) * mdy
                   + (lo[2] + hi[2]) * mdz)
            entries.append((key, meta, hit))
        for key, meta, hit in sorted([e for e in entries if e[1] > 0],
                                     key=lambda e: -e[0]):
            stack.append(meta - 1)
        for key, meta, hit in entries:
            if meta > 0:
                continue
            leaf_visits += 1
            cid = -meta - 1
            s0, cnt = starts[cid], counts[cid]
            pair_tests += cnt * int(hit.sum())
            sel = np.nonzero(hit)[0]
            tv = tris[s0:s0 + cnt]
            v0 = tv[:, 0]
            e1 = tv[:, 1] - tv[:, 0]
            e2 = tv[:, 2] - tv[:, 0]
            o = np.stack([ox[sel], oy[sel], oz[sel]], -1)[:, None]
            d = np.stack([dx[sel], dy[sel], dz[sel]], -1)[:, None]
            pv = np.cross(d, e2[None])
            det = (e1[None] * pv).sum(-1)
            ok = np.abs(det) >= DET_EPS
            invd = 1.0 / np.where(ok, det, 1.0)
            s = o - v0[None]
            u = invd * (s * pv).sum(-1)
            q = np.cross(s, e1[None])
            v = invd * (d * q).sum(-1)
            tt = invd * (e2[None] * q).sum(-1)
            ok &= (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
            ok &= (tt > T_MIN) & (tt < closest[sel, None])
            tt = np.where(ok, tt, T_MAX).astype(np.float32)
            tb = tt.min(axis=1)
            closest[sel] = np.minimum(closest[sel], tb)
    return dict(visits=visits, leaf_visits=leaf_visits,
                pair_tests=pair_tests)


def structure_sweep():
    """Part 3: node width (BVH8 vs BVH16) and split half-tile stacks,
    in union-visit terms, for sorted bounce-1 tiles under the om9 and
    cid keys (the round-3 production candidates)."""
    verts = flagship_soup()
    rng = np.random.default_rng(5)
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
    n_pool = 16 * TILE
    pick = rng.choice(w * h, n_pool, replace=False)
    o_p, d_p = o[pick], d[pick]

    wide, n_wide, starts, counts, tris = build_wide(verts, 8)
    smin = verts.reshape(-1, 3).min(0)
    smax = verts.reshape(-1, 3).max(0)

    hits_o, hits_d, hits_cid = [], [], []
    for ti in range(n_pool // TILE):
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
        nd = (n + sph)
        nd /= np.maximum(np.linalg.norm(nd, axis=1, keepdims=True), 1e-30)
        hits_o.append(hp)
        hits_d.append(nd.astype(np.float32))
        cid = np.searchsorted(starts, winv[hit], side="right") - 1
        hits_cid.append(cid.astype(np.int64))
    o_b = np.concatenate(hits_o)
    d_b = np.concatenate(hits_d)
    cid_b = np.concatenate(hits_cid)
    oct3 = ((d_b[:, 0] > 0).astype(np.int64)
            | ((d_b[:, 1] > 0).astype(np.int64) << 1)
            | ((d_b[:, 2] > 0).astype(np.int64) << 2))
    key = (cid_b << 3) | oct3
    order = np.argsort(key, kind="stable")
    o_b, d_b = o_b[order], d_b[order]
    n_tiles = o_b.shape[0] // TILE
    log(f"structure sweep: {o_b.shape[0]} bounce-1 rays (cid key), "
        f"{n_tiles} tiles")

    # binary tree reused for both widths
    from raytracer_tpu.bvh.build import build_bvh_numpy
    bvh = build_bvh_numpy(verts, leaf_size=8)
    m = bvh.num_nodes
    leaf_mask = bvh.node_tri >= 0
    nleaves = int(leaf_mask.sum())
    lids = np.empty(m, np.int32)
    lids[leaf_mask] = np.arange(nleaves, dtype=np.int32)
    lids[~leaf_mask] = -(np.nonzero(~leaf_mask)[0].astype(np.int32) + 2)
    nodes8 = np.zeros((m, 8), np.float32)
    nodes8[:, 0:3] = bvh.node_min
    nodes8[:, 3:6] = bvh.node_max
    nodes8[:, 6] = bvh.node_skip.astype(np.int32).view(np.float32)
    nodes8[:, 7] = lids.view(np.float32)
    st8 = bvh.node_tri[leaf_mask].astype(np.int64)
    ct8 = bvh.node_ntri[leaf_mask].astype(np.int64)
    tr8 = verts[bvh.order]

    for width in (8, 16):
        bb, mm = generic_collapse(nodes8, m, width)
        agg = dict(visits=0, leaf_visits=0, pair_tests=0)
        for ti in range(n_tiles):
            sl = slice(ti * TILE, (ti + 1) * TILE)
            st = walk_tile_generic(bb, mm, o_b[sl, 0], o_b[sl, 1],
                                   o_b[sl, 2], d_b[sl, 0], d_b[sl, 1],
                                   d_b[sl, 2], st8, ct8, tr8)
            for k in agg:
                agg[k] += st[k]
        log(f"  width={width:2d}: nodes {bb.shape[0]:5d}  "
            f"visits/tile {agg['visits'] / n_tiles:7.1f}  "
            f"slab tests/tile {agg['visits'] * width / n_tiles:8.1f}  "
            f"leaf/tile {agg['leaf_visits'] / n_tiles:7.1f}")

    # split stacks: whole [2048] tile vs two sorted halves of 1024
    bb, mm = generic_collapse(nodes8, m, 8)
    whole = dict(visits=0, leaf_visits=0, pair_tests=0)
    halves = dict(visits=0, leaf_visits=0, pair_tests=0)
    for ti in range(n_tiles):
        sl = slice(ti * TILE, (ti + 1) * TILE)
        st = walk_tile_generic(bb, mm, o_b[sl, 0], o_b[sl, 1],
                               o_b[sl, 2], d_b[sl, 0], d_b[sl, 1],
                               d_b[sl, 2], st8, ct8, tr8)
        for k in whole:
            whole[k] += st[k]
        for half in range(2):
            s2 = slice(ti * TILE + half * (TILE // 2),
                       ti * TILE + (half + 1) * (TILE // 2))
            st = walk_tile_generic(bb, mm, o_b[s2, 0], o_b[s2, 1],
                                   o_b[s2, 2], d_b[s2, 0], d_b[s2, 1],
                                   d_b[s2, 2], st8, ct8, tr8)
            for k in halves:
                halves[k] += st[k]
    log(f"  whole tile : visits/tile {whole['visits'] / n_tiles:7.1f} "
        f"leaf {whole['leaf_visits'] / n_tiles:7.1f}")
    log(f"  2 halves   : visits/tile {halves['visits'] / n_tiles:7.1f} "
        f"leaf {halves['leaf_visits'] / n_tiles:7.1f} "
        f"(vector work x{halves['visits'] / 2 / whole['visits']:.2f}, "
        f"fixed cost x{halves['visits'] / whole['visits']:.2f})")


def deep_key_sweep():
    """Part 4: pd5 vs om9 vs cid at bounce DEPTH (bounce-3 rays after two
    Lambert scatters) — checks the bounce-1 ranking holds where rounds
    are most incoherent."""
    verts = flagship_soup()
    rng = np.random.default_rng(9)
    from raytracer_tpu.core.camera import default_camera

    cam = default_camera(1280, 720)
    w, h = 1280, 720
    xs = (np.arange(w) + 0.5) / w
    ys = (np.arange(h) + 0.5) / h
    u, v = np.meshgrid(xs, ys)
    u, v = u.ravel(), v.ravel()
    d = (np.asarray(cam.lower_left_corner)
         + u[:, None] * np.asarray(cam.horizontal)
         + v[:, None] * np.asarray(cam.vertical)
         - np.asarray(cam.origin))
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    o = np.broadcast_to(np.asarray(cam.origin, np.float32),
                        d.shape).copy()
    n_pool = 24 * TILE
    pick = rng.choice(w * h, n_pool, replace=False)
    o_c, d_c = o[pick], d[pick]

    wide, n_wide, starts, counts, tris = build_wide(verts, 8)
    smin = verts.reshape(-1, 3).min(0)
    smax = verts.reshape(-1, 3).max(0)

    def advance(o_c, d_c, samples=1):
        """Walk all tiles; Lambert-scatter the hits (``samples``
        independent scatters per hit — union statistics only, so
        multiplying survivors is fair). Returns new o, d, winner cid."""
        ho, hd, hc = [], [], []
        for ti in range(o_c.shape[0] // TILE):
            sl = slice(ti * TILE, (ti + 1) * TILE)
            closest, winv, _ = walk_tile(
                wide, o_c[sl, 0], o_c[sl, 1], o_c[sl, 2],
                d_c[sl, 0], d_c[sl, 1], d_c[sl, 2], starts, counts, tris)
            hit = winv >= 0
            hp = o_c[sl][hit] + closest[hit, None] * d_c[sl][hit]
            tv = tris[winv[hit]]
            n = np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])
            n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True),
                            1e-30)
            dd = d_c[sl][hit]
            n = np.where((n * dd).sum(1, keepdims=True) > 0, -n, n)
            cid = np.searchsorted(starts, winv[hit], side="right") - 1
            for _ in range(samples):
                sph = rng.normal(size=n.shape)
                sph /= np.linalg.norm(sph, axis=1, keepdims=True)
                nd = n + sph
                nd /= np.maximum(np.linalg.norm(nd, axis=1,
                                                keepdims=True), 1e-30)
                ho.append(hp)
                hd.append(nd.astype(np.float32))
                hc.append(cid.astype(np.int64))
        return (np.concatenate(ho), np.concatenate(hd),
                np.concatenate(hc))

    # round-2 input = scatters off primary hits (the dominant bounce
    # round, covered by part 2); round-3 input = scatters off round-2
    # hits — only ~5% of round-2 rays hit again (matches production's
    # ~1.8 mean segments/ray), so multiply samples for statistics.
    for depth, samples in ((0, 1), (1, 4)):
        o_c, d_c, cid_c = advance(o_c, d_c, samples=samples)
        log(f"round-{depth + 2} input pool: {o_c.shape[0]} rays "
            f"(x{samples} scatters)")
        o_c = o_c[:o_c.shape[0] // TILE * TILE]
        d_c = d_c[:o_c.shape[0]]
        cid_c = cid_c[:o_c.shape[0]]

    def morton(chans, bits):
        key = np.zeros(chans[0].shape[0], np.int64)
        for b in range(bits):
            for i, c in enumerate(chans):
                key |= ((c >> b) & 1) << (len(chans) * b + i)
        return key

    def quant(x, lo, hi, bits):
        span = np.maximum(hi - lo, 1e-6)
        return np.clip((x - lo) / span * (2 ** bits - 1), 0,
                       2 ** bits - 1).astype(np.int64)

    oct3 = ((d_c[:, 0] > 0).astype(np.int64)
            | ((d_c[:, 1] > 0).astype(np.int64) << 1)
            | ((d_c[:, 2] > 0).astype(np.int64) << 2))
    oc5 = [quant(o_c[:, ax], smin[ax], smax[ax], 5) for ax in range(3)]
    dc5 = [quant(d_c[:, ax], -1.0, 1.0, 5) for ax in range(3)]
    os9 = [quant(o_c[:, ax], smin[ax], smax[ax], 9) for ax in range(3)]
    keys = {
        "pd5": morton(oc5 + dc5, 5),
        "om9": (morton(os9, 9) << 3) | oct3,
        "cid": (cid_c << 3) | oct3,
    }
    n_tiles = o_c.shape[0] // TILE
    for name, key in keys.items():
        order = np.argsort(key, kind="stable")
        oo, dd = o_c[order], d_c[order]
        agg = dict(visits=0, leaf_visits=0, pair_tests=0)
        for ti in range(n_tiles):
            sl = slice(ti * TILE, (ti + 1) * TILE)
            _, _, st = walk_tile(wide, oo[sl, 0], oo[sl, 1], oo[sl, 2],
                                 dd[sl, 0], dd[sl, 1], dd[sl, 2],
                                 starts, counts, tris)
            for k in agg:
                agg[k] += st[k]
        log(f"  round-3  {name:4s}: visits/tile {agg['visits'] / n_tiles:7.1f}"
            f"  leaf/tile {agg['leaf_visits'] / n_tiles:7.1f}")


def walk_tile_masked(wide, ox, oy, oz, dx, dy, dz, starts, counts,
                     tris, active):
    """walk_tile with an active-lane mask (dead riders): inactive lanes
    never register slab hits, so they add no visits of their own but
    still occupy tile lanes."""
    n = ox.shape[0]
    ivx, ivy, ivz = 1.0 / dx, 1.0 / dy, 1.0 / dz
    closest = np.full(n, T_MAX, np.float32)
    win = np.full(n, -1, np.int64)
    mdx = (dx * active).sum()
    mdy = (dy * active).sum()
    mdz = (dz * active).sum()
    visits = leaf_visits = 0
    stack = [0]
    while stack:
        nid = stack.pop()
        visits += 1
        row = wide[nid]
        entries = []
        for cc in range(8):
            meta = decode_meta(row[16 * cc + 6], 0)
            if meta is None:
                continue
            lo = row[16 * cc:16 * cc + 3]
            hi = row[16 * cc + 3:16 * cc + 6]
            l0, h0 = (lo[0] - ox) * ivx, (hi[0] - ox) * ivx
            l1, h1 = (lo[1] - oy) * ivy, (hi[1] - oy) * ivy
            l2, h2 = (lo[2] - oz) * ivz, (hi[2] - oz) * ivz
            t_en = np.maximum(np.minimum(l0, h0),
                              np.maximum(np.minimum(l1, h1),
                                         np.minimum(l2, h2)))
            t_ex = np.minimum(np.maximum(l0, h0),
                              np.minimum(np.maximum(l1, h1),
                                         np.maximum(l2, h2)))
            hit = ((t_ex > t_en) & (t_ex > T_MIN) & (t_en < closest)
                   & active)
            if not hit.any():
                continue
            key = ((lo[0] + hi[0]) * mdx + (lo[1] + hi[1]) * mdy
                   + (lo[2] + hi[2]) * mdz)
            entries.append((key, meta, hit))
        for key, meta, hit in sorted(
                [e for e in entries if e[1][0] == "int"],
                key=lambda e: -e[0]):
            stack.append(meta[1])
        for key, meta, hit in entries:
            if meta[0] != "leaf":
                continue
            leaf_visits += 1
            cid = meta[1]
            s0, cnt = starts[cid], counts[cid]
            sel = np.nonzero(hit)[0]
            tv = tris[s0:s0 + cnt]
            v0 = tv[:, 0]
            e1 = tv[:, 1] - tv[:, 0]
            e2 = tv[:, 2] - tv[:, 0]
            o = np.stack([ox[sel], oy[sel], oz[sel]], -1)[:, None]
            d = np.stack([dx[sel], dy[sel], dz[sel]], -1)[:, None]
            pv = np.cross(d, e2[None])
            det = (e1[None] * pv).sum(-1)
            ok = np.abs(det) >= DET_EPS
            invd = 1.0 / np.where(ok, det, 1.0)
            sdel = o - v0[None]
            u = invd * (sdel * pv).sum(-1)
            q = np.cross(sdel, e1[None])
            v = invd * (d * q).sum(-1)
            tt = invd * (e2[None] * q).sum(-1)
            ok &= (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
            ok &= (tt > T_MIN) & (tt < closest[sel, None])
            tt = np.where(ok, tt, T_MAX).astype(np.float32)
            k = tt.argmin(axis=1)
            tb = tt[np.arange(len(sel)), k]
            better = tb < closest[sel]
            closest[sel] = np.where(better, tb, closest[sel])
            win[sel] = np.where(better, s0 + k, win[sel])
    return closest, win, dict(visits=visits, leaf_visits=leaf_visits)


def order_sweep():
    """Part 6: near-first push ordering ON vs OFF under the cid sort.
    Ordering tightens closest-t earlier (fewer visits via the t_en <
    closest prune); in cid-pure tiles the rays share origins, so the
    ordering might already be implicit. Decides ORDER_MINW's default."""
    verts = flagship_soup()
    rng = np.random.default_rng(5)
    from raytracer_tpu.core.camera import default_camera

    cam = default_camera(1280, 720)
    w, h = 1280, 720
    xs = (np.arange(w) + 0.5) / w
    ys = (np.arange(h) + 0.5) / h
    u, v = np.meshgrid(xs, ys)
    u, v = u.ravel(), v.ravel()
    d = (np.asarray(cam.lower_left_corner)
         + u[:, None] * np.asarray(cam.horizontal)
         + v[:, None] * np.asarray(cam.vertical) - np.asarray(cam.origin))
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    o = np.broadcast_to(np.asarray(cam.origin, np.float32),
                        d.shape).copy()
    n_pool = 16 * TILE
    pick = rng.choice(w * h, n_pool, replace=False)
    o_p, d_p = o[pick], d[pick]
    wide, n_wide, starts, counts, tris = build_wide(verts, 8)

    hits_o, hits_d, hits_cid = [], [], []
    for ti in range(n_pool // TILE):
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
        cid = np.searchsorted(starts, winv[hit], side="right") - 1
        hits_cid.append(cid.astype(np.int64))
    o_b = np.concatenate(hits_o)
    d_b = np.concatenate(hits_d)
    cid_b = np.concatenate(hits_cid)
    oct3 = ((d_b[:, 0] > 0).astype(np.int64)
            | ((d_b[:, 1] > 0).astype(np.int64) << 1)
            | ((d_b[:, 2] > 0).astype(np.int64) << 2))
    order = np.argsort((cid_b << 3) | oct3, kind="stable")
    o_b, d_b = o_b[order], d_b[order]
    n_tiles = o_b.shape[0] // TILE
    import unittest.mock as mock

    def run(ordered):
        agg = dict(visits=0, leaf_visits=0, pair_tests=0)
        global _ORDERED
        _ORDERED = ordered
        for ti in range(n_tiles):
            sl = slice(ti * TILE, (ti + 1) * TILE)
            _, _, st = walk_tile(wide, o_b[sl, 0], o_b[sl, 1],
                                 o_b[sl, 2], d_b[sl, 0], d_b[sl, 1],
                                 d_b[sl, 2], starts, counts, tris)
            for k in agg:
                agg[k] += st[k]
        log(f"  ordered={ordered}: visits/tile {agg['visits'] / n_tiles:7.1f}"
            f"  leaf/tile {agg['leaf_visits'] / n_tiles:7.1f}"
            f"  pairs/ray {agg['pair_tests'] / n_tiles / TILE:6.1f}")

    log(f"order sweep: {o_b.shape[0]} bounce-1 rays (cid sort), "
        f"{n_tiles} tiles")
    run(True)
    run(False)


_ORDERED = True


def granularity_sweep():
    """Part 5: sort at granularity g (move g-ray groups per gather row —
    the per-round [w,N] takes and the argsort are ROW-rate limited, so
    rows/g cuts the glue ~g-fold) vs the cost: dead rays trapped inside
    live groups ride as inactive lanes, inflating later round widths,
    and group-key sorting loosens tile coherence. Deaths are spatially
    correlated through geometry (sorted neighbors hit sky together), so
    only a walk of the real scene can price it."""
    verts = flagship_soup()
    rng = np.random.default_rng(13)
    from raytracer_tpu.core.camera import default_camera

    cam = default_camera(1280, 720)
    w, h = 1280, 720
    xs = (np.arange(w) + 0.5) / w
    ys = (np.arange(h) + 0.5) / h
    u, v = np.meshgrid(xs, ys)
    u, v = u.ravel(), v.ravel()
    d = (np.asarray(cam.lower_left_corner)
         + u[:, None] * np.asarray(cam.horizontal)
         + v[:, None] * np.asarray(cam.vertical) - np.asarray(cam.origin))
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    o = np.broadcast_to(np.asarray(cam.origin, np.float32),
                        d.shape).copy()
    n_pool = 24 * TILE
    pick = rng.choice(w * h, n_pool, replace=False)
    o_p, d_p = o[pick], d[pick]

    wide, n_wide, starts, counts, tris = build_wide(verts, 8)

    # round-1 walk (coherent primaries, g irrelevant there) -> round-2
    # input pool in ROUND-1 SORTED ORDER (what production would carry)
    hits_o, hits_d, hits_cid = [], [], []
    for ti in range(n_pool // TILE):
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
        cid = np.searchsorted(starts, winv[hit], side="right") - 1
        hits_cid.append(cid.astype(np.int64))
    o2 = np.concatenate(hits_o)
    d2 = np.concatenate(hits_d)
    cid2 = np.concatenate(hits_cid)
    log(f"round-2 pool: {o2.shape[0]} rays")

    def key_of(d_c, cid_c):
        oct3 = ((d_c[:, 0] > 0).astype(np.int64)
                | ((d_c[:, 1] > 0).astype(np.int64) << 1)
                | ((d_c[:, 2] > 0).astype(np.int64) << 2))
        return (cid_c << 3) | oct3

    for g in (1, 2, 4, 8):
        # round 2: group-granular cid sort; group key = first member
        key = key_of(d2, cid2)
        m = (o2.shape[0] // (TILE)) * TILE  # whole tiles
        o_c, d_c, kk = o2[:m], d2[:m], key[:m]
        ng = m // g
        gkey = kk.reshape(ng, g)[:, 0]
        order = np.argsort(gkey, kind="stable")
        ridx = (order[:, None] * g + np.arange(g)[None]).reshape(-1)
        o_c, d_c = o_c[ridx], d_c[ridx]
        active = np.ones(m, bool)
        stats2 = dict(visits=0, leaf_visits=0)
        new_o = np.empty_like(o_c)
        new_d = np.empty_like(d_c)
        new_cid = np.zeros(m, np.int64)
        alive3 = np.zeros(m, bool)
        for ti in range(m // TILE):
            sl = slice(ti * TILE, (ti + 1) * TILE)
            closest, winv, st = walk_tile_masked(
                wide, o_c[sl, 0], o_c[sl, 1], o_c[sl, 2],
                d_c[sl, 0], d_c[sl, 1], d_c[sl, 2], starts, counts,
                tris, active[sl])
            for k2 in stats2:
                stats2[k2] += st[k2]
            hit = winv >= 0
            hp = o_c[sl] + closest[:, None] * d_c[sl]
            tv = tris[np.maximum(winv, 0)]
            n = np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])
            n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True),
                            1e-30)
            n = np.where((n * d_c[sl]).sum(1, keepdims=True) > 0, -n, n)
            sph = rng.normal(size=n.shape)
            sph /= np.linalg.norm(sph, axis=1, keepdims=True)
            nd = n + sph
            nd /= np.maximum(np.linalg.norm(nd, axis=1, keepdims=True),
                             1e-30)
            new_o[sl] = np.where(hit[:, None], hp, o_c[sl])
            new_d[sl] = np.where(hit[:, None], nd.astype(np.float32),
                                 d_c[sl])
            new_cid[sl] = np.where(
                hit, np.searchsorted(starts, np.maximum(winv, 0),
                                     side="right") - 1, 0)
            alive3[sl] = hit

        # round 3: groups with any live ray stay (dead riders inactive);
        # fully-dead groups drop. Group key = first LIVE member's key.
        key3 = key_of(new_d, new_cid)
        grp_alive = alive3.reshape(-1, g)
        keep = grp_alive.any(axis=1)
        first_live = np.argmax(grp_alive, axis=1)
        gkey3 = key3.reshape(-1, g)[np.arange(len(keep)), first_live]
        kept = np.nonzero(keep)[0]
        order3 = kept[np.argsort(gkey3[kept], kind="stable")]
        ridx3 = (order3[:, None] * g + np.arange(g)[None]).reshape(-1)
        w3 = len(ridx3)
        w3t = (w3 // TILE) * TILE
        ridx3 = ridx3[:w3t]
        o3a, d3a = new_o[ridx3], new_d[ridx3]
        act3 = alive3[ridx3]
        stats3 = dict(visits=0, leaf_visits=0)
        for ti in range(w3t // TILE):
            sl = slice(ti * TILE, (ti + 1) * TILE)
            _, _, st = walk_tile_masked(
                wide, o3a[sl, 0], o3a[sl, 1], o3a[sl, 2],
                d3a[sl, 0], d3a[sl, 1], d3a[sl, 2], starts, counts,
                tris, act3[sl])
            for k2 in stats3:
                stats3[k2] += st[k2]
        live3 = int(alive3.sum())
        log(f"g={g}: r2 visits {stats2['visits']:7d} leaf "
            f"{stats2['leaf_visits']:7d} | r3 width {w3} "
            f"(live {live3}, occ {live3 / max(w3, 1):.2f}) "
            f"visits {stats3['visits']:7d} leaf {stats3['leaf_visits']:6d}"
            f" | glue rows/round ~{m // g}")


def walk_tile_occ(wide, ox, oy, oz, dx, dy, dz, starts, counts, tris):
    """walk_tile that also tracks per-visit lane NEED: when a node is
    popped, all 2048 lanes pay its 8 slab tests, but only the rays whose
    push-time hit mask was true 'needed' the visit. Returns the usual
    stats plus visit-lane totals (paid vs needed) and the leaf
    pair-test-lane totals (paid = cnt * tile, needed = cnt * hit.sum())
    — the efficiency ceiling of any dense per-lane compaction scheme."""
    n = ox.shape[0]
    ivx, ivy, ivz = 1.0 / dx, 1.0 / dy, 1.0 / dz
    closest = np.full(n, T_MAX, np.float32)
    mdx, mdy, mdz = dx.sum(), dy.sum(), dz.sum()
    visits = leaf_visits = 0
    need_lanes = 0          # rays whose push-time mask wanted the visit
    leaf_pairs_paid = leaf_pairs_need = 0
    stack = [(0, np.ones(n, bool))]
    while stack:
        nid, need = stack.pop()
        visits += 1
        need_lanes += int(need.sum())
        row = wide[nid]
        entries = []
        for cc in range(8):
            meta = decode_meta(row[16 * cc + 6], 0)
            if meta is None:
                continue
            lo = row[16 * cc:16 * cc + 3]
            hi = row[16 * cc + 3:16 * cc + 6]
            l0, h0 = (lo[0] - ox) * ivx, (hi[0] - ox) * ivx
            l1, h1 = (lo[1] - oy) * ivy, (hi[1] - oy) * ivy
            l2, h2 = (lo[2] - oz) * ivz, (hi[2] - oz) * ivz
            t_en = np.maximum(np.minimum(l0, h0),
                              np.maximum(np.minimum(l1, h1),
                                         np.minimum(l2, h2)))
            t_ex = np.minimum(np.maximum(l0, h0),
                              np.minimum(np.maximum(l1, h1),
                                         np.maximum(l2, h2)))
            hit = (t_ex > t_en) & (t_ex > T_MIN) & (t_en < closest)
            if not hit.any():
                continue
            key = ((lo[0] + hi[0]) * mdx + (lo[1] + hi[1]) * mdy
                   + (lo[2] + hi[2]) * mdz)
            entries.append((key, meta, hit))
        for key, meta, hit in sorted(
                [e for e in entries if e[1][0] == "int"],
                key=lambda e: -e[0]):
            stack.append((meta[1], hit))
        for key, meta, hit in entries:
            if meta[0] != "leaf":
                continue
            leaf_visits += 1
            cid = meta[1]
            s0, cnt = starts[cid], counts[cid]
            leaf_pairs_paid += int(cnt) * n
            leaf_pairs_need += int(cnt) * int(hit.sum())
            sel = np.nonzero(hit)[0]
            tv = tris[s0:s0 + cnt]
            v0 = tv[:, 0]
            e1 = tv[:, 1] - tv[:, 0]
            e2 = tv[:, 2] - tv[:, 0]
            o = np.stack([ox[sel], oy[sel], oz[sel]], -1)[:, None]
            d = np.stack([dx[sel], dy[sel], dz[sel]], -1)[:, None]
            pv = np.cross(d, e2[None])
            det = (e1[None] * pv).sum(-1)
            ok = np.abs(det) >= DET_EPS
            invd = 1.0 / np.where(ok, det, 1.0)
            s = o - v0[None]
            u = invd * (s * pv).sum(-1)
            q = np.cross(s, e1[None])
            v = invd * (d * q).sum(-1)
            tt = invd * (e2[None] * q).sum(-1)
            ok &= (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
            ok &= (tt > T_MIN) & (tt < closest[sel, None])
            tt = np.where(ok, tt, T_MAX).astype(np.float32)
            closest[sel] = np.minimum(closest[sel], tt.min(axis=1))
    return dict(visits=visits, leaf_visits=leaf_visits,
                need_lanes=need_lanes, leaf_pairs_paid=leaf_pairs_paid,
                leaf_pairs_need=leaf_pairs_need)


def occupancy_sweep():
    """Part 7: divergence-headroom census (the round-4 question). A
    [16,128] tile pays every visit on all 2048 lanes; this measures what
    fraction of those lanes NEEDED each visit (push-time slab-hit mask)
    on cid-sorted bounce-1 tiles and on round-3-depth tiles. The
    inverse of that fraction is the hard CEILING of any in-kernel dense
    compaction scheme (per-visit ray lists, pair queues, ...) — if the
    ceiling is small, round 4 should hunt elsewhere."""
    verts = flagship_soup()
    rng = np.random.default_rng(5)
    from raytracer_tpu.core.camera import default_camera

    cam = default_camera(1280, 720)
    w, h = 1280, 720
    xs = (np.arange(w) + 0.5) / w
    ys = (np.arange(h) + 0.5) / h
    u, v = np.meshgrid(xs, ys)
    u, v = u.ravel(), v.ravel()
    d = (np.asarray(cam.lower_left_corner)
         + u[:, None] * np.asarray(cam.horizontal)
         + v[:, None] * np.asarray(cam.vertical) - np.asarray(cam.origin))
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    o = np.broadcast_to(np.asarray(cam.origin, np.float32),
                        d.shape).copy()
    n_pool = 16 * TILE
    pick = rng.choice(w * h, n_pool, replace=False)
    o_p, d_p = o[pick], d[pick]
    wide, n_wide, starts, counts, tris = build_wide(verts, 8)

    def scatter(o_c, d_c, samples=1):
        ho, hd, hc = [], [], []
        for ti in range(o_c.shape[0] // TILE):
            sl = slice(ti * TILE, (ti + 1) * TILE)
            closest, winv, _ = walk_tile(
                wide, o_c[sl, 0], o_c[sl, 1], o_c[sl, 2],
                d_c[sl, 0], d_c[sl, 1], d_c[sl, 2], starts, counts, tris)
            hit = winv >= 0
            hp = o_c[sl][hit] + closest[hit, None] * d_c[sl][hit]
            tv = tris[winv[hit]]
            n = np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])
            n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True),
                            1e-30)
            dd = d_c[sl][hit]
            n = np.where((n * dd).sum(1, keepdims=True) > 0, -n, n)
            cid = np.searchsorted(starts, winv[hit], side="right") - 1
            for _ in range(samples):
                sph = rng.normal(size=n.shape)
                sph /= np.linalg.norm(sph, axis=1, keepdims=True)
                nd = n + sph
                nd /= np.maximum(np.linalg.norm(nd, axis=1,
                                                keepdims=True), 1e-30)
                ho.append(hp)
                hd.append(nd.astype(np.float32))
                hc.append(cid.astype(np.int64))
        return (np.concatenate(ho), np.concatenate(hd),
                np.concatenate(hc))

    def census(tag, o_c, d_c, cid_c):
        oct3 = ((d_c[:, 0] > 0).astype(np.int64)
                | ((d_c[:, 1] > 0).astype(np.int64) << 1)
                | ((d_c[:, 2] > 0).astype(np.int64) << 2))
        order = np.argsort((cid_c << 3) | oct3, kind="stable")
        o_c, d_c = o_c[order], d_c[order]
        n_tiles = o_c.shape[0] // TILE
        agg = dict(visits=0, leaf_visits=0, need_lanes=0,
                   leaf_pairs_paid=0, leaf_pairs_need=0)
        for ti in range(n_tiles):
            sl = slice(ti * TILE, (ti + 1) * TILE)
            st = walk_tile_occ(wide, o_c[sl, 0], o_c[sl, 1], o_c[sl, 2],
                               d_c[sl, 0], d_c[sl, 1], d_c[sl, 2],
                               starts, counts, tris)
            for k in agg:
                agg[k] += st[k]
        slab_occ = agg["need_lanes"] / (agg["visits"] * TILE)
        leaf_occ = agg["leaf_pairs_need"] / max(agg["leaf_pairs_paid"], 1)
        solo = agg["need_lanes"] / (n_tiles * TILE)
        log(f"{tag}: tiles {n_tiles}  visits/tile "
            f"{agg['visits'] / n_tiles:7.1f}  solo visits/ray {solo:6.1f}"
            f"  slab-lane occ {slab_occ:.3f} (ceiling x{1 / slab_occ:.1f})"
            f"  leaf-pair occ {leaf_occ:.3f} "
            f"(ceiling x{1 / max(leaf_occ, 1e-9):.1f})")

    o_b, d_b, cid_b = scatter(o_p, d_p)
    log(f"bounce-1 pool: {o_b.shape[0]} rays")
    census("bounce-1 (cid)", o_b, d_b, cid_b)
    o_3, d_3, cid_3 = scatter(o_b, d_b, samples=4)
    log(f"round-3 pool: {o_3.shape[0]} rays (x4 scatters)")
    census("round-3  (cid)", o_3, d_3, cid_3)


if __name__ == "__main__":
    part = os.environ.get("EXP28_PART", "1")
    if part == "2":
        key_sweep()
    elif part == "3":
        structure_sweep()
    elif part == "4":
        deep_key_sweep()
    elif part == "5":
        granularity_sweep()
    elif part == "6":
        order_sweep()
    elif part == "7":
        occupancy_sweep()
    else:
        main()
