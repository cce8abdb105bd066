"""exp33: thin-leaf sweep — is CLUSTER_SIZE=8 leaving MT waste on the table?

exp28 settled the FAT direction (T=32/64 for MXU det-MT: dead). This
prices the THIN direction: at the current T=8 the leaf-pair occupancy is
~0.006 (census part 7) — nearly every vectorized MT test is a wasted
lane. T=4 halves the per-visit MT work (count-gated halves become 2 tris)
at the cost of more leaf+inner visits and a deeper tree.

Same simulator as exp28 (production tile walk on the real flagship
geometry, cid-sorted bounce-1 tiles — the population that dominates the
frame: the three full-width bounce-round kernel calls are ~65 of the
108 ms device frame at r3d defaults). Cost model from MEASURED kernel
numbers (exp29: 219.4 ns per 8-wide slab visit at [16,128] = 0.98 ns per
vector op; mt tri ~66 vector ops -> 64.6 ns per [16,128] tri):

  walk_ns = visits * C_VISIT + sum_leaf(halves_run * (T/2) * C_TRI
                                        + C_LEAF_FIXED)

C_LEAF_FIXED covers the @pl.when + DMA-wait control; unknown, so the
verdict is reported at 0/30/60 ns. Pure NumPy, no TPU needed.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from experiments.exp28_fatleaf_stats import (TILE, T_MAX, T_MIN, build_wide,
                                             flagship_soup, log, walk_tile)

C_VISIT = 219.4          # ns, measured (exp29 subm walk, [16,128])
C_TRI = 66 * (219.4 / 224)   # ns per MT tri at [16,128]


def main():
    verts = flagship_soup()
    log(f"flagship soup: {verts.shape[0]} tris")
    rng = np.random.default_rng(3)

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
    pick = rng.choice(w * h, 8 * TILE, replace=False)
    o_p, d_p = o[pick], d[pick]

    trees = {}
    for T in (2, 4, 8, 16):
        t0 = time.time()
        trees[T] = build_wide(verts, T)
        wide, n_wide, starts, counts, tris = trees[T]
        log(f"T={T}: wide nodes {n_wide}, clusters {len(starts)}, "
            f"mean fill {counts.mean():.2f}/{T} "
            f"(built {time.time() - t0:.1f}s)")

    # bounce-1 rays from the T=8 tree's primary hits, cid-sorted
    # (winner cluster id of the T=8 tree <<3 | direction octant — the
    # production RAYTPU_SORT_KEY=cid emission).
    wide, n_wide, starts, counts, tris = trees[8]
    hits_o, hits_d, hits_cid = [], [], []
    for ti in range(8):
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
    key = (cid_b << 3) | oct3
    sb = np.argsort(key, kind="stable")
    o_b, d_b = o_b[sb], d_b[sb]
    n_tiles = o_b.shape[0] // TILE
    log(f"bounce-1 rays: {o_b.shape[0]} ({n_tiles} cid-sorted tiles)")

    print()
    header = (f"{'pop':8s} {'T':>3s} {'visits':>8s} {'leafvis':>8s} "
              f"{'halves':>8s} {'mt-tris':>8s} "
              f"{'ns@f0':>8s} {'ns@f30':>8s} {'ns@f60':>8s}")
    log(header)
    base = {}
    for T in (2, 4, 8, 16):
        wide, n_wide, starts, counts, tris = trees[T]
        half = max(T // 2, 1)
        for pop, (oo, dd) in (("primary", (o_p, d_p)),
                              ("bounce1", (o_b, d_b))):
            nt = min(6, oo.shape[0] // TILE)
            visits = leafvis = halves = 0
            for ti in range(nt):
                sl = slice(ti * TILE, (ti + 1) * TILE)
                _, _, st = walk_tile(wide, oo[sl, 0], oo[sl, 1],
                                     oo[sl, 2], dd[sl, 0], dd[sl, 1],
                                     dd[sl, 2], starts, counts, tris,
                                     leaf_size=T)
                visits += st["visits"]
                leafvis += st["leaf_visits"]
                halves += st["halves"]
            visits /= nt
            leafvis /= nt
            halves /= nt
            mt_tris = halves * half
            # `visits` counts popped wide nodes (internal only — leaves
            # are processed inline, never pushed), so the slab term uses
            # it directly.
            cost = {f: visits * C_VISIT + mt_tris * C_TRI + leafvis * f
                    for f in (0, 30, 60)}
            log(f"{pop:8s} {T:3d} {visits:8.1f} {leafvis:8.1f} "
                f"{halves:8.1f} {mt_tris:8.1f} "
                f"{cost[0]/1e3:7.1f}u {cost[30]/1e3:7.1f}u "
                f"{cost[60]/1e3:7.1f}u")
            if T == 8:
                base[pop] = cost


if __name__ == "__main__":
    main()
