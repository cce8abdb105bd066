"""exp21: BVH8 union-visit counts vs collapse policy (CPU counts).

The wide-BVH collapse currently expands the largest-surface-area slot.
Visits are the whole cost model now (per-visit scalar costs are
prefetch-hidden; leaf MT work scales with leaf-child visits), so count
per-tile union visits for primaries (tile-major) and bounce-1
(pd5-sorted) under alternative policies:

  area    largest surface area first (production)
  leafy   prefer expanding slots whose children are leaves sooner
          (expand the internal slot with the SMALLEST area -> deeper
          wide nodes get big boxes)
  bfs     expand slots in FIFO discovery order (balanced-ish)
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from raytracer_tpu.core.types import RenderConfig
from raytracer_tpu.kernels.tracer import (initial_seed, make_primary_rays,
                                          shade)
from raytracer_tpu.kernels.pallas_trace import pallas_traverse
from raytracer_tpu.kernels.wavefront import sort_key
from exp6_pallas_trace import tile_order


def collapse_policy(nodes8, num_nodes, policy, width=8):
    nodes = np.asarray(nodes8)[:num_nodes]
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
            cand = [i for i, s in enumerate(slots) if col7[s] < 0]
            if not cand:
                break
            if policy == "area":
                pick = max(cand, key=lambda i: area(nodes[slots[i]]))
            elif policy == "leafy":
                pick = min(cand, key=lambda i: area(nodes[slots[i]]))
            else:  # bfs
                pick = cand[0]
            s = slots.pop(pick)
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
    return out, b2q


def count_visits(out, b2q, o, d, groups):
    """Union stack walk per group; returns (internal_visits, leaf_visits)."""
    n_int = n_leaf = 0
    ox, oy, oz = (np.asarray(c) for c in o)
    dx, dy, dz = (np.asarray(c) for c in d)
    ivx, ivy, ivz = 1.0 / dx, 1.0 / dy, 1.0 / dz
    P = ox.shape[0]
    G = P // groups
    for g in range(groups):
        sl = slice(g * G, (g + 1) * G)
        gox, goy, goz = ox[sl], oy[sl], oz[sl]
        gix, giy, giz = ivx[sl], ivy[sl], ivz[sl]
        closest = np.full(G, 1e4, np.float32)
        stack = [0]
        while stack:
            nid = stack.pop()
            ent = out[nid]
            n_int += 1
            for kind, ref, b in ent:
                t0x = (b[0] - gox) * gix
                t1x = (b[3] - gox) * gix
                t0y = (b[1] - goy) * giy
                t1y = (b[4] - goy) * giy
                t0z = (b[2] - goz) * giz
                t1z = (b[5] - goz) * giz
                ten = np.maximum(np.minimum(t0x, t1x),
                                 np.maximum(np.minimum(t0y, t1y),
                                            np.minimum(t0z, t1z)))
                tex = np.minimum(np.maximum(t0x, t1x),
                                 np.minimum(np.maximum(t0y, t1y),
                                            np.maximum(t0z, t1z)))
                hit = (tex > ten) & (tex > 1e-3) & (ten < closest)
                if hit.any():
                    if kind == "leaf":
                        n_leaf += 1
                    else:
                        stack.append(b2q[ref])
    return n_int, n_leaf


def main():
    from __graft_entry__ import _flagship_scene

    fs = _flagship_scene()
    W, H = 1280, 144
    P = W * H
    cfg = RenderConfig(width=W, height=H)
    from raytracer_tpu.core.camera import default_camera
    cam = default_camera(1280, 720)
    uni = cam.uniforms()
    ty, tx = tile_order(H, W, 16, 64)
    yy, xx = jnp.asarray(ty + 288), jnp.asarray(tx)
    pix = (yy * W + xx).astype(jnp.uint32)
    seed = initial_seed(uni, cfg, pix, 0)
    seed, ro, rd = make_primary_rays(uni, cfg, seed, xx, yy, 720)
    alive = jnp.ones((P,), bool)
    res = pallas_traverse(fs, ro, rd, alive, cfg, interpret=True)
    zero = jnp.zeros((P,), jnp.float32)
    one = jnp.ones((P,), jnp.float32)
    o1, d1, _, _, seed, alive1 = shade(res, ro, rd, (zero,)*3, (one,)*3,
                                       seed, alive, jnp.bool_(True), cfg)
    smin = tuple(fs.nodes8[0, ax] for ax in range(3))
    smax = tuple(fs.nodes8[0, 3 + ax] for ax in range(3))
    order = jnp.argsort(sort_key(o1, d1, alive1, smin, smax, "pd5"))
    o1s = tuple(np.asarray(jnp.take(c, order)) for c in o1)
    d1s = tuple(np.asarray(jnp.take(c, order)) for c in d1)

    # only keep live prefix tiles for bounce counting (dead tail trivial)
    na = int(np.asarray(alive1).sum())
    keep = (na // 1024) * 1024
    o1k = tuple(c[:keep] for c in o1s)
    d1k = tuple(c[:keep] for c in d1s)

    for policy in ("area", "leafy", "bfs"):
        out, b2q = collapse_policy(np.asarray(fs.nodes8),
                                   int(fs.num_nodes), policy)
        pi, plf = count_visits(out, b2q, (np.asarray(ro[0]),
                                          np.asarray(ro[1]),
                                          np.asarray(ro[2])),
                               (np.asarray(rd[0]), np.asarray(rd[1]),
                                np.asarray(rd[2])), P // 1024)
        bi, blf = count_visits(out, b2q, o1k, d1k, keep // 1024)
        print(f"{policy:6s}: n8={len(out):5d} primaries int={pi:6d} "
              f"leaf={plf:6d} | bounce1 int={bi:6d} leaf={blf:6d}",
              flush=True)


if __name__ == "__main__":
    main()
