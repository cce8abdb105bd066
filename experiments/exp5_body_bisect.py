"""Bisect the real packet-traversal body: which op costs 0.5 ms/iter?

Variants: full body / no cluster-MT / no node-gather (synthetic rows) /
AABB only / MT-every-iteration. Instrumented with iteration counters.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

from raytracer_tpu.core.types import RenderConfig
from raytracer_tpu.core.fast_types import CLUSTER_SIZE, TRI_STRIDE
from raytracer_tpu.scene.builder import build_fast_scene_from_arrays
from raytracer_tpu.core.camera import default_camera
from raytracer_tpu.utils import assets

print(jax.devices(), flush=True)

tris = assets.make_terrain(n=158)
mats = np.zeros((tris.shape[0], 4), np.float32)
mats[:, 0:3] = 0.5
scene = build_fast_scene_from_arrays(tris, mats)
cfg = RenderConfig()

W, H = 640, 360
cam = default_camera(W, H)
yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
u = (xx + 0.5) / W
v = (H - 1 - yy + 0.5) / H
d = (cam.lower_left_corner + u[..., None] * cam.horizontal
     + v[..., None] * cam.vertical - cam.origin)
d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
o = np.broadcast_to(cam.origin.astype(np.float32), (H, W, 3)).copy()


def to_groups(a):  # [H,W,3] -> 3 comps [64, NT]
    g = (a.reshape(H // 8, 8, W // 8, 8, 3).transpose(1, 3, 0, 2, 4)
         .reshape(64, -1, 3))
    return g[..., 0], g[..., 1], g[..., 2]


g_o = tuple(jnp.asarray(c) for c in to_groups(o))
g_d = tuple(jnp.asarray(c) for c in to_groups(d))


def traverse_variant(variant, ray_o, ray_d):
    num_nodes = scene.num_nodes
    g, ng = ray_o[0].shape
    inv_d = (1.0 / ray_d[0], 1.0 / ray_d[1], 1.0 / ray_d[2])
    node = jnp.zeros((ng,), jnp.int32)
    closest_t = jnp.full((g, ng), cfg.t_max, jnp.float32)

    def cond(c):
        return jnp.any(c[0] < num_nodes)

    def body(c):
        node, closest_t, it = c
        in_flight = node < num_nodes
        safe = jnp.where(in_flight, node, 0)
        if variant == "nogather":
            rows = jnp.broadcast_to(
                jnp.arange(8, dtype=jnp.float32), (ng, 8)) + safe[:, None]
            skip = (safe + 2).astype(jnp.int32)
            leaf = jnp.where(safe % 3 == 0, safe % 1024, -(safe + 2) - 1)
        else:
            rows = jnp.take(scene.nodes8, safe, axis=0)
            skip = jax.lax.bitcast_convert_type(rows[:, 6], jnp.int32)
            leaf = jax.lax.bitcast_convert_type(rows[:, 7], jnp.int32)
        left = -leaf - 1

        bmin = rows[None, :, 0:3]
        bmax = rows[None, :, 3:6]
        ro3 = jnp.stack(ray_o, axis=-1)
        inv3 = jnp.stack(inv_d, axis=-1)
        t0s = (bmin - ro3) * inv3
        t1s = (bmax - ro3) * inv3
        t_enter = jnp.max(jnp.minimum(t0s, t1s), axis=-1)
        t_exit = jnp.min(jnp.maximum(t0s, t1s), axis=-1)
        ray_hit = ((t_exit > t_enter) & (t_exit > cfg.t_min)
                   & (t_enter < closest_t))
        group_hit = jnp.any(ray_hit, axis=0) & in_flight
        is_leaf = leaf >= 0
        do_leaf = group_hit & is_leaf

        if variant in ("full", "nogather", "mtalways"):
            gate = do_leaf if variant != "mtalways" else group_hit
            crow = jnp.take(scene.clusters,
                            jnp.where(gate, jnp.clip(leaf, 0, 6143), 0),
                            axis=0)
            trisv = crow.reshape(ng, CLUSTER_SIZE, TRI_STRIDE)
            v0 = trisv[..., 0:3]
            e1 = trisv[..., 3:6] - v0
            e2 = trisv[..., 6:9] - v0
            ro = ro3[:, :, None, :]
            rd = jnp.stack(ray_d, axis=-1)[:, :, None, :]
            pvec = jnp.cross(rd, e2[None])
            det = jnp.sum(e1[None] * pvec, axis=-1)
            ok = jnp.abs(det) > cfg.det_eps
            idet = 1.0 / jnp.where(ok, det, 1.0)
            s = ro - v0[None]
            uu = idet * jnp.sum(s * pvec, axis=-1)
            ok &= (uu >= 0.0) & (uu <= 1.0)
            qv = jnp.cross(s, e1[None])
            vv = idet * jnp.sum(rd * qv, axis=-1)
            ok &= (vv >= 0.0) & (uu + vv <= 1.0)
            t = idet * jnp.sum(e2[None] * qv, axis=-1)
            ok &= (t > cfg.t_min) & (t < closest_t[..., None])
            ok &= gate[None, :, None]
            tm = jnp.where(ok, t, jnp.inf)
            closest_t = jnp.minimum(closest_t, jnp.min(tm, axis=-1))
        # variant == "aabbonly": skip MT entirely.

        descend = group_hit & ~is_leaf
        node = jnp.where(in_flight, jnp.where(descend, left, skip), node)
        return node, closest_t, it + 1

    node, closest_t, it = jax.lax.while_loop(
        cond, body, (node, closest_t, jnp.int32(0)))
    return closest_t, it


for variant in ("full", "aabbonly", "nogather", "mtalways"):
    f = jax.jit(lambda ro, rd, variant=variant: traverse_variant(
        variant, ro, rd))
    ct, it = f(g_o, g_d)
    it0 = int(it)
    t0 = time.perf_counter()
    ct, it = f(tuple(c + 1e-6 for c in g_o), g_d)
    itn = int(it)
    dt = time.perf_counter() - t0
    print(f"{variant:9s}: {itn:5d} iters, {dt:6.2f}s -> "
          f"{dt/itn*1e6:7.0f} us/iter", flush=True)
print("DONE", flush=True)
