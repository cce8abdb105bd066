"""Driver for exp20: parity (interpret/CPU) + timing (TPU).

Reference for parity: the unsorted XLA bounce chain — repeat
(pallas_traverse -> tracer.shade) with the in-sphere sampler pinned to
the kernel's fixed rejection bound so RNG streams match draw-for-draw.
"""
import sys, time, os, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from raytracer_tpu.bvh.bvh4 import collapse4
from raytracer_tpu.core.types import RenderConfig
from raytracer_tpu.kernels import rng as rngmod
from raytracer_tpu.kernels.pallas_trace import pallas_traverse
from raytracer_tpu.kernels.tracer import (initial_seed, make_primary_rays,
                                          shade)
from exp20_bounce_megakernel import SPHERE_ITERS, bounce_mega

LANES = 128

# Pin the XLA sampler's rejection bound to the kernel's (stream parity).
_orig_sphere = rngmod.random_vec3_in_unit_sphere
rngmod.random_vec3_in_unit_sphere = functools.partial(
    _orig_sphere, max_iters=SPHERE_ITERS)


def to_blocks(arrs):
    return tuple(a.reshape(-1, LANES) for a in arrs)


def gen_state(fs, cfg, cam_uni, xx, yy, gh, P, interpret):
    """Primaries + first shade -> bounce-2 input state."""
    pix = (yy * cfg.width + xx).astype(jnp.uint32)
    s = initial_seed(cam_uni, cfg, pix, 0)
    s, o, d = make_primary_rays(cam_uni, cfg, s, xx, yy, gh)
    ones = jnp.ones((P,), bool)
    r = pallas_traverse(fs, o, d, ones, cfg, interpret=interpret)
    zero = jnp.zeros((P,), jnp.float32)
    one = jnp.ones((P,), jnp.float32)
    o, d, col, att, s, alive = shade(r, o, d, (zero,)*3, (one,)*3, s,
                                     ones, jnp.bool_(True), cfg)
    return o, d, col, att, s, alive


def ref_chain(fs, cfg, state, bounces, interpret):
    o, d, col, att, s, alive = state
    rays = jnp.float32(0)
    for _ in range(bounces):
        rays = rays + jnp.sum(alive.astype(jnp.float32))
        r = pallas_traverse(fs, o, d, alive, cfg, interpret=interpret)
        o, d, col, att, s, alive = shade(r, o, d, col, att, s, alive,
                                         jnp.bool_(True), cfg)
    return col, s, alive, rays


def mega_chain(npack8, clusters, n8, cfg, state, bounces, sub, interpret):
    o, d, col, att, s, alive = state
    blocks = to_blocks(list(o) + list(d) + list(col) + list(att)) + (
        s.astype(jnp.int32).reshape(-1, LANES),
        alive.astype(jnp.float32).reshape(-1, LANES))
    num = jnp.asarray(n8, jnp.int32).reshape(1)
    bcap = jnp.asarray(bounces, jnp.int32).reshape(1)
    sky = jnp.asarray(1, jnp.int32).reshape(1)
    outs = bounce_mega(npack8, clusters, num, blocks, bcap, sky, sub,
                       float(cfg.fuzz), bool(cfg.emissive_emits),
                       interpret=interpret)
    P = o[0].shape[0]
    col = tuple(outs[6 + i].reshape(P) for i in range(3))
    seed = outs[12].reshape(P).astype(jnp.uint32)
    alive = outs[13].reshape(P) > 0.5
    rays = jnp.sum(outs[14])
    return col, seed, alive, rays


def parity():
    from raytracer_tpu.scene.builder import build_fast_scene_from_arrays
    from raytracer_tpu.utils import assets
    from raytracer_tpu.core.camera import Camera

    cube = assets.make_cube() * 4.0 + np.array([0, -6, 0], np.float32)
    metal = assets.make_cube() * 3.0 + np.array([9, -7, 2], np.float32)
    emis = assets.make_icosphere(1, 1.5) + np.array([-6, 4, 3], np.float32)
    plane = (assets.make_ground_plane() * np.array([150, 1, 150],
                                                   np.float32)
             + np.array([0, -10, 0], np.float32))
    verts = np.concatenate([plane, cube, metal, emis]).astype(np.float32)
    mats = np.zeros((verts.shape[0], 4), np.float32)
    mats[:, 0:3] = (0.7, 0.5, 0.4)
    mats[2 + cube.shape[0]:2 + cube.shape[0] + metal.shape[0], 3] = 2.0
    mats[2 + cube.shape[0] + metal.shape[0]:, 0:3] = (3.0, 3.0, 2.5)
    mats[2 + cube.shape[0] + metal.shape[0]:, 3] = 3.0
    fs = build_fast_scene_from_arrays(verts, mats)
    npack8, n8 = collapse4(np.asarray(fs.nodes8), int(fs.num_nodes),
                           width=8)
    npack8 = jnp.asarray(npack8)

    w = h = 64
    P = w * h
    cfg = RenderConfig(width=w, height=h, max_bounces=6)
    cam = Camera(origin=(-10.0, 6.0, 30.0), look_at=(0.0, -6.0, 0.0),
                 vfov_deg=40.0, aspect_ratio=1.0)
    i = np.arange(P)
    xx = jnp.asarray(i % w, jnp.int32)
    yy = jnp.asarray(i // w, jnp.int32)
    state = gen_state(fs, cfg, cam.uniforms(), xx, yy, h, P, True)

    ca, sa, aa, ra = ref_chain(fs, cfg, state, 5, True)
    cb, sb, ab, rb = mega_chain(npack8, fs.clusters, n8, cfg, state, 5,
                                8, True)
    for n, x, y in (("r", ca[0], cb[0]), ("g", ca[1], cb[1]),
                    ("b", ca[2], cb[2])):
        d = float(jnp.max(jnp.abs(x - y)))
        print(f"color {n}: max|diff| {d:.2e}", flush=True)
    print("seed equal:", bool(jnp.all(sa == sb)),
          " alive equal:", bool(jnp.all(aa == ab)),
          " rays:", float(ra), float(rb), flush=True)


def timing():
    from exp6_pallas_trace import tile_order
    from raytracer_tpu.core.camera import default_camera
    from raytracer_tpu.kernels.wavefront import sort_key
    from __graft_entry__ import _flagship_scene

    fs = _flagship_scene()
    npack8, n8 = collapse4(np.asarray(fs.nodes8), int(fs.num_nodes),
                           width=8)
    npack8 = jnp.asarray(npack8)
    W, H = 1280, 144
    P = W * H
    cfg = RenderConfig(width=W, height=H)
    cam = default_camera(1280, 720)
    ty, tx = tile_order(H, W, 16, 128)
    yyt, xxt = jnp.asarray(ty + 288), jnp.asarray(tx)

    @jax.jit
    def prep(scene, u):
        st = gen_state(scene, cfg, u, xxt, yyt, 720, P, False)
        o, d, col, att, s, alive = st
        smin = tuple(scene.nodes8[0, ax] for ax in range(3))
        smax = tuple(scene.nodes8[0, 3 + ax] for ax in range(3))
        order = jnp.argsort(sort_key(o, d, alive, smin, smax, "pd5"))
        take = lambda c: jnp.take(c, order)
        return (tuple(take(c) for c in o), tuple(take(c) for c in d),
                tuple(take(c) for c in col), tuple(take(c) for c in att),
                take(s), take(alive))

    state = jax.tree.map(lambda x: x, prep(fs, cam.uniforms()))

    from raytracer_tpu.kernels.wavefront import wavefront_bounces
    import dataclasses
    cfg10 = dataclasses.replace(cfg, max_bounces=10)

    @functools.partial(jax.jit, static_argnames=("k", "mode"))
    def chain(state, salt, k, mode):
        def body(i, acc):
            o = (state[0][0] + (salt + i).astype(jnp.float32) * 1e-12,
                 state[0][1], state[0][2])
            st = (o,) + tuple(state[1:])
            if mode == "mega":
                col, s2, al, rays = mega_chain(npack8, fs.clusters, n8,
                                               cfg, st, 9, 8, False)
            elif mode == "wave":
                o2, d2, c2, a2, s2, al2 = st
                cx, cy, cz, rays = wavefront_bounces(
                    fs, o2, d2, c2, a2, s2, al2, jnp.bool_(True), cfg10,
                    start_bounce=1)
                col = (cx, cy, cz)
            else:
                col, s2, al, rays = ref_chain(fs, cfg, st, 9, False)
            return acc + jnp.sum(col[0]) + rays
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    def timed(fn, k, reps=5):
        float(fn(k=k))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(fn(k=k))
            ts.append(time.time() - t0)
        return min(ts)

    for mode in ("wave", "mega"):
        try:
            fn = functools.partial(chain, state, jnp.uint32(3), mode=mode)
            t2, t8 = timed(fn, 2), timed(fn, 8)
            per = (t8 - t2) / 6
            print(f"{mode:5s} bounce2..10 on 184k band: {per*1e3:7.2f} ms",
                  flush=True)
        except Exception as e:
            print(f"{mode}: FAIL {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    if jax.default_backend() != "tpu":
        parity()
    else:
        timing()
