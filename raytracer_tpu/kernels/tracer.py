"""The wavefront path tracer: ray-gen, stackless BVH traversal, scatter.

TPU-native re-design of the GLSL megakernel
(``shaders/compute_dynamic_ray.comp`` — the shipped pipeline,
``engine/VulkanEngine.java:49``). One GPU thread per pixel with a per-thread
traversal stack becomes: *every ray in the frame advances in lockstep*
through a stackless skip-link walk of the pre-order flattened BVH, with all
per-ray divergence expressed as masks. Intersection math (slab AABB test,
Möller–Trumbore with det eps 1e-5, normal flipped toward the ray) matches
``compute_dynamic_ray.comp:88-129`` so per-pixel RGB agrees with the
reference within the 1e-3 acceptance budget.

All state is structure-of-arrays: vectors are (x, y, z) component tuples of
flat [P] arrays so the ray dimension stays minormost (see kernels/vec.py —
[P, 3]-shaped math wastes ~42x of every TPU vector register on padding).

Visit-order note: the GLSL loop pushes right-then-left and pops left first
(``:205-208``), i.e. pre-order DFS. The skip-link walk visits nodes in
exactly that order, so closest-t pruning prunes identically.

This module also *closes* the reference's capability/kernel gaps
(SURVEY.md §2 discrepancies): Emissive materials terminate the path and
emit (the shipped kernel absorbs them to black), the sky toggle actually
reaches shading, and RNG can mix the accumulation frame index so
progressive rendering converges instead of re-rendering sample #0 forever.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from raytracer_tpu.core.types import CameraUniforms, GpuScene, RenderConfig
from raytracer_tpu.kernels import rng
from raytracer_tpu.kernels import vec


def sky_color(d: vec.V3) -> vec.V3:
    """White->blue vertical gradient (compute_dynamic_ray.comp:81-85)."""
    unit = vec.normalize(d)
    t = 0.5 * (unit[1] + 1.0)
    omt = 1.0 - t
    return (omt + t * 0.5, omt + t * 0.7, omt + t * 1.0)


class TraversalResult(NamedTuple):
    closest_t: jnp.ndarray   # f32[P]
    hit: jnp.ndarray         # bool[P]
    normal: vec.V3           # 3 x f32[P], geometric, flipped toward ray
    mat_albedo: vec.V3       # 3 x f32[P]
    mat_type: jnp.ndarray    # f32[P]


def traverse(scene: GpuScene, ray_o: vec.V3, ray_d: vec.V3, active,
             cfg: RenderConfig) -> TraversalResult:
    """Find the closest triangle hit for every ray, in lockstep.

    Stackless walk: AABB-hit internal node -> i+1 (its left child, pre-order
    adjacency); anything else -> node_skip[i]. A ray is done when its index
    reaches num_nodes. Dead rays start at the sentinel.
    """
    bvh = scene.bvh
    num_nodes = scene.num_nodes  # dynamic scalar
    p = ray_o[0].shape[0]
    tri9 = scene.tri_verts.reshape(-1, 9)

    inv_d = (1.0 / ray_d[0], 1.0 / ray_d[1], 1.0 / ray_d[2])

    node = jnp.where(active, jnp.int32(0), num_nodes)
    closest_t = jnp.full((p,), cfg.t_max, jnp.float32)
    hit_tri = jnp.full((p,), -1, jnp.int32)
    nx = jnp.zeros((p,), jnp.float32)
    ny = jnp.zeros((p,), jnp.float32)
    nz = jnp.zeros((p,), jnp.float32)

    def cond(c):
        return jnp.any(c[0] < num_nodes)

    def body(c):
        node, closest_t, hit_tri, nx, ny, nz = c
        in_flight = node < num_nodes
        safe = jnp.where(in_flight, node, 0)

        nmin = jnp.take(bvh.node_min, safe, axis=0)   # [P, 3]
        nmax = jnp.take(bvh.node_max, safe, axis=0)
        tri = jnp.take(bvh.node_tri, safe, axis=0)
        skip = jnp.take(bvh.node_skip, safe, axis=0)

        # Slab AABB test (compute_dynamic_ray.comp:88-103), t-bounded by
        # the ray's current closest hit. Unrolled per axis (SoA).
        t_enter = jnp.float32(-jnp.inf)
        t_exit = jnp.float32(jnp.inf)
        for ax in range(3):
            t0 = (nmin[:, ax] - ray_o[ax]) * inv_d[ax]
            t1 = (nmax[:, ax] - ray_o[ax]) * inv_d[ax]
            t_enter = jnp.maximum(t_enter, jnp.minimum(t0, t1))
            t_exit = jnp.minimum(t_exit, jnp.maximum(t0, t1))
        box_hit = ((t_exit > t_enter) & (t_exit > cfg.t_min)
                   & (t_enter < closest_t) & in_flight)

        is_leaf = tri >= 0
        leaf_hit = box_hit & is_leaf

        # Möller–Trumbore for rays sitting at a hit leaf
        # (compute_dynamic_ray.comp:105-129).
        t_idx = jnp.where(leaf_hit, tri, 0)
        tv = jnp.take(tri9, t_idx, axis=0)            # [P, 9]
        v0 = (tv[:, 0], tv[:, 1], tv[:, 2])
        e1 = (tv[:, 3] - tv[:, 0], tv[:, 4] - tv[:, 1], tv[:, 5] - tv[:, 2])
        e2 = (tv[:, 6] - tv[:, 0], tv[:, 7] - tv[:, 1], tv[:, 8] - tv[:, 2])

        pvec = vec.cross(ray_d, e2)
        det = vec.dot(e1, pvec)
        ok = ~((det > -cfg.det_eps) & (det < cfg.det_eps))
        inv_det = 1.0 / jnp.where(ok, det, 1.0)
        s = vec.sub(ray_o, v0)
        u = inv_det * vec.dot(s, pvec)
        ok &= (u >= 0.0) & (u <= 1.0)
        qvec = vec.cross(s, e1)
        v = inv_det * vec.dot(ray_d, qvec)
        ok &= (v >= 0.0) & (u + v <= 1.0)
        t = inv_det * vec.dot(e2, qvec)
        ok &= (t > cfg.t_min) & (t < closest_t)
        upd = leaf_hit & ok

        n_raw = vec.cross(e1, e2)
        inv_len = 1.0 / jnp.where(upd, vec.length(n_raw), 1.0)
        n_unit = vec.scale(n_raw, inv_len)
        if cfg.shading != "fixed_light":
            # compute_dynamic_ray.comp:121-124 flips toward the ray; the
            # C12 kernel keeps the raw winding normal (compute.comp:184).
            flip = vec.dot(ray_d, n_unit) > 0.0
            n_unit = vec.where(flip, vec.scale(n_unit, -1.0), n_unit)

        closest_t = jnp.where(upd, t, closest_t)
        hit_tri = jnp.where(upd, t_idx, hit_tri)
        nx = jnp.where(upd, n_unit[0], nx)
        ny = jnp.where(upd, n_unit[1], ny)
        nz = jnp.where(upd, n_unit[2], nz)

        descend = box_hit & ~is_leaf
        node = jnp.where(in_flight,
                         jnp.where(descend, node + 1, skip), node)
        return node, closest_t, hit_tri, nx, ny, nz

    node, closest_t, hit_tri, nx, ny, nz = jax.lax.while_loop(
        cond, body, (node, closest_t, hit_tri, nx, ny, nz))

    hit = hit_tri >= 0
    m = jnp.take(scene.materials, jnp.where(hit, hit_tri, 0), axis=0)
    return TraversalResult(closest_t, hit, (nx, ny, nz),
                           (m[:, 0], m[:, 1], m[:, 2]), m[:, 3])


class ScatterResult(NamedTuple):
    seed: jnp.ndarray
    new_dir: vec.V3          # normalized
    attenuation: vec.V3      # per-bounce albedo factor
    scattered: jnp.ndarray   # bool: path continues
    emitted: vec.V3          # radiance if path terminated emissive


def scatter(seed, ray_d: vec.V3, normal: vec.V3, albedo: vec.V3, mtype,
            hit, cfg: RenderConfig) -> ScatterResult:
    """Material response (compute_dynamic_ray.comp:132-154 + emissive fix).

    type 0 Lambertian: dir = normal + random_unit_vector (degenerate guard);
    type 1/2 Metal: reflect + fuzz*random_in_sphere, absorbed below horizon;
    type 3 Emissive: terminate emitting albedo (may exceed 1.0);
    unknown: absorb to black.
    """
    is_lam = mtype == 0.0
    is_metal = (mtype == 1.0) | (mtype == 2.0)
    is_emis = mtype == 3.0

    # Both Lambertian and Metal consume exactly one in-sphere draw in the
    # reference (randomUnitVector wraps it; metal always evaluates the fuzz
    # term even at fuzz=0) — one masked draw keeps streams aligned.
    needs_draw = hit & (is_lam | is_metal)
    seed, sph = rng.random_vec3_in_unit_sphere(seed, needs_draw)

    # Lambertian. Zero-length guard: an exhausted (bounded) rejection
    # sample returns (0,0,0) -> unit_sph = 0 -> direction falls back to
    # the surface normal instead of NaN.
    sph_len = vec.length(sph)
    inv_sph = 1.0 / jnp.where(needs_draw & (sph_len > 0.0), sph_len, 1.0)
    unit_sph = vec.scale(sph, inv_sph)
    lam_dir = vec.add(normal, unit_sph)
    lam_degenerate = vec.length(lam_dir) < 1e-4
    lam_dir = vec.where(lam_degenerate, normal, lam_dir)

    # Metal / fuzzy metal.
    fuzz = jnp.where(mtype == 2.0, jnp.float32(cfg.fuzz), 0.0)
    refl = vec.reflect(vec.normalize(ray_d), normal)
    met_dir = vec.add(refl, vec.scale(sph, fuzz))

    raw = vec.where(is_lam, lam_dir, met_dir)
    raw_len = vec.length(raw)
    new_dir = vec.scale(raw, 1.0 / jnp.where(raw_len > 0.0, raw_len, 1.0))

    met_ok = vec.dot(new_dir, normal) > 0.0
    scattered = hit & (is_lam | (is_metal & met_ok))

    emis_active = hit & is_emis if cfg.emissive_emits else \
        jnp.zeros_like(hit)
    zero = jnp.zeros_like(mtype)
    emitted = vec.where(emis_active, albedo, (zero, zero, zero))

    return ScatterResult(seed, new_dir, albedo, scattered, emitted)


def shade(res: TraversalResult, ray_o: vec.V3, ray_d: vec.V3, color: vec.V3,
          atten: vec.V3, seed, alive, sky_on, cfg: RenderConfig):
    """One bounce of shading: sky on miss, scatter / emit / absorb on hit.
    Returns advanced (ray_o, ray_d, color, atten, seed, alive)."""
    hit = alive & res.hit
    miss = alive & ~hit

    sky = sky_color(ray_d)
    zero = jnp.zeros_like(sky[0])
    sky = vec.where(sky_on, sky, (zero, zero, zero))
    color = vec.where(miss, vec.mul(atten, sky), color)

    sc = scatter(seed, ray_d, res.normal, res.mat_albedo, res.mat_type,
                 hit, cfg)
    color = vec.add(color, vec.mul(sc.emitted, atten))
    hit_pos = vec.add(ray_o, vec.scale(ray_d, res.closest_t))
    atten = vec.where(sc.scattered, vec.mul(atten, sc.attenuation), atten)
    ray_o = vec.where(sc.scattered, hit_pos, ray_o)
    ray_d = vec.where(sc.scattered, sc.new_dir, ray_d)
    return ray_o, ray_d, color, atten, sc.seed, sc.scattered


def make_primary_rays(cam: CameraUniforms, cfg: RenderConfig, seed,
                      xx, yy, global_height: int, jitter: bool = True):
    """Jittered camera rays (compute_dynamic_ray.comp:158-173), SoA.

    xx/yy are flat i32 pixel coordinates (yy global when row-sharded).
    ``jitter=False`` reproduces the C12 ray-gen (compute.comp:123-124:
    u = x/w with no AA jitter and no RNG draws)."""
    w = cfg.width
    gh = global_height
    p = xx.shape[0]
    if jitter:
        all_on = jnp.ones((p,), bool)
        seed, ju = rng.random_float(seed, all_on)
        seed, jv = rng.random_float(seed, all_on)
    else:
        ju = jv = jnp.zeros((p,), jnp.float32)
    u = (xx.astype(jnp.float32) + ju) / jnp.float32(w)
    v = ((jnp.float32(gh - 1) - yy.astype(jnp.float32)) + jv) / jnp.float32(gh)

    origin = vec.splat(cam.origin, (p,))
    llc = vec.splat(cam.lower_left_corner, (p,))
    hor = vec.splat(cam.horizontal, (p,))
    ver = vec.splat(cam.vertical, (p,))
    ray_d = vec.normalize(vec.sub(
        vec.add(llc, vec.add(vec.scale(hor, u), vec.scale(ver, v))),
        origin))
    return seed, origin, ray_d


def fixed_light_color(res: TraversalResult) -> vec.V3:
    """C12 shading (shaders/compute.comp:196-204): fixed light direction
    normalize(1,1,1), intensity = max(0, n·l)*0.8 + 0.2, albedo*intensity on
    hit, black background. Expects raw (unflipped) geometric normals, i.e.
    traversal run with cfg.shading == "fixed_light"."""
    inv_sqrt3 = jnp.float32(1.0) / jnp.sqrt(jnp.float32(3.0))
    ndotl = (res.normal[0] + res.normal[1] + res.normal[2]) * inv_sqrt3
    intensity = jnp.maximum(jnp.float32(0.0), ndotl) * 0.8 + 0.2
    zero = jnp.zeros_like(intensity)
    return vec.where(res.hit,
                     vec.scale(res.mat_albedo, intensity),
                     (zero, zero, zero))


def initial_seed(cam: CameraUniforms, cfg: RenderConfig, pixel,
                 sample_index):
    """Reference mode: seed = pixel index (frozen-noise parity with
    compute_dynamic_ray.comp:164). Progressive: mix frame + sample."""
    if cfg.rng_mode == "reference":
        return pixel
    stream = (cam.frame_count.astype(jnp.uint32)
              * jnp.uint32(cfg.samples_per_pixel)
              + jnp.uint32(sample_index) + jnp.uint32(1))
    return pixel ^ rng.pcg(stream * jnp.uint32(0x9E3779B9))


def render_linear(scene: GpuScene, cam: CameraUniforms, cfg: RenderConfig,
                  sample_index: jnp.ndarray | int = 0,
                  y_offset: jnp.ndarray | int = 0,
                  global_height: int | None = None):
    """Trace one sample per pixel -> (linear RGB f32[H,W,3], stats dict).

    ``y_offset``/``global_height`` support row-sharded multi-chip rendering
    (parallel/): cfg.height rows are rendered as the band starting at
    ``y_offset`` of a ``global_height``-row frame, with globally-consistent
    seeds and viewport mapping.
    """
    h, w = cfg.height, cfg.width
    gh = global_height or h
    p = h * w

    yy = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).reshape(p)
          + jnp.int32(y_offset))
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).reshape(p)
    pixel = (yy * w + xx).astype(jnp.uint32)

    seed = initial_seed(cam, cfg, pixel, sample_index)
    alive = jnp.ones((p,), bool)

    if cfg.shading == "fixed_light":
        # C12 tier: one unjittered primary ray, Lambert-with-ambient shade.
        seed, ray_o, ray_d = make_primary_rays(cam, cfg, seed, xx, yy, gh,
                                               jitter=False)
        res = traverse(scene, ray_o, ray_d, alive, cfg)
        color = fixed_light_color(res)
        stats = {"rays_traced": jnp.float32(p), "bounce_iters": jnp.int32(1)}
        image = jnp.stack([c.reshape(h, w) for c in color], axis=-1)
        return image, stats

    seed, ray_o, ray_d = make_primary_rays(cam, cfg, seed, xx, yy, gh)

    zero = jnp.zeros((p,), jnp.float32)
    one = jnp.ones((p,), jnp.float32)
    color = (zero, zero, zero)
    atten = (one, one, one)
    sky_on = cam.sky_enabled > 0

    def bounce_cond(c):
        return (c[6] < cfg.max_bounces) & jnp.any(c[5])

    def bounce_body(c):
        ray_o, ray_d, color, atten, seed, alive, b, rays = c
        rays = rays + jnp.sum(alive.astype(jnp.float32))
        res = traverse(scene, ray_o, ray_d, alive, cfg)
        ray_o, ray_d, color, atten, seed, alive = shade(
            res, ray_o, ray_d, color, atten, seed, alive, sky_on, cfg)
        # Exhausted paths keep color == 0 (the b == MAX-1 kill, :229-231).
        return ray_o, ray_d, color, atten, seed, alive, b + 1, rays

    carry = (ray_o, ray_d, color, atten, seed, alive, jnp.int32(0),
             jnp.float32(0))
    _, _, color, _, _, _, bounces, rays = jax.lax.while_loop(
        bounce_cond, bounce_body, carry)

    stats = {"rays_traced": rays, "bounce_iters": bounces}
    image = jnp.stack([c.reshape(h, w) for c in color], axis=-1)
    return image, stats
