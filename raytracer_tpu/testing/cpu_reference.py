"""Scalar CPU oracle: a literal per-pixel transliteration of the GLSL kernel.

This is the test backend ("fake GPU") for kernel parity: it walks the
flattened BVH with an explicit stack using the *reference* node encoding
(data/count, ``bvh/BVHFlattener.java:73-86``) and reproduces
``shaders/compute_dynamic_ray.comp`` control flow per pixel in float32
NumPy, including the RNG stream quirks. The vectorized TPU tracer must
match it within 1e-5 per channel (tests/test_parity.py) — far inside the
1e-3 acceptance budget against the real GPU.

Intentionally slow (pure Python loops); only use on tiny images.
"""

from __future__ import annotations

import numpy as np

F = np.float32
U = np.uint32

T_MIN = F(0.001)
T_MAX = F(10000.0)


class Pcg:
    """Per-pixel RNG state (compute_dynamic_ray.comp:50-74)."""

    def __init__(self, seed: int):
        self.seed = U(seed)

    def _pcg(self, v: np.uint32) -> np.uint32:
        with np.errstate(over="ignore"):
            state = U(v * U(747796405) + U(2891336453))
            word = U(((state >> U((state >> U(28)) + U(4))) ^ state)
                     * U(277803737))
            return U((word >> U(22)) ^ word)

    def random_float(self) -> np.float32:
        self.seed = self._pcg(self.seed)
        return F(F(self.seed) / F(4294967295.0))

    def random_vec3_in_unit_sphere(self) -> np.ndarray:
        # Bounded at the same REJECTION_ROUNDS as the vectorized kernels
        # (kernels/rng.py) with the same zero-vector fallback, so the seed
        # stream and the drawn direction stay exactly aligned even on the
        # ~2e-8-per-draw exhaustion path (ADVICE r2).
        from raytracer_tpu.kernels.rng import REJECTION_ROUNDS

        _ = np.array([self.random_float(), self.random_float(),
                      self.random_float()], F) * F(2.0) - F(1.0)  # discarded
        for _round in range(REJECTION_ROUNDS):
            p = np.array([self.random_float(), self.random_float(),
                          self.random_float()], F) * F(2.0) - F(1.0)
            if p @ p < 1.0:
                return p
        return np.zeros(3, F)  # exhausted: kernels fall back the same way

    def random_unit_vector(self) -> np.ndarray:
        p = self.random_vec3_in_unit_sphere()
        n = F(np.sqrt(p @ p))
        if n == 0.0:  # exhausted rejection sampling (see above)
            return p
        return p / n


def _normalize(v):
    return (v / F(np.sqrt(v @ v))).astype(F)


def _sky(d):
    unit = _normalize(d)
    t = F(0.5) * (unit[1] + F(1.0))
    return ((F(1.0) - t) * np.ones(3, F)
            + t * np.array([0.5, 0.7, 1.0], F)).astype(F)


def _hit_aabb(o, inv_d, bmin, bmax, t_min, t_max):
    t0s = (bmin - o) * inv_d
    t1s = (bmax - o) * inv_d
    tmin = np.minimum(t0s, t1s)
    tmax = np.maximum(t0s, t1s)
    t_enter = max(tmin[0], tmin[1], tmin[2])
    t_exit = min(tmax[0], tmax[1], tmax[2])
    return t_exit > t_enter and t_exit > t_min and t_enter < t_max


def _hit_triangle(o, d, v0, v1, v2, closest_t, flip_normal=True):
    """Returns (hit, t, normal) — compute_dynamic_ray.comp:105-129.
    ``flip_normal=False`` reproduces the C12 kernel, which records the raw
    winding normal (compute.comp:182-184)."""
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = np.cross(d, e2).astype(F)
    det = F(e1 @ pvec)
    if -1e-5 < det < 1e-5:
        return False, closest_t, None
    inv_det = F(1.0) / det
    s = (o - v0).astype(F)
    u = inv_det * F(s @ pvec)
    if u < 0.0 or u > 1.0:
        return False, closest_t, None
    qvec = np.cross(s, e1).astype(F)
    v = inv_det * F(d @ qvec)
    if v < 0.0 or (u + v) > 1.0:
        return False, closest_t, None
    t = inv_det * F(e2 @ qvec)
    if t > T_MIN and t < closest_t:
        n = _normalize(np.cross(e1, e2).astype(F))
        if flip_normal and d @ n > 0.0:
            n = -n
        return True, F(t), n
    return False, closest_t, None


def _traverse(scene_np, o, d, flip_normal=True):
    """Stack-based walk using the reference data/count encoding."""
    inv_d = (F(1.0) / d).astype(F)
    closest_t = T_MAX
    hit_tri = -1
    normal = None
    stack = [0]
    while stack:
        ni = stack.pop()
        bmin = scene_np["node_min"][ni]
        bmax = scene_np["node_max"][ni]
        if not _hit_aabb(o, inv_d, bmin, bmax, T_MIN, closest_t):
            continue
        data = scene_np["node_data"][ni]
        count = scene_np["node_count"][ni]
        if count < 0:  # leaf
            tri = -(int(data) + 1)
            v0, v1, v2 = scene_np["tri_verts"][tri]
            hit, closest_t, n = _hit_triangle(o, d, v0, v1, v2, closest_t,
                                              flip_normal=flip_normal)
            if hit:
                hit_tri = tri
                normal = n
        else:
            stack.append(int(count))  # right
            stack.append(int(data))   # left  (popped first)
    return closest_t, hit_tri, normal


def render_pixel(scene_np, cam, x, y, width, height, seed,
                 max_bounces=10, fuzz=0.3, sky_enabled=True,
                 emissive_emits=True):
    """Trace one pixel, GLSL main() transliterated
    (compute_dynamic_ray.comp:158-232)."""
    rng = Pcg(seed)
    u = F((F(x) + rng.random_float()) / F(width))
    v = F((F(height - 1 - y) + rng.random_float()) / F(height))

    o = np.asarray(cam["origin"], F)
    d = _normalize(np.asarray(cam["lower_left_corner"], F)
                   + u * np.asarray(cam["horizontal"], F)
                   + v * np.asarray(cam["vertical"], F) - o)

    final_color = np.zeros(3, F)
    atten = np.ones(3, F)

    for b in range(max_bounces):
        closest_t, hit_tri, normal = _traverse(scene_np, o, d)
        if hit_tri == -1:
            sky = _sky(d) if sky_enabled else np.zeros(3, F)
            final_color = atten * sky
            break

        mat = scene_np["materials"][hit_tri]
        albedo = mat[0:3].astype(F)
        mtype = float(mat[3])
        hit_pos = (o + d * closest_t).astype(F)

        if mtype == 0.0:  # Lambertian
            sdir = (normal + rng.random_unit_vector()).astype(F)
            if np.sqrt(sdir @ sdir) < 1e-4:
                sdir = normal
            o, d = hit_pos, _normalize(sdir)
            atten = (atten * albedo).astype(F)
        elif mtype in (1.0, 2.0):  # Metal / Fuzzy Metal
            fz = F(fuzz) if mtype == 2.0 else F(0.0)
            refl = _normalize(d) - F(2.0) * F(_normalize(d) @ normal) * normal
            sdir = _normalize(refl + fz * rng.random_vec3_in_unit_sphere())
            if sdir @ normal > 0.0:
                o, d = hit_pos, sdir
                atten = (atten * albedo).astype(F)
            else:
                return np.zeros(3, F)
        elif mtype == 3.0 and emissive_emits:  # Emissive (intended surface)
            return (atten * albedo).astype(F)
        else:  # unknown / emissive in reference-parity mode: absorb
            return np.zeros(3, F)
    else:
        final_color = np.zeros(3, F)  # bounce-limit kill

    return final_color


def render_pixel_fixed_light(scene_np, cam, x, y, width, height):
    """C12 oracle (shaders/compute.comp:114-207): unjittered ray from the
    camera uniforms, one traversal, fixed-light Lambert shading
    (light dir normalize(1,1,1), max(0,n·l)*0.8+0.2), black background."""
    u = F(F(x) / F(width))
    v = F(F(height - 1 - y) / F(height))
    o = np.asarray(cam["origin"], F)
    d = _normalize(np.asarray(cam["lower_left_corner"], F)
                   + u * np.asarray(cam["horizontal"], F)
                   + v * np.asarray(cam["vertical"], F) - o)
    closest_t, hit_tri, normal = _traverse(scene_np, o, d,
                                           flip_normal=False)
    if hit_tri == -1:
        return np.zeros(3, F)
    albedo = scene_np["materials"][hit_tri][0:3].astype(F)
    light_dir = _normalize(np.ones(3, F))
    intensity = F(max(0.0, float(normal @ light_dir)) * 0.8 + 0.2)
    return (albedo * intensity).astype(F)


def render_image_fixed_light(scene_np, cam, width, height):
    img = np.zeros((height, width, 3), F)
    for y in range(height):
        for x in range(width):
            img[y, x] = render_pixel_fixed_light(scene_np, cam, x, y,
                                                 width, height)
    return img


def render_image(scene_np, cam, width, height, max_bounces=10,
                 sky_enabled=True, emissive_emits=True, frame_seed=None):
    """Render a whole (tiny) frame. ``frame_seed(x, y) -> int`` overrides
    the reference's seed = pixel index."""
    img = np.zeros((height, width, 3), F)
    for y in range(height):
        for x in range(width):
            seed = (y * width + x) if frame_seed is None else frame_seed(x, y)
            img[y, x] = render_pixel(
                scene_np, cam, x, y, width, height, seed,
                max_bounces=max_bounces, sky_enabled=sky_enabled,
                emissive_emits=emissive_emits)
    return img


def scene_to_numpy(scene) -> dict:
    """GpuScene pytree -> plain NumPy dict for the oracle."""
    import numpy as _np
    return {
        "node_min": _np.asarray(scene.bvh.node_min),
        "node_max": _np.asarray(scene.bvh.node_max),
        "node_data": _np.asarray(scene.bvh.node_data),
        "node_count": _np.asarray(scene.bvh.node_count),
        "tri_verts": _np.asarray(scene.tri_verts),
        "materials": _np.asarray(scene.materials),
    }
