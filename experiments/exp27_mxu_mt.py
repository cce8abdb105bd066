"""exp27: MXU leaf intersection — determinant-identity Moller-Trumbore.

The bounce megakernel is ~74 ms of a ~130 ms 720p flagship frame and its
leaf MT phase is pure VPU work; the TPU's FLOPs live in the MXU. The
scalar-triple-product identities turn the four MT determinants into dot
products against PER-TRIANGLE CONSTANT vectors, i.e. one matmul computes
every (ray, tri) pair's (det, u*det, v*det, t*det):

    pv  = d x e2,  s = o - v0,  q = s x e1          (classic, per PAIR)
    det  = e1.pv = d.(e2 x e1)              = -d.n        n  = e1 x e2
    uDet = s.pv  = (o' x d).e2 + d.(v0' x e2)             o' = o - c
    vDet = d.q   = -(o' x d).e1 - d.(v0' x e1)            v0' = v0 - c
    tDet = e2.q  = o'.n - v0'.n

with c the cluster centroid (recentring bounds the cancellation: the
error in mo = o' x d is ~|o'||d| ulp against a true magnitude ~R|d|, R =
cluster radius — worst case camera-distance primaries ~1e-5 barycentric,
on-surface secondaries ~1e-7; Part A quantifies this against f64 truth).

So per ray the feature vector f = [o'(3), d(3), mo = o' x d (3), 1] is 10
floats, and a leaf of T triangles is a precomputed weight matrix
W [4T, 10→16]: one [4T,16] @ [16,128] matmul per sublane row scores T
triangles against 128 rays — MXU madds replace ~45 VPU madds per pair.
Validity tests + the t-min reduction stay on the VPU but act on [T,128]
blocks (full vreg utilization), and winner attributes (normal / albedo /
material) come back via a second one-hot matmul attrs[8,T] @ ind[T,128]
(PERF_NOTES: one-hot MXU matmul is the sanctioned in-kernel gather).

Variants measured (per-triangle-test throughput at tile [16,128]):
  classic8 — production mt_half structure: 8-tri cluster row DMA'd to
             SMEM, per-tri scalar-broadcast MT (the baseline).
  detT     — T in {32, 64}: fat-leaf det-form with per-sublane-row MXU
             matmuls + one-hot attr recovery.

Part A (any backend): f32 numerics of det-form vs classic vs f64 truth.
Part B (interpret on CPU / compiled on TPU): kernel A/B — correctness
and, on TPU, per-pair timing with salted inputs + forced readback
(memoization rules, PERF_NOTES.md).

Run from the repo root. Reference semantics under test: Moller-Trumbore
with det eps 1e-5 and normal flipped toward the ray
(compute_dynamic_ray.comp:105-129).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DET_EPS = 1e-5
T_MIN = 1e-3
T_MAX = 1e4
SUB = 16
LANES = 128
KFEAT = 16  # feature rows (10 used, padded to a sublane tile)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


# ---------------------------------------------------------------- scenes
def make_cluster(rng, center, radius, t):
    """t triangles with edge ~radius/2 scattered within `radius` of center."""
    v0 = center + rng.uniform(-radius, radius, (t, 3))
    e1 = rng.uniform(-radius, radius, (t, 3)) * 0.5
    e2 = rng.uniform(-radius, radius, (t, 3)) * 0.5
    return v0, v0 + e1, v0 + e2


def make_rays(rng, n, origin_center, origin_spread, aim, aim_spread):
    o = origin_center + rng.uniform(-origin_spread, origin_spread, (n, 3))
    target = aim + rng.uniform(-aim_spread, aim_spread, (n, 3))
    d = target - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


# ------------------------------------------- pairwise MT, both forms
def mt_classic(o, d, v0, v1, v2, dtype):
    """Classic MT over the [R, T] pair grid. Returns (valid, t, u, v)."""
    o = o.astype(dtype)[:, None, :]
    d = d.astype(dtype)[:, None, :]
    v0 = v0.astype(dtype)[None]
    e1 = (v1 - v0[0]).astype(dtype)[None]
    e2 = (v2 - v0[0]).astype(dtype)[None]
    pv = np.cross(d, e2)
    det = np.sum(e1 * pv, axis=-1)
    ok = np.abs(det) >= DET_EPS
    inv = 1.0 / np.where(ok, det, 1.0)
    s = o - v0
    u = inv * np.sum(s * pv, axis=-1)
    q = np.cross(s, e1)
    v = inv * np.sum(d * q, axis=-1)
    t = inv * np.sum(e2 * q, axis=-1)
    valid = ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
    valid &= (t > T_MIN) & (t < T_MAX)
    return valid, t.astype(dtype), u, v


def mt_det(o, d, v0, v1, v2, c):
    """Det-identity MT in f32 over the [R, T] grid (centered at c)."""
    f32 = np.float32
    op = (o - c).astype(f32)
    dd = d.astype(f32)
    mo = np.cross(op, dd).astype(f32)
    v0p = (v0 - c).astype(f32)
    e1 = (v1 - v0).astype(f32)
    e2 = (v2 - v0).astype(f32)
    n = np.cross(e1, e2).astype(f32)
    pu = np.cross(v0p, e2).astype(f32)
    pv1 = np.cross(v0p, e1).astype(f32)
    kt = np.sum(v0p * n, axis=-1).astype(f32)
    dn = dd @ n.T  # [R, T]
    det = -dn
    uDet = mo @ e2.T + dd @ pu.T
    vDet = -(mo @ e1.T) - dd @ pv1.T
    tDet = op @ n.T - kt[None]
    ok = np.abs(det) >= DET_EPS
    inv = 1.0 / np.where(ok, det, 1.0)
    u, v, t = uDet * inv, vDet * inv, tDet * inv
    valid = ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
    valid &= (t > T_MIN) & (t < T_MAX)
    return valid, t.astype(f32), u, v


def part_a():
    log("Part A: det-identity vs classic vs f64 truth")
    rng = np.random.default_rng(7)
    cases = {
        # camera-scale: reference pose distance ~147 from the model
        "camera(|o|~147)": dict(oc=np.array([-25.0, 30.0, 140.0]),
                                osp=1.0, radius=1.0),
        # secondary: origins on/near the surface being retested
        "surface(|o'|~3)": dict(oc=np.array([1.0, 1.0, 2.0]),
                                osp=1.0, radius=1.0),
    }
    for name, cc in cases.items():
        center = np.zeros(3)
        v0, v1, v2 = make_cluster(rng, center, cc["radius"], 512)
        o, d = make_rays(rng, 4096, cc["oc"], cc["osp"], center,
                         cc["radius"])
        val64, t64, _, _ = mt_classic(o, d, v0, v1, v2, np.float64)
        val32, t32, _, _ = mt_classic(o, d, v0, v1, v2, np.float32)
        valD, tD, _, _ = mt_det(o, d, v0, v1, v2, center)
        n_true = int(val64.sum())

        def flips(va, name2):
            fl = int((va ^ val64).sum())
            log(f"  {name:18s} {name2}: hit flips vs f64 = {fl}"
                f" / {n_true} true hits ({fl / max(n_true, 1):.2e})")
            both = va & val64
            return both

        b32 = flips(val32, "classic-f32")
        bD = flips(valD, "det-f32    ")
        e32 = np.max(np.abs(t32[b32] - t64[b32])) if b32.any() else 0.0
        eD = np.max(np.abs(tD[bD] - t64[bD])) if bD.any() else 0.0
        xf = int((valD ^ val32).sum())
        log(f"  {name:18s} max|dt| classic {e32:.2e}  det {eD:.2e}; "
            f"det-vs-classic flips {xf}")


# ------------------------------------------------------- Pallas kernels
def classic8_kernel(cl_ref, rox, roy, roz, rdx, rdy, rdz,
                    t_o, nx_o, ar_o, mt_o, crow_s, sem, *, visits):
    """Production-shaped leaf loop: per visit DMA one 8x16 cluster row to
    SMEM, scalar-broadcast MT per triangle (kernels/pallas_mega.mt_half
    with hit mask = all-true)."""
    shape = rox[:].shape
    t_o[:] = jnp.full(shape, T_MAX, jnp.float32)
    nx_o[:] = jnp.zeros(shape, jnp.float32)
    ar_o[:] = jnp.zeros(shape, jnp.float32)
    mt_o[:] = jnp.zeros(shape, jnp.float32)
    ox, oy, oz = rox[:], roy[:], roz[:]
    dx, dy, dz = rdx[:], rdy[:], rdz[:]
    n_cl = cl_ref.shape[0]

    def body(vis, _):
        cid = jax.lax.rem(vis, n_cl)
        cp = pltpu.make_async_copy(cl_ref.at[cid], crow_s, sem)
        cp.start()
        cp.wait()
        cl = t_o[:]
        nx, ar, mt = nx_o[:], ar_o[:], mt_o[:]
        for k in range(8):
            b = k * 16
            s = lambda j, b=b: crow_s[b + j]
            v0x, v0y, v0z = s(0), s(1), s(2)
            e1x, e1y, e1z = s(3), s(4), s(5)
            e2x, e2y, e2z = s(6), s(7), s(8)
            nux = s(13)
            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            ok = ~((det > -DET_EPS) & (det < DET_EPS))
            invd = 1.0 / jnp.where(ok, det, 1.0)
            sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
            u = invd * (sx * pvx + sy * pvy + sz * pvz)
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            v = invd * (dx * qx + dy * qy + dz * qz)
            tt = invd * (e2x * qx + e2y * qy + e2z * qz)
            ok &= (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
            ok &= (tt > T_MIN) & (tt < cl)
            cl = jnp.where(ok, tt, cl)
            nx = jnp.where(ok, nux, nx)
            ar = jnp.where(ok, s(9), ar)
            mt = jnp.where(ok, s(12), mt)
        t_o[:] = cl
        nx_o[:], ar_o[:], mt_o[:] = nx, ar, mt
        return 0

    jax.lax.fori_loop(0, visits, body, 0)


def det_kernel(w_ref, a_ref, cen_ref, rox, roy, roz, rdx, rdy, rdz,
               t_o, nx_o, ar_o, mt_o, w_s, a_s, fbuf, sem, asem,
               *, visits, t_tris):
    """Fat-leaf det-form: per visit one [4T,16] weight DMA, then per
    sublane row s an MXU matmul [4T,16]@[16,128] -> contiguous blocks
    (dn | uDet | vDet | tNum), VPU tests on [T,128], one-hot attr matmul
    [8,T]@[T,128]."""
    shape = rox[:].shape
    t_o[:] = jnp.full(shape, T_MAX, jnp.float32)
    nx_o[:] = jnp.zeros(shape, jnp.float32)
    ar_o[:] = jnp.zeros(shape, jnp.float32)
    mt_o[:] = jnp.zeros(shape, jnp.float32)
    fbuf[:] = jnp.zeros_like(fbuf[:])
    fbuf[9] = jnp.ones((LANES,), jnp.float32)
    n_cl = w_ref.shape[0]
    dx, dy, dz = rdx[:], rdy[:], rdz[:]

    def body(vis, _):
        cid = jax.lax.rem(vis, n_cl)
        cw = pltpu.make_async_copy(w_ref.at[cid], w_s, sem)
        cw.start()
        ca = pltpu.make_async_copy(a_ref.at[cid], a_s, asem)
        ca.start()
        opx = rox[:] - cen_ref[cid, 0]
        opy = roy[:] - cen_ref[cid, 1]
        opz = roz[:] - cen_ref[cid, 2]
        mox = opy * dz - opz * dy
        moy = opz * dx - opx * dz
        moz = opx * dy - opy * dx
        cw.wait()
        ca.wait()
        w = w_s[:]
        at = a_s[:]
        for srow in range(SUB):
            sl = slice(srow, srow + 1)
            fbuf[0] = opx[srow]
            fbuf[1] = opy[srow]
            fbuf[2] = opz[srow]
            fbuf[3] = dx[srow]
            fbuf[4] = dy[srow]
            fbuf[5] = dz[srow]
            fbuf[6] = mox[srow]
            fbuf[7] = moy[srow]
            fbuf[8] = moz[srow]
            g = jnp.dot(w, fbuf[:], preferred_element_type=jnp.float32)
            dn = g[0:t_tris]
            ud = g[t_tris:2 * t_tris]
            vd = g[2 * t_tris:3 * t_tris]
            tn = g[3 * t_tris:4 * t_tris]
            absd = jnp.abs(dn)
            sgn = jnp.where(dn < 0.0, 1.0, -1.0)  # sign(det), det = -dn
            uu = ud * sgn
            vv = vd * sgn
            tt = tn * sgn
            closest = t_o[sl]
            valid = (absd >= DET_EPS) & (uu >= 0.0) & (vv >= 0.0)
            valid &= (uu + vv <= absd)
            valid &= (tt > T_MIN * absd) & (tt < closest * absd)
            rec = 1.0 / jnp.where(absd > 0.0, absd, 1.0)
            tval = tt * rec
            score = jnp.where(valid, tval, T_MAX)
            best = jnp.min(score, axis=0, keepdims=True)
            hit_row = best < closest
            ind = jnp.where((score == best) & valid,
                            jnp.ones_like(score), jnp.zeros_like(score))
            att = jnp.dot(at, ind, preferred_element_type=jnp.float32)
            cnt = att[0:1]
            inv = 1.0 / jnp.where(cnt > 0.0, cnt, 1.0)
            t_o[sl] = jnp.where(hit_row, best, closest)
            nx_o[sl] = jnp.where(hit_row, att[1:2] * inv, nx_o[sl])
            ar_o[sl] = jnp.where(hit_row, att[4:5] * inv, ar_o[sl])
            mt_o[sl] = jnp.where(hit_row, att[7:8] * inv, mt_o[sl])
        return 0

    jax.lax.fori_loop(0, visits, body, 0)


def det_wide_kernel(w_ref, a_ref, cen_ref, rox, roy, roz, rdx, rdy, rdz,
                    t_o, nx_o, ar_o, mt_o, w_s, a_s, fbig, sem, asem,
                    *, visits, t_tris):
    """det32w: ONE [4T,16] @ [16, SUB*128] matmul per visit (rays of all
    sublane rows concatenated along lanes) — amortizes per-matmul
    overhead at the cost of ~96 row moves per visit building the rhs."""
    shape = rox[:].shape
    wide = SUB * LANES
    t_o[:] = jnp.full(shape, T_MAX, jnp.float32)
    nx_o[:] = jnp.zeros(shape, jnp.float32)
    ar_o[:] = jnp.zeros(shape, jnp.float32)
    mt_o[:] = jnp.zeros(shape, jnp.float32)
    fbig[:] = jnp.zeros_like(fbig[:])
    fbig[9] = jnp.ones((wide,), jnp.float32)
    dx, dy, dz = rdx[:], rdy[:], rdz[:]
    for srow in range(SUB):
        sl = slice(srow * LANES, (srow + 1) * LANES)
        fbig[3, sl] = dx[srow]
        fbig[4, sl] = dy[srow]
        fbig[5, sl] = dz[srow]
    n_cl = w_ref.shape[0]

    def body(vis, _):
        cid = jax.lax.rem(vis, n_cl)
        cw = pltpu.make_async_copy(w_ref.at[cid], w_s, sem)
        cw.start()
        ca = pltpu.make_async_copy(a_ref.at[cid], a_s, asem)
        ca.start()
        opx = rox[:] - cen_ref[cid, 0]
        opy = roy[:] - cen_ref[cid, 1]
        opz = roz[:] - cen_ref[cid, 2]
        mox = opy * dz - opz * dy
        moy = opz * dx - opx * dz
        moz = opx * dy - opy * dx
        for srow in range(SUB):
            sl = slice(srow * LANES, (srow + 1) * LANES)
            fbig[0, sl] = opx[srow]
            fbig[1, sl] = opy[srow]
            fbig[2, sl] = opz[srow]
            fbig[6, sl] = mox[srow]
            fbig[7, sl] = moy[srow]
            fbig[8, sl] = moz[srow]
        cw.wait()
        ca.wait()
        g = jnp.dot(w_s[:], fbig[:], preferred_element_type=jnp.float32)
        dn = g[0:t_tris]
        ud = g[t_tris:2 * t_tris]
        vd = g[2 * t_tris:3 * t_tris]
        tn = g[3 * t_tris:4 * t_tris]
        absd = jnp.abs(dn)
        sgn = jnp.where(dn < 0.0, 1.0, -1.0)
        uu = ud * sgn
        vv = vd * sgn
        tt = tn * sgn
        # closest in the wide layout
        closest = jnp.concatenate([t_o[srow:srow + 1] for srow in
                                   range(SUB)], axis=1)
        valid = (absd >= DET_EPS) & (uu >= 0.0) & (vv >= 0.0)
        valid &= (uu + vv <= absd)
        valid &= (tt > T_MIN * absd) & (tt < closest * absd)
        rec = 1.0 / jnp.where(absd > 0.0, absd, 1.0)
        tval = tt * rec
        score = jnp.where(valid, tval, T_MAX)
        best = jnp.min(score, axis=0, keepdims=True)
        hit_row = best < closest
        ind = jnp.where((score == best) & valid,
                        jnp.ones_like(score), jnp.zeros_like(score))
        att = jnp.dot(a_s[:], ind, preferred_element_type=jnp.float32)
        cnt = att[0:1]
        inv = 1.0 / jnp.where(cnt > 0.0, cnt, 1.0)
        nbest = jnp.where(hit_row, best, closest)
        nxr = att[1:2] * inv
        arr = att[4:5] * inv
        mtr = att[7:8] * inv
        for srow in range(SUB):
            sl = slice(srow * LANES, (srow + 1) * LANES)
            hr = hit_row[0, sl]
            t_o[srow] = nbest[0, sl]
            nx_o[srow] = jnp.where(hr, nxr[0, sl], nx_o[srow])
            ar_o[srow] = jnp.where(hr, arr[0, sl], ar_o[srow])
            mt_o[srow] = jnp.where(hr, mtr[0, sl], mt_o[srow])
        return 0

    jax.lax.fori_loop(0, visits, body, 0)


def run_det_wide(W, A, C, rays, visits, t_tris, interpret):
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((SUB, LANES), jnp.float32)
    fn = pl.pallas_call(
        functools.partial(det_wide_kernel, visits=visits, t_tris=t_tris),
        in_specs=[spec, spec, pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [spec] * 6,
        out_shape=(out,) * 4,
        out_specs=(spec,) * 4,
        scratch_shapes=[pltpu.VMEM((4 * t_tris, KFEAT), jnp.float32),
                        pltpu.VMEM((8, t_tris), jnp.float32),
                        pltpu.VMEM((KFEAT, SUB * LANES), jnp.float32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
        interpret=interpret)
    return fn(W, A, C, *rays)


def pack_classic_clusters(v0, v1, v2, alb, mt):
    """[L, 128] rows in the production record layout (fast_types)."""
    t = v0.shape[0]
    rows = np.zeros((t // 8, 128), np.float32)
    e1, e2 = v1 - v0, v2 - v0
    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-30)
    for i in range(t):
        r, k = divmod(i, 8)
        rows[r, k * 16:k * 16 + 16] = np.concatenate(
            [v0[i], e1[i], e2[i], alb[i], [mt[i]], n[i]])
    return rows


def pack_det_clusters(v0, v1, v2, alb, mt, t_tris):
    """W [L, 4T, KFEAT], attrs [L, 8, T], centers [L, 4]."""
    tt = v0.shape[0]
    n_cl = tt // t_tris
    W = np.zeros((n_cl, 4 * t_tris, KFEAT), np.float32)
    A = np.zeros((n_cl, 8, t_tris), np.float32)
    C = np.zeros((n_cl, 4), np.float32)
    for ci in range(n_cl):
        s0 = ci * t_tris
        v0c = v0[s0:s0 + t_tris]
        e1 = v1[s0:s0 + t_tris] - v0c
        e2 = v2[s0:s0 + t_tris] - v0c
        c = 0.5 * (v0c.min(0) + v0c.max(0))
        C[ci, :3] = c
        v0p = v0c - c
        n = np.cross(e1, e2)
        pu = np.cross(v0p, e2)
        pv1 = np.cross(v0p, e1)
        kt = np.sum(v0p * n, axis=1)
        # feature layout: [o'(0:3), d(3:6), mo(6:9), 1(9)]
        W[ci, 0:t_tris, 3:6] = n                    # dn = d.n
        W[ci, t_tris:2 * t_tris, 6:9] = e2          # uDet = mo.e2 + d.pu
        W[ci, t_tris:2 * t_tris, 3:6] = pu
        W[ci, 2 * t_tris:3 * t_tris, 6:9] = -e1     # vDet = -mo.e1 - d.pv1
        W[ci, 2 * t_tris:3 * t_tris, 3:6] = -pv1
        W[ci, 3 * t_tris:4 * t_tris, 0:3] = n       # tNum = o'.n - kt
        W[ci, 3 * t_tris:4 * t_tris, 9] = -kt
        nu = n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True),
                            1e-30)
        A[ci, 0] = 1.0
        A[ci, 1:4] = nu.T
        A[ci, 4:7] = alb[s0:s0 + t_tris].T
        A[ci, 7] = mt[s0:s0 + t_tris]
    return W, A, C


def run_classic(cl_rows, rays, visits, interpret):
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((SUB, LANES), jnp.float32)
    fn = pl.pallas_call(
        functools.partial(classic8_kernel, visits=visits),
        in_specs=[spec] * 7,
        out_shape=(out,) * 4,
        out_specs=(spec,) * 4,
        scratch_shapes=[pltpu.SMEM((128,), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret)
    return fn(cl_rows, *rays)


def run_det(W, A, C, rays, visits, t_tris, interpret):
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((SUB, LANES), jnp.float32)
    fn = pl.pallas_call(
        functools.partial(det_kernel, visits=visits, t_tris=t_tris),
        in_specs=[spec, spec, pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [spec] * 6,
        out_shape=(out,) * 4,
        out_specs=(spec,) * 4,
        scratch_shapes=[pltpu.VMEM((4 * t_tris, KFEAT), jnp.float32),
                        pltpu.VMEM((8, t_tris), jnp.float32),
                        pltpu.VMEM((KFEAT, LANES), jnp.float32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
        interpret=interpret)
    return fn(W, A, C, *rays)


def part_b(interpret):
    log(f"Part B: kernel A/B (interpret={interpret})")
    rng = np.random.default_rng(11)
    n_tris = 512  # 64 classic clusters / 16 det32 / 8 det64
    center = np.zeros(3)
    v0, v1, v2 = make_cluster(rng, center, 2.0, n_tris)
    alb = rng.uniform(0.1, 1.0, (n_tris, 3)).astype(np.float32)
    mt = rng.integers(0, 3, n_tris).astype(np.float32)
    o, d = make_rays(rng, SUB * LANES, np.array([-25.0, 30.0, 140.0]),
                     1.0, center, 2.0)
    rays = tuple(jnp.asarray(x.reshape(SUB, LANES).astype(np.float32))
                 for x in (o[:, 0], o[:, 1], o[:, 2],
                           d[:, 0], d[:, 1], d[:, 2]))
    cl_rows = jnp.asarray(pack_classic_clusters(v0, v1, v2, alb, mt))

    # one full pass over all triangles per variant
    res = {}
    tc0 = time.time()
    res["classic8"] = [np.asarray(x) for x in
                       run_classic(cl_rows, rays, n_tris // 8, interpret)]
    log(f"  classic8 ran ({time.time() - tc0:.1f}s incl. compile)")
    for t_tris in (32, 64):
        W, A, C = pack_det_clusters(v0, v1, v2, alb, mt, t_tris)
        tc0 = time.time()
        res[f"det{t_tris}"] = [np.asarray(x) for x in run_det(
            jnp.asarray(W), jnp.asarray(A), jnp.asarray(C), rays,
            n_tris // t_tris, t_tris, interpret)]
        log(f"  det{t_tris} ran ({time.time() - tc0:.1f}s incl. compile)")
    W, A, C = pack_det_clusters(v0, v1, v2, alb, mt, 32)
    tc0 = time.time()
    res["det32w"] = [np.asarray(x) for x in run_det_wide(
        jnp.asarray(W), jnp.asarray(A), jnp.asarray(C), rays,
        n_tris // 32, 32, interpret)]
    log(f"  det32w ran ({time.time() - tc0:.1f}s incl. compile)")

    ref_t = res["classic8"][0]
    hit = ref_t < T_MAX
    log(f"  classic8 hits: {int(hit.sum())}/{hit.size}")
    for name in ("det32", "det64", "det32w"):
        tt = res[name][0]
        flips = int(((tt < T_MAX) ^ hit).sum())
        both = (tt < T_MAX) & hit
        dt = float(np.max(np.abs(tt[both] - ref_t[both]))) if both.any() \
            else 0.0
        # attr agreement on agreed hits (winner may differ on t-ties)
        d_ar = float(np.max(np.abs(res[name][2][both]
                                   - res["classic8"][2][both]))) \
            if both.any() else 0.0
        log(f"  {name}: hit flips vs classic {flips}, max|dt| {dt:.2e}, "
            f"max|d albedo.r| {d_ar:.2e}")
    return rays, cl_rows, (v0, v1, v2, alb, mt)


def time_variants(rays, cl_rows, tris):
    """TPU timing: V visits per call, salted rays per rep, forced
    readback (memoization rules)."""
    v0, v1, v2, alb, mt = tris
    n_tris = v0.shape[0]
    reps, visits_mult = 6, 8  # visits = visits_mult * full passes
    log(f"Part C: timing ({reps} reps, {visits_mult} passes/call)")
    results = {}

    def bench(name, fn):
        ts = []
        for r in range(reps):
            salt = jnp.float32(1e-6 * r)
            rr = tuple(x + salt for x in rays)
            t0 = time.time()
            out = fn(rr)
            _ = float(np.asarray(out[0]).sum())
            ts.append(time.time() - t0)
        best = min(ts[1:])
        pair_tests = SUB * LANES * n_tris * visits_mult
        results[name] = best
        log(f"  {name:10s} best {best * 1e3:8.3f} ms  "
            f"{pair_tests / best / 1e9:7.2f} Gpairs/s "
            f"(first {ts[0] * 1e3:.1f} ms)")

    bench("classic8", lambda rr: run_classic(
        cl_rows, rr, visits_mult * n_tris // 8, False))
    for t_tris in (32, 64):
        W, A, C = pack_det_clusters(v0, v1, v2, alb, mt, t_tris)
        Wj, Aj, Cj = jnp.asarray(W), jnp.asarray(A), jnp.asarray(C)
        bench(f"det{t_tris}", lambda rr, t=t_tris, Wj=Wj, Aj=Aj, Cj=Cj:
              run_det(Wj, Aj, Cj, rr, visits_mult * n_tris // t, t, False))
        if t_tris == 32:
            bench("det32w", lambda rr, Wj=Wj, Aj=Aj, Cj=Cj: run_det_wide(
                Wj, Aj, Cj, rr, visits_mult * n_tris // 32, 32, False))
    return results


def main():
    force_cpu = os.environ.get("EXP27_CPU", "0") == "1"
    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    dev = jax.devices()[0]
    log(f"device: {dev}")
    on_tpu = dev.platform != "cpu"
    part_a()
    rays, cl_rows, tris = part_b(interpret=not on_tpu)
    if on_tpu:
        time_variants(rays, cl_rows, tris)


if __name__ == "__main__":
    main()
