"""Sorted-wavefront bounce rounds (kernels/wavefront.py).

The wavefront path reorders rays every round; because RNG streams are
carried per-ray state and closest-hit uses strict comparisons, its output
must match the XLA megakernel bit-for-bit-ish (float precision) through the
full pallas-b0 render path.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from raytracer_tpu.core.camera import Camera
from raytracer_tpu.core.types import RenderConfig
from raytracer_tpu.scene.builder import build_fast_scene_from_arrays
from raytracer_tpu.utils import assets


@pytest.fixture(scope="module")
def small_scene():
    cube = assets.make_cube() * 4.0 + np.array([0, -6, 0], np.float32)
    metal = assets.make_cube() * 3.0 + np.array([9, -7, 2], np.float32)
    plane = (assets.make_ground_plane() * np.array([150, 1, 150], np.float32)
             + np.array([0, -10, 0], np.float32))
    verts = np.concatenate([plane, cube, metal]).astype(np.float32)
    mats = np.zeros((verts.shape[0], 4), np.float32)
    mats[:, 0:3] = (0.7, 0.5, 0.4)
    mats[2 + cube.shape[0]:, 3] = 1.0  # metal cube
    return build_fast_scene_from_arrays(verts, mats)


def _render(scene, b0, bounce_path, monkeypatch, w=128, h=128, bounces=6):
    """Full packet-path frame with the given bounce-0/bounce engine."""
    from raytracer_tpu.kernels.packet import render_linear_fast

    monkeypatch.setenv("RAYTPU_B0", b0)
    monkeypatch.setenv("RAYTPU_BOUNCE", bounce_path)
    cfg = RenderConfig(width=w, height=h, max_bounces=bounces,
                       kernel="packet")
    cam = Camera(origin=(-10.0, 6.0, 30.0), look_at=(0.0, -6.0, 0.0),
                 vfov_deg=40.0, aspect_ratio=w / h)
    img, stats = jax.jit(
        lambda s, u: render_linear_fast(s, u, cfg))(scene, cam.uniforms())
    return np.asarray(img), float(stats["rays_traced"])


def test_wavefront_matches_megakernel(small_scene, monkeypatch):
    """256x128 = 32768 rays -> two width levels (32768, 16384): exercises
    rounds, the shrink slice, and tail deposits."""
    ref, rays_ref = _render(small_scene, "pallas", "mega", monkeypatch,
                            w=256, h=128)
    wave, rays_wave = _render(small_scene, "pallas", "wave", monkeypatch,
                              w=256, h=128)
    np.testing.assert_allclose(wave, ref, atol=2e-5)
    assert rays_wave == rays_ref


def test_wavefront_single_level(small_scene, monkeypatch):
    """128x128 = 16384 rays = MIN_WIDTH: single level, no shrink."""
    ref, _ = _render(small_scene, "pallas", "mega", monkeypatch,
                     w=128, h=128, bounces=4)
    wave, _ = _render(small_scene, "pallas", "wave", monkeypatch,
                      w=128, h=128, bounces=4)
    np.testing.assert_allclose(wave, ref, atol=2e-5)


def test_bounce_megakernel_matches_wavefront(small_scene, monkeypatch):
    """RAYTPU_BOUNCE=pmega (whole bounce chain in one Pallas call,
    kernels/pallas_mega.py) must match the wavefront rounds: identical
    per-ray RNG streams (the in-sphere sampler is bounded at
    REJECTION_ROUNDS on both sides), deposits differ only in fp add
    order."""
    ref, rays_ref = _render(small_scene, "pallas", "wave", monkeypatch,
                            w=128, h=64, bounces=4)
    got, rays_got = _render(small_scene, "pallas", "pmega", monkeypatch,
                            w=128, h=64, bounces=4)
    np.testing.assert_allclose(got, ref, atol=2e-5)
    assert rays_got == rays_ref


def test_pwave_b0_matches_megakernel(small_scene, monkeypatch):
    """RAYTPU_B0=pwave routes bounce 0 through the fused rounds (raygen ->
    sorted fused walk+shade from the first bounce). Identical RNG streams
    and strict closest-t => same image as the XLA megakernel."""
    ref, rays_ref = _render(small_scene, "mega", "mega", monkeypatch,
                            w=128, h=64, bounces=4)
    got, rays_got = _render(small_scene, "pwave", "wave", monkeypatch,
                            w=128, h=64, bounces=4)
    np.testing.assert_allclose(got, ref, atol=2e-5)
    assert rays_got == rays_ref


def test_multi_bounce_fused_round_matches(small_scene, monkeypatch):
    """RAYTPU_WAVE_BCAP=3: sort once per 3 bounces, bounce in-kernel.
    Per-ray RNG streams and strict closest-t make the image identical to
    1-bounce rounds (sorting only changes layout); the kernel's per-lane
    counts keep rays_traced exact across the uneven last round (4 = 3+1)."""
    from raytracer_tpu.kernels import wavefront

    ref, rays_ref = _render(small_scene, "pallas", "wave", monkeypatch,
                            w=128, h=64, bounces=4)
    monkeypatch.setattr(wavefront, "WAVE_BCAP", 3)
    got, rays_got = _render(small_scene, "pallas", "wave", monkeypatch,
                            w=128, h=64, bounces=4)
    np.testing.assert_allclose(got, ref, atol=2e-5)
    assert rays_got == rays_ref


def test_fused_round_matches_split(small_scene, monkeypatch):
    """The fused trace+shade round (one Pallas call per round,
    kernels/pallas_mega.bounce_megakernel at bcap=1) must match the split
    round (pallas traverse + XLA shade): same RNG streams draw for draw,
    same closest-hit, deposits differ only in fp add order."""
    monkeypatch.setenv("RAYTPU_WAVE", "split")
    ref, rays_ref = _render(small_scene, "pallas", "wave", monkeypatch,
                            w=128, h=64, bounces=4)
    monkeypatch.setenv("RAYTPU_WAVE", "fused")
    got, rays_got = _render(small_scene, "pallas", "wave", monkeypatch,
                            w=128, h=64, bounces=4)
    np.testing.assert_allclose(got, ref, atol=2e-5)
    assert rays_got == rays_ref


def test_packed_rounds_match_flat(small_scene, monkeypatch):
    """The packed-state A/B engine (_wavefront_packed — ray state carried
    as two packed arrays, one gather per round; frame-level regression on
    TPU, kept for re-evaluation) must be BIT-identical to the default
    flat-SoA fused path: same kernel core, same sort keys and argsort
    order, only the XLA plumbing differs."""
    monkeypatch.setenv("RAYTPU_WAVE", "fused")
    ref, rays_ref = _render(small_scene, "pallas", "wave", monkeypatch,
                            w=256, h=128, bounces=5)
    monkeypatch.setenv("RAYTPU_WAVE", "fused_packed")
    got, rays_got = _render(small_scene, "pallas", "wave", monkeypatch,
                            w=256, h=128, bounces=5)
    np.testing.assert_array_equal(got, ref)
    assert rays_got == rays_ref


@pytest.mark.parametrize("mode", ["rows", "grave"])
def test_deposit_modes_match_default(small_scene, monkeypatch, mode):
    """RAYTPU_DEPOSIT modes must be BIT-identical to the ch channel
    scatter-adds (pinned explicitly — grave is the production default).
    ``rows`` packs the three scatters into one [n,3] row scatter (same
    adds, same order). ``grave`` removes scatters entirely under the
    dense-pix promise: every (pix, rgb) deposit is appended to a
    graveyard and one argsort(pix) + row gather emits colors in pixel
    order — each pixel deposits exactly once, so gather == scatter-add
    of a single contribution. 256x128 -> two width levels exercises the
    shrink-tail, final-level, and pad-sentinel graveyard rows."""
    monkeypatch.setenv("RAYTPU_DEPOSIT", "ch")
    ref, rays_ref = _render(small_scene, "pallas", "wave", monkeypatch,
                            w=256, h=128, bounces=5)
    monkeypatch.setenv("RAYTPU_DEPOSIT", mode)
    got, rays_got = _render(small_scene, "pallas", "wave", monkeypatch,
                            w=256, h=128, bounces=5)
    np.testing.assert_array_equal(got, ref)
    assert rays_got == rays_ref


def test_tail_merge_grave_matches(small_scene, monkeypatch):
    """Graveyard deposits through the cross-band tail-merge path: band
    survivors leave a zero placeholder row in the graveyard and deposit
    later via the merged tail — the image must stay bit-identical."""
    from raytracer_tpu.engine.renderer import Renderer

    monkeypatch.setenv("RAYTPU_B0", "pallas")
    monkeypatch.setenv("RAYTPU_BOUNCE", "wave")
    cfg = RenderConfig(width=128, height=256, max_bounces=5,
                       kernel="packet", band_rays=16384)
    cam = Camera(origin=(-10.0, 6.0, 30.0), look_at=(0.0, -6.0, 0.0),
                 vfov_deg=40.0, aspect_ratio=cfg.width / cfg.height)
    monkeypatch.setenv("RAYTPU_TAIL_MERGE", "1")
    monkeypatch.setenv("RAYTPU_DEPOSIT", "ch")
    acc_ref, img_ref, st_ref = Renderer(cfg).render(small_scene,
                                                    cam.uniforms())
    monkeypatch.setenv("RAYTPU_DEPOSIT", "grave")
    acc_g, img_g, st_g = Renderer(cfg).render(small_scene, cam.uniforms())
    np.testing.assert_array_equal(np.asarray(acc_g), np.asarray(acc_ref))
    np.testing.assert_array_equal(np.asarray(img_g), np.asarray(img_ref))
    assert float(st_g["rays_traced"]) == float(st_ref["rays_traced"])


def test_tail_merge_matches_unmerged(small_scene, monkeypatch):
    """Cross-band deep-round merge (renderer + wavefront_tail): band
    tails hand off at a fixed width, merge with per-ray bounce budgets,
    and run the deep rounds once per sample. Must be BIT-identical to
    the unmerged banded render: the budget kill rule replicates the
    per-band ``b < max_bounces`` cond and each pixel's single ray
    deposits exactly once either way."""
    from raytracer_tpu.engine.renderer import Renderer

    monkeypatch.setenv("RAYTPU_B0", "pallas")
    monkeypatch.setenv("RAYTPU_BOUNCE", "wave")
    # 128x256 with 16384-ray bands -> nb=2, band ladder (16384, 8192),
    # handoff 8192, merged tail 16384.
    cfg = RenderConfig(width=128, height=256, max_bounces=5,
                       kernel="packet", band_rays=16384)
    cam = Camera(origin=(-10.0, 6.0, 30.0), look_at=(0.0, -6.0, 0.0),
                 vfov_deg=40.0, aspect_ratio=cfg.width / cfg.height)

    from raytracer_tpu.kernels.packet import (tail_merge_active,
                                              tail_merge_widths)
    assert tail_merge_active(small_scene, cfg)
    assert tail_merge_widths(cfg, cfg.height // 2, 2) == (8192, 16384)

    monkeypatch.setenv("RAYTPU_TAIL_MERGE", "0")
    r_ref = Renderer(cfg)
    acc_ref, img_ref, st_ref = r_ref.render(small_scene, cam.uniforms())

    monkeypatch.setenv("RAYTPU_TAIL_MERGE", "1")
    r_tm = Renderer(cfg)
    acc_tm, img_tm, st_tm = r_tm.render(small_scene, cam.uniforms())

    np.testing.assert_array_equal(np.asarray(acc_tm), np.asarray(acc_ref))
    np.testing.assert_array_equal(np.asarray(img_tm), np.asarray(img_ref))
    assert float(st_tm["rays_traced"]) == float(st_ref["rays_traced"])


@pytest.mark.parametrize("mode", ["pd5", "oct_morton", "pos", "om9"])
def test_sort_key_orders_dead_last(mode):
    from raytracer_tpu.kernels.wavefront import sort_key

    n = 64
    rng = np.random.default_rng(0)
    ro = tuple(jnp.asarray(rng.uniform(-5, 5, n).astype(np.float32))
               for _ in range(3))
    rd = tuple(jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))
               for _ in range(3))
    alive = jnp.asarray(rng.uniform(size=n) < 0.5)
    key = np.asarray(sort_key(ro, rd, alive, (jnp.float32(-5),) * 3,
                              (jnp.float32(5),) * 3, mode))
    order = np.argsort(key)
    sorted_alive = np.asarray(alive)[order]
    first_dead = np.argmax(~sorted_alive) if (~sorted_alive).any() else n
    assert not sorted_alive[first_dead:].any()
    live_sorted = order[:first_dead]
    if mode == "oct_morton":
        # octant is the top non-dead key field
        octant = np.asarray(
            (np.asarray(rd[0]) > 0).astype(np.uint32)
            | ((np.asarray(rd[1]) > 0).astype(np.uint32) << 1)
            | ((np.asarray(rd[2]) > 0).astype(np.uint32) << 2))
        assert (np.diff(octant[live_sorted]) >= 0).all()
    elif mode == "pos":
        # pure position morton: top interleave bit = z top bit (z >= 0
        # sorts after z < 0); direction must not influence the key
        oz = np.asarray(ro[2])[live_sorted]
        z_pos = oz > 0.01
        z_neg = oz < -0.01
        first_pos = np.argmax(z_pos) if z_pos.any() else len(z_pos)
        assert not z_neg[first_pos:].any()
        key2 = np.asarray(sort_key(ro, tuple(-d for d in rd), alive,
                                   (jnp.float32(-5),) * 3,
                                   (jnp.float32(5),) * 3, mode))
        np.testing.assert_array_equal(key2, key)
    elif mode == "om9":
        # position-major: direction only sets the low 3 octant bits
        key2 = np.asarray(sort_key(ro, tuple(-d for d in rd), alive,
                                   (jnp.float32(-5),) * 3,
                                   (jnp.float32(5),) * 3, mode))
        assert (np.abs(key2.astype(np.int64) - key.astype(np.int64))
                < 8).all()
    else:
        # top interleave bit = direction-z top bit: dz>0 after dz<0
        dz_pos = np.asarray(rd[2])[live_sorted] > 0.032  # q=16 boundary
        dz_neg = np.asarray(rd[2])[live_sorted] < 0.0
        first_pos = np.argmax(dz_pos) if dz_pos.any() else len(dz_pos)
        assert not dz_neg[first_pos:].any()


@pytest.mark.parametrize("mode", ["pd5", "om9"])
def test_kernel_emitted_key_matches_sort_key(small_scene, mode):
    """The bounce megakernel's 17th output (next-round sort key, dead flag
    at bit 30) must equal kernels/wavefront.sort_key(dead_bit=30) on the
    same state: a silently-wrong key never breaks parity (deposits are
    order-independent) — it only destroys tile coherence, i.e. speed.
    bcap=0 makes the kernel a pure state copy + key emission. (The "cid"
    key needs a walk to define the winner cluster and is covered by
    test_key_mode_image_invariance + test_cid_key_structure.)"""
    from raytracer_tpu.kernels.pallas_mega import bounce_megakernel
    from raytracer_tpu.kernels.wavefront import sort_key

    scene = small_scene
    p = 2048
    rng = np.random.default_rng(7)
    ray_o = tuple(jnp.asarray(rng.uniform(-20, 20, p).astype(np.float32))
                  for _ in range(3))
    ray_d = tuple(jnp.asarray(rng.uniform(-1, 1, p).astype(np.float32))
                  for _ in range(3))
    alive = jnp.asarray(rng.uniform(size=p) < 0.7)
    zero = jnp.zeros((p,), jnp.float32)
    one = jnp.ones((p,), jnp.float32)
    seed = jnp.arange(p, dtype=jnp.uint32)
    blocks = tuple(c.reshape(-1, 128)
                   for c in (*ray_o, *ray_d, zero, zero, zero,
                             one, one, one)) + (
        jax.lax.bitcast_convert_type(seed, jnp.int32).reshape(-1, 128),
        alive.astype(jnp.float32).reshape(-1, 128),
        jnp.full((p // 128, 128), 1 << 30, jnp.int32))
    num4 = jnp.asarray(scene.num_nodes4, jnp.int32).reshape(1)
    bounds = scene.nodes8[0, :6]
    outs = bounce_megakernel(
        scene.nodes4, scene.clusters, num4, blocks,
        jnp.zeros((1,), jnp.int32), jnp.ones((1,), jnp.int32),
        bounds, 8, 0.3, False, interpret=True, key_mode=mode)
    got = np.asarray(outs[17]).reshape(p)
    smin = tuple(scene.nodes8[0, ax] for ax in range(3))
    smax = tuple(scene.nodes8[0, 3 + ax] for ax in range(3))
    want = np.asarray(jax.lax.bitcast_convert_type(
        sort_key(ray_o, ray_d, alive, smin, smax, mode, dead_bit=30),
        jnp.int32))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("mode", ["om9", "cid"])
def test_key_mode_image_invariance(small_scene, monkeypatch, mode):
    """Sort keys only permute rays across tiles: per-(ray, tri)
    intersections are tile-independent, RNG streams ride with the ray,
    and every pixel receives exactly one deposit — so the image and the
    rays-traced count must be IDENTICAL across key modes. (A wrong key
    can only cost speed; this pins that it costs nothing else.)"""
    ref, rays_ref = _render(small_scene, "pallas", "wave", monkeypatch,
                            w=256, h=128)
    monkeypatch.setenv("RAYTPU_SORT_KEY", mode)
    got, rays_got = _render(small_scene, "pallas", "wave", monkeypatch,
                            w=256, h=128)
    np.testing.assert_array_equal(got, ref)
    assert rays_got == rays_ref


@pytest.mark.parametrize("key_mode", ["pd5", "cid"])
def test_fused12_matches_fused(small_scene, monkeypatch, key_mode):
    """RAYTPU_WAVE=fused12 (no-color carry: death deposits ride the atten
    columns, 12 state columns instead of 15) must be BIT-identical to the
    flat fused engine — composed with either key mode (the cid variant
    exercises kernel12's tcid tracking + key emission)."""
    monkeypatch.setenv("RAYTPU_SORT_KEY", key_mode)
    ref, rays_ref = _render(small_scene, "pallas", "wave", monkeypatch,
                            w=256, h=128)
    monkeypatch.setenv("RAYTPU_WAVE", "fused12")
    got, rays_got = _render(small_scene, "pallas", "wave", monkeypatch,
                            w=256, h=128)
    np.testing.assert_array_equal(got, ref)
    assert rays_got == rays_ref


def test_fused12_tail_merge(small_scene, monkeypatch):
    """fused12 through the banded render + cross-band tail merge
    (10-row handoff arrays, in-kernel budget kill-to-black zeroing the
    atten deposit): bit-identical to the legacy 13-row path."""
    from raytracer_tpu.engine.renderer import Renderer

    monkeypatch.setenv("RAYTPU_B0", "pallas")
    monkeypatch.setenv("RAYTPU_BOUNCE", "wave")
    monkeypatch.setenv("RAYTPU_TAIL_MERGE", "1")
    cfg = RenderConfig(width=128, height=256, max_bounces=5,
                       kernel="packet", band_rays=16384)
    cam = Camera(origin=(-10.0, 6.0, 30.0), look_at=(0.0, -6.0, 0.0),
                 vfov_deg=40.0, aspect_ratio=cfg.width / cfg.height)
    acc_ref, img_ref, st_ref = Renderer(cfg).render(small_scene,
                                                    cam.uniforms())
    monkeypatch.setenv("RAYTPU_WAVE", "fused12")
    acc_12, img_12, st_12 = Renderer(cfg).render(small_scene,
                                                 cam.uniforms())
    np.testing.assert_array_equal(np.asarray(acc_12), np.asarray(acc_ref))
    np.testing.assert_array_equal(np.asarray(img_12), np.asarray(img_ref))
    assert float(st_12["rays_traced"]) == float(st_ref["rays_traced"])


def test_cid_key_structure(small_scene):
    """One fused round with key_mode="cid": live rays' emitted keys carry
    their direction octant in the low 3 bits and a winner cluster id
    below bit 30; dead rays carry bit 30."""
    from raytracer_tpu.kernels.pallas_mega import bounce_megakernel

    scene = small_scene
    p = 2048
    rng = np.random.default_rng(11)
    # rays aimed at the scene so most hit and scatter
    ray_o = (jnp.full((p,), -10.0), jnp.full((p,), 6.0),
             jnp.full((p,), 30.0))
    tgt = rng.uniform(-8, 8, (p, 3)).astype(np.float32)
    tgt[:, 1] = rng.uniform(-10, -5, p)
    d = tgt - np.array([-10.0, 6.0, 30.0], np.float32)
    d[::4, 1] = np.abs(d[::4, 1]) + 50.0  # every 4th ray misses into sky
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ray_d = tuple(jnp.asarray(d[:, ax]) for ax in range(3))
    zero = jnp.zeros((p,), jnp.float32)
    one = jnp.ones((p,), jnp.float32)
    seed = jnp.arange(p, dtype=jnp.uint32)
    blocks = tuple(c.reshape(-1, 128)
                   for c in (*ray_o, *ray_d, zero, zero, zero,
                             one, one, one)) + (
        jax.lax.bitcast_convert_type(seed, jnp.int32).reshape(-1, 128),
        one.reshape(-1, 128),
        jnp.full((p // 128, 128), 1 << 30, jnp.int32))
    num4 = jnp.asarray(scene.num_nodes4, jnp.int32).reshape(1)
    bounds = scene.nodes8[0, :6]
    outs = bounce_megakernel(
        scene.nodes4, scene.clusters, num4, blocks,
        jnp.ones((1,), jnp.int32), jnp.ones((1,), jnp.int32),
        bounds, 8, 0.3, False, interpret=True, key_mode="cid")
    key = np.asarray(outs[17]).reshape(p)
    alive = np.asarray(outs[13]).reshape(p) > 0.5
    assert alive.any() and (~alive).any()
    # dead rays: bit 30; live rays: no bit 30
    assert (key[~alive] >> 30 == 1).all()
    assert (key[alive] >> 30 == 0).all()
    # low 3 bits = octant of the ADVANCED direction
    nd = np.stack([np.asarray(outs[3 + ax]).reshape(p) for ax in
                   range(3)], -1)
    octant = ((nd[:, 0] > 0).astype(np.int64)
              | ((nd[:, 1] > 0).astype(np.int64) << 1)
              | ((nd[:, 2] > 0).astype(np.int64) << 2))
    np.testing.assert_array_equal(key[alive] & 7, octant[alive])
    # cluster ids within the scene's cluster table
    n_clusters = scene.clusters.shape[0]
    cids = (key[alive] >> 3) & ((1 << 20) - 1)
    assert (cids < n_clusters).all()


def test_tail_bcap_matches(small_scene, monkeypatch):
    """RAYTPU_TAIL_BCAP=3: the cross-band tail sorts once per 3 bounce
    iterations, with the per-ray bounces-left budget riding IN-kernel
    (15th state block) so the kill rule stays exact. Per-ray RNG streams
    and strict closest-t make the image bit-identical to 1-bounce tail
    rounds; the kernel's count rows keep rays_traced exact."""
    from raytracer_tpu.engine.renderer import Renderer
    from raytracer_tpu.kernels import wavefront

    monkeypatch.setenv("RAYTPU_B0", "pallas")
    monkeypatch.setenv("RAYTPU_BOUNCE", "wave")
    cfg = RenderConfig(width=128, height=256, max_bounces=5,
                       kernel="packet", band_rays=16384)
    cam = Camera(origin=(-10.0, 6.0, 30.0), look_at=(0.0, -6.0, 0.0),
                 vfov_deg=40.0, aspect_ratio=cfg.width / cfg.height)

    r_ref = Renderer(cfg)
    acc_ref, img_ref, st_ref = r_ref.render(small_scene, cam.uniforms())

    monkeypatch.setattr(wavefront, "TAIL_BCAP", 3)
    r_b3 = Renderer(cfg)
    acc_b3, img_b3, st_b3 = r_b3.render(small_scene, cam.uniforms())

    np.testing.assert_array_equal(np.asarray(img_b3), np.asarray(img_ref))
    assert float(st_b3["rays_traced"]) == float(st_ref["rays_traced"])
