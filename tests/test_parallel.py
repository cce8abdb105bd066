"""Multi-chip sharding on the 8-virtual-device CPU mesh.

The sharded render must produce *exactly* the same image as single-device:
row bands use globally-consistent seeds and viewport math, and sp-sharding
only reorders the per-sample mean.
"""

import numpy as np
import pytest

import jax

from raytracer_tpu.core.camera import Camera
from raytracer_tpu.core.types import RenderConfig
from raytracer_tpu.engine.renderer import Renderer
from raytracer_tpu.parallel.sharding import MeshRenderer, make_mesh
from raytracer_tpu.scene.builder import build_fast_scene_from_arrays
from raytracer_tpu.utils import assets

W, H = 32, 64


@pytest.fixture(scope="module")
def scene():
    cube = assets.make_cube() * 4.0 + np.array([0, -6, 0], np.float32)
    plane = (assets.make_ground_plane() * np.array([150, 1, 150], np.float32)
             + np.array([0, -10, 0], np.float32))
    verts = np.concatenate([plane, cube])
    mats = np.zeros((verts.shape[0], 4), np.float32)
    mats[:, 0:3] = (0.6, 0.5, 0.4)
    mats[2:, 3] = 1.0
    return build_fast_scene_from_arrays(verts, mats)


def _cam():
    return Camera(origin=(-10.0, 6.0, 30.0), look_at=(0.0, -6.0, 0.0),
                  vfov_deg=40.0, aspect_ratio=W / H)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("dp,sp", [(8, 1), (4, 2), (2, 4)])
def test_sharded_matches_single_device(scene, dp, sp):
    cfg = RenderConfig(width=W, height=H, kernel="packet",
                       samples_per_pixel=sp)
    single = Renderer(cfg)
    cam = _cam()
    _, img1, st1 = single.render(scene, cam.uniforms())

    mesh = make_mesh(n_devices=dp * sp, sp=sp)
    multi = MeshRenderer(cfg, mesh=mesh)
    rscene = multi.prepare_scene(scene)
    _, img2, st2 = multi.render(rscene, cam.uniforms())

    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))
    assert float(st1["rays_traced"]) == float(st2["rays_traced"])


def test_sharded_accumulation(scene):
    cfg = RenderConfig(width=W, height=H, kernel="packet")
    mesh = make_mesh(n_devices=4, sp=1)
    r = MeshRenderer(cfg, mesh=mesh)
    rscene = r.prepare_scene(scene)
    cam = _cam()
    accum = None
    for fc in range(3):
        cam.frame_count = fc
        accum, img, stats = r.render(rscene, cam.uniforms(), accum)
    assert float(stats["samples"]) == 3.0
    # Accumulator stays sharded across frames.
    assert len(accum.sharding.device_set) == 4


def test_check_vma_still_unsupported(scene, monkeypatch):
    """Pin for the documented check_vma=False bypass (sharding.py): jax's
    vma inference rejects the kernels' constant-initialized while_loop
    carries (wants pcast-to-varying on every zero init, which can't be
    threaded through kernels that also run outside shard_map). If jax
    starts accepting these carries, this test FAILS — flip check_vma=True
    in parallel/sharding.py and delete this pin."""
    import raytracer_tpu.parallel.sharding as sh

    orig = sh.shard_map

    def forced(fn, **kw):
        kw["check_vma"] = True
        return orig(fn, **kw)

    monkeypatch.setattr(sh, "shard_map", forced)
    cfg = RenderConfig(width=W, height=H, kernel="packet", max_bounces=2)
    mesh = make_mesh(n_devices=2, sp=1)
    r = MeshRenderer(cfg, mesh=mesh)
    rscene = r.prepare_scene(scene)
    try:
        _, img, _ = r.render(rscene, _cam().uniforms())
        np.asarray(img)
    except TypeError as e:
        assert "varying" in str(e)  # the documented vma carry mismatch
        return
    pytest.fail("jax now accepts the kernels' loop carries under "
                "check_vma=True — enable it in parallel/sharding.py")


def test_sharded_tail_merge_matches_single_device(scene, monkeypatch):
    """The production pipeline (band split + cross-band tail merge +
    graveyard deposits) under shard_map must match single-chip
    bit-for-bit — the sharded step now runs engine/renderer's
    _render_linear verbatim, so the path bench.py times is the path the
    mesh runs (VERDICT r4 weak #6)."""
    monkeypatch.setenv("RAYTPU_B0", "pallas")
    monkeypatch.setenv("RAYTPU_BOUNCE", "wave")
    monkeypatch.setenv("RAYTPU_TAIL_MERGE", "1")
    # 128x512, 16384-ray bands: single-chip nb=4; each dp=2 shard nb=2
    # with a (16384 -> 8192) ladder + 8192-wide handoff per band.
    cfg = RenderConfig(width=128, height=512, max_bounces=4,
                       kernel="packet", band_rays=16384)
    from raytracer_tpu.kernels.packet import tail_merge_active
    assert tail_merge_active(scene, cfg)

    cam = Camera(origin=(-10.0, 6.0, 30.0), look_at=(0.0, -6.0, 0.0),
                 vfov_deg=40.0, aspect_ratio=cfg.width / cfg.height)
    single = Renderer(cfg)
    _, img1, st1 = single.render(scene, cam.uniforms())

    multi = MeshRenderer(cfg, mesh=make_mesh(n_devices=2, sp=1))
    _, img2, st2 = multi.render(multi.prepare_scene(scene), cam.uniforms())
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))
    assert float(st1["rays_traced"]) == float(st2["rays_traced"])


def test_wavefront_kernel_sharded(scene):
    from raytracer_tpu.scene.builder import build_gpu_scene_from_arrays

    cube = assets.make_cube() * 4.0 + np.array([0, -6, 0], np.float32)
    mats = np.zeros((12, 4), np.float32)
    mats[:, 0:3] = 0.7
    gscene = build_gpu_scene_from_arrays(cube, mats)

    cfg = RenderConfig(width=W, height=H, kernel="wavefront")
    single = Renderer(cfg)
    cam = _cam()
    _, img1, _ = single.render(gscene, cam.uniforms())

    multi = MeshRenderer(cfg, mesh=make_mesh(n_devices=2, sp=1))
    _, img2, _ = multi.render(multi.prepare_scene(gscene), cam.uniforms())
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))
