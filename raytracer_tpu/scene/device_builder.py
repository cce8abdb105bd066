"""Live-edit scene pipeline: device-resident meshes + jitted LBVH rebuild.

The reference re-runs its whole CPU pipeline per edit — Assimp reload,
per-vertex transform, recursive BVH build, flatten, re-upload
(``renderer/SceneBuilder.java:38-118``). Here each mesh is uploaded to HBM
once; a scene edit ships only the per-instance parameters (position /
scale / color / material — a few floats) and one jitted program applies
the transforms, builds the LBVH (bvh/lbvh.py), and packs the cluster
tables entirely on-device. Instance-set changes retrace; parameter edits
reuse the compiled executable (shapes are stable, padded to capacity
buckets like the host path).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.bvh.lbvh import build_fast_scene_device
from raytracer_tpu.core.fast_types import ROW_TRIS
from raytracer_tpu.scene.objloader import load_obj
from raytracer_tpu.scene.scene import ModelInstance
from raytracer_tpu.utils.log import get_logger

_log = get_logger("srt")

_MIN_CAPACITY = 64


def _bucket(n: int) -> int:
    c = _MIN_CAPACITY
    while c < n:
        c *= 2
    return c


@functools.partial(jax.jit, static_argnames=("capacity",))
def _assemble(meshes, params, capacity: int):
    """meshes: tuple of f32[Ti,3,3]; params: tuple of (scale3, pos3,
    color3, mtype) arrays. Transforms + concat + pad on device."""
    parts_v = []
    parts_m = []
    for mesh, (scale, pos, color, mtype) in zip(meshes, params):
        v = mesh * scale + pos  # scale-then-translate per vertex
        t_i = mesh.shape[0]
        m = jnp.concatenate([
            jnp.broadcast_to(color, (t_i, 3)),
            jnp.broadcast_to(mtype, (t_i, 1)),
        ], axis=1)
        parts_v.append(v)
        parts_m.append(m)
    verts = jnp.concatenate(parts_v)
    mats = jnp.concatenate(parts_m)
    pad = capacity - verts.shape[0]
    if pad:
        verts = jnp.concatenate([verts, jnp.zeros((pad, 3, 3), jnp.float32)])
        mats = jnp.concatenate([mats, jnp.zeros((pad, 4), jnp.float32)])
    return verts, mats


_build_jit = jax.jit(build_fast_scene_device)


@functools.cache
def _build_jit_ploc():
    # Cached: a fresh jax.jit wrapper per build retraces (and recompiles)
    # the whole PLOC program every frame — the r4b lbvh_ploc 0.77 FPS was
    # dominated by exactly that, not by device build cost (exp37).
    from raytracer_tpu.bvh.ploc_device import build_fast_scene_device_ploc

    return jax.jit(build_fast_scene_device_ploc)


def _assemble_and_build(meshes, params, capacity: int, tree: str = "karras"):
    """Two device programs, no host roundtrip of geometry.

    Deliberately NOT one fused jit: the fused transform+LBVH program
    compiles ~4x slower (44 s vs 12 s at 131072 triangles) and at that
    size intermittently crashed the axon TPU worker outright; two smaller
    programs compile fast and have not reproduced the crash.

    ``tree``: "karras" (bvh/lbvh.py, fixed Morton 8-run leaves) or
    "ploc" (bvh/ploc_device.py, agglomerative capped leaves — exp35:
    x0.89-0.92 visit events vs host SAH where Karras sits at x1.72)."""
    verts, mats = _assemble(meshes, params, capacity)
    build = _build_jit_ploc() if tree == "ploc" else _build_jit
    scene = build(verts, mats)
    # Degenerate padding triangles never hit, but keep the true count.
    import dataclasses

    t = sum(m.shape[0] for m in meshes)
    return dataclasses.replace(scene, num_triangles=jnp.int32(t))


class DeviceSceneBuilder:
    """Mesh cache + on-device rebuild entry point.

    Two rebuild strategies (RAYTPU_DEVICE_BUILD, read per build so tests
    can A/B):

    * ``instanced`` (default) — two-level BVH: per-mesh host SAH trees
      built once and cached on device; an edit runs one small jitted
      transform/graft program (scene/instanced.py). SAH tree quality
      (exp31: 1.53x faster renders than the LBVH tree at 97.8k tris) and
      per-edit cost independent of hierarchy building.
    * ``refit`` — fixed captured topology (host SAH/PLOC, once per
      instance set) + one jitted per-edit AABB-refit/repack program
      (scene/refit.py). Per-edit device work is O(scene) dense vector
      ops with NO tree building — the exp37 answer to "quality tree or
      fast rebuild, pick one". Arbitrary instance counts.
    * ``lbvh`` — the fully on-device Morton/Karras rebuild (bvh/lbvh.py);
      the general path for true per-frame GEOMETRY changes (refit
      assumes the triangle->leaf assignment stays valid) and the A/B
      record.
    """

    def __init__(self):
        self._mesh_cache: dict[str, jnp.ndarray] = {}
        self._blas_cache: dict[str, "object"] = {}
        self._param_cache: dict[tuple, tuple] = {}
        self._refit_cache: dict[tuple, "object"] = {}

    def _mesh(self, path: str):
        mesh = self._mesh_cache.get(path)
        if mesh is None:
            mesh = jnp.asarray(load_obj(path))
            self._mesh_cache[path] = mesh
        return mesh

    def _blas(self, path: str):
        blas = self._blas_cache.get(path)
        if blas is None:
            from raytracer_tpu.scene.instanced import prep_mesh_blas
            import time

            t0 = time.perf_counter()
            blas = prep_mesh_blas(np.asarray(self._mesh(path)))
            _log.info("BLAS built for %s: %d tris in %.1f ms", path,
                      blas.num_triangles,
                      (time.perf_counter() - t0) * 1e3)
            self._blas_cache[path] = blas
        return blas

    def _params(self, inst: ModelInstance):
        """Device param arrays, cached by value: an unchanged instance
        costs zero host->device RPCs per rebuild (8 tiny puts per frame
        measurably dent the two_humans rebuild budget — exp24's uniform
        lesson applied to the SRT)."""
        key = (tuple(float(x) for x in inst.scale),
               tuple(float(x) for x in inst.position),
               tuple(float(x) for x in inst.color),
               float(inst.material_type))
        dev = self._param_cache.get(key)
        if dev is None:
            dev = (jnp.asarray(key[0], jnp.float32),
                   jnp.asarray(key[1], jnp.float32),
                   jnp.asarray(key[2], jnp.float32),
                   jnp.asarray(key[3], jnp.float32))
            if len(self._param_cache) > 4096:
                self._param_cache.clear()
            self._param_cache[key] = dev
        return dev

    def build(self, instances: Sequence[ModelInstance]):
        """Snapshot -> FastScene, geometry staying on-device.

        Falls back to the host pipeline for empty scenes."""
        import os

        from raytracer_tpu.scene.instanced import (MAX_INSTANCES,
                                                   combine_instanced)

        mode = os.environ.get("RAYTPU_DEVICE_BUILD", "instanced")
        live = [inst for inst in instances
                if self._try_mesh(inst) is not None]
        if not live:
            from raytracer_tpu.scene.builder import build_fast_scene

            return build_fast_scene([])

        if mode == "instanced" and len(live) <= MAX_INSTANCES:
            try:
                blases = [self._blas(inst.model_path) for inst in live]
                return combine_instanced(
                    blases, [self._params(inst) for inst in live])
            except Exception:
                _log.exception("instanced build failed; using LBVH")

        if mode in ("refit", "instanced"):
            # Fixed captured topology + per-edit device refit
            # (scene/refit.py) — also the > MAX_INSTANCES fallback for
            # the default instanced mode (rigid SRT edits, any count).
            # The fallback case recaptures periodically by default so
            # sustained cross-instance motion can't degrade tree quality
            # without bound (explicit refit mode keeps the user's knob).
            try:
                built = self._refit_build(
                    live, default_refresh=0 if mode == "refit" else 256)
                if built is not None:
                    return built
            except Exception:
                _log.exception("refit build failed; using LBVH")

        meshes = [self._mesh(inst.model_path) for inst in live]
        params = [self._params(inst) for inst in live]
        total = sum(m.shape[0] for m in meshes)
        # Round to full 128-float cluster rows (ROW_TRIS triangles), a
        # multiple of any CLUSTER_SIZE in {2, 4, 8}.
        capacity = _bucket((total + ROW_TRIS - 1) // ROW_TRIS * ROW_TRIS)
        # Topology for the on-device rebuild (RAYTPU_DEVICE_TREE): the
        # PLOC tree walks ~1.9x fewer visit events than Karras (exp35);
        # its rebuild runs more device iterations — A/B'd on TPU (r4b).
        tree = os.environ.get("RAYTPU_DEVICE_TREE", "karras")
        return _assemble_and_build(tuple(meshes), tuple(params), capacity,
                                   tree=tree)

    def _refit_build(self, live: Sequence[ModelInstance],
                     default_refresh: int = 0):
        """Captured-topology refit (scene/refit.py). Returns None when a
        fresh capture is needed but impossible (tiny scenes: capture
        needs >= 2 leaves)."""
        import os

        from raytracer_tpu.scene.refit import capture_refit

        key = tuple(inst.model_path for inst in live)
        params = [((tuple(float(x) for x in inst.scale)),
                   tuple(float(x) for x in inst.position),
                   tuple(float(x) for x in inst.color),
                   float(inst.material_type)) for inst in live]
        cap = self._refit_cache.get(key)
        # Topology refresh: rigid drags keep the captured tree valid;
        # recapture every N edits re-anchors quality to the current pose.
        # RAYTPU_REFIT_REFRESH overrides; the caller sets the default
        # (0 = never for explicit refit mode, periodic for fallbacks).
        refresh = int(os.environ.get("RAYTPU_REFIT_REFRESH",
                                     str(default_refresh)))
        if cap is not None and refresh and cap.edits >= refresh:
            _log.info("refit topology refresh after %d edits (%s)",
                      cap.edits, key)
            cap = None
        if cap is None:
            meshes = [np.asarray(self._mesh(inst.model_path))
                      for inst in live]
            try:
                cap = capture_refit(meshes, params)
            except ValueError as e:
                # Normal fallback for tiny scenes (< 2 leaves), not an
                # error: the caller routes to the LBVH path.
                _log.info("refit capture unavailable: %s", e)
                return None
            # Bound device-table pinning: each capture holds full-scene
            # HBM tables, so keep only the most recent few instance sets
            # (mirrors the _param_cache bound).
            if len(self._refit_cache) >= 4 and key not in self._refit_cache:
                self._refit_cache.pop(next(iter(self._refit_cache)))
            self._refit_cache[key] = cap
        return cap.refit(params)

    def _try_mesh(self, inst: ModelInstance):
        try:
            mesh = self._mesh(inst.model_path)
        except Exception as e:
            _log.warning("failed to load %s: %s", inst.model_path, e)
            return None
        return mesh if mesh.shape[0] else None
