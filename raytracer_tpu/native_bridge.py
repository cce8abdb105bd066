"""ctypes bridge to the C++ native runtime (native/raytpu_native.cpp).

Loads ``native/raytpu_native.so``, building it with ``make`` on first use
if the toolchain is available. Every entry point has a pure-Python/NumPy
fallback, so the framework works without a compiler; the native path just
makes scene rebuilds (the interactive editing hot loop) fast.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from raytracer_tpu.utils.log import get_logger

_log = get_logger("native")

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "raytpu_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        src = os.path.join(_NATIVE_DIR, "raytpu_native.cpp")
        stale = (not os.path.exists(_SO_PATH)
                 or (os.path.exists(src)
                     and os.path.getmtime(src) > os.path.getmtime(_SO_PATH)))
        if stale:
            # Always rebuild when the source is newer: a stale .so packing
            # an old cluster layout would silently corrupt renders.
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR],
                               check=True, capture_output=True, timeout=120)
            except Exception as e:
                if not os.path.exists(_SO_PATH):
                    _log.info("native build unavailable (%s); using NumPy "
                              "fallbacks", e)
                    return None
                _log.warning("native rebuild failed (%s); using existing "
                             ".so — layout may be stale", e)
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError as e:
            _log.warning("failed to load %s: %s", _SO_PATH, e)
            return None

        lib.rt_free.argtypes = [ctypes.c_void_p]
        lib.rt_load_obj.restype = ctypes.c_int64
        lib.rt_load_obj.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float))]
        lib.rt_bvh_node_count.restype = ctypes.c_int64
        lib.rt_bvh_node_count.argtypes = [ctypes.c_int64, ctypes.c_int32]
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.rt_build_bvh.restype = ctypes.c_int64
        lib.rt_build_bvh.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_int32,
            f32p, f32p, i32p, i32p, i32p, i32p, i32p, i64p]
        lib.rt_build_bvh_sah.restype = ctypes.c_int64
        lib.rt_build_bvh_sah.argtypes = lib.rt_build_bvh.argtypes
        lib.rt_build_bvh_sbvh.restype = ctypes.c_int64
        lib.rt_build_bvh_sbvh.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int64,
            f32p, f32p, i32p, i32p, i32p, i32p, i32p, i64p]
        lib.rt_build_bvh_ploc.restype = ctypes.c_int64
        lib.rt_build_bvh_ploc.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            f32p, f32p, i32p, i32p, i32p, i32p, i32p, i64p]
        lib.rt_pack_clusters.restype = None
        lib.rt_pack_clusters.argtypes = [
            f32p, f32p, ctypes.c_int64, i64p, i32p, i32p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, f32p, i32p]
        _lib = lib
        _log.info("native runtime loaded: %s", _SO_PATH)
        return _lib


def available() -> bool:
    return _load() is not None


def load_obj(path: str):
    """Native .obj parse -> f32[T,3,3], or None if unavailable/failed."""
    lib = _load()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_float)()
    t = lib.rt_load_obj(path.encode(), ctypes.byref(out))
    if t < 0:
        if t == -1:
            raise FileNotFoundError(path)
        raise ValueError(f"parse error in {path}")
    try:
        if t == 0:
            return np.zeros((0, 3, 3), np.float32)
        arr = np.ctypeslib.as_array(out, shape=(int(t), 3, 3)).copy()
    finally:
        lib.rt_free(out)
    return arr


def build_bvh(tris: np.ndarray, leaf_size: int = 1,
              method: str = "median"):
    """Native BVH build -> bvh.build.HostBVH, or None if unavailable.

    method "median" reproduces the NumPy reference builder exactly;
    "sah" builds a binned-SAH tree (same layout, fewer ray visits);
    "sbvh" adds spatial splits (Stich '09 style) — straddling triangles
    are duplicated with plane-clipped bounds, so ``order`` may repeat a
    triangle index and its length (= sum of leaf ntri) can exceed the
    triangle count, up to a 1.75x duplication budget."""
    lib = _load()
    if lib is None:
        return None
    from raytracer_tpu.bvh.build import HostBVH

    tris = np.ascontiguousarray(tris, np.float32)
    n = tris.shape[0]
    max_refs = n
    if method == "sbvh":
        max_refs = n + max(n * 3 // 4, 64)  # duplication budget
        m_cap = 2 * max_refs - 1
    elif method in ("sah", "ploc"):
        m_cap = 2 * n - 1  # worst case; actual count returned
        fn = lib.rt_build_bvh_sah
    else:
        m_cap = int(lib.rt_bvh_node_count(n, leaf_size))
        fn = lib.rt_build_bvh
    node_min = np.empty((m_cap, 3), np.float32)
    node_max = np.empty((m_cap, 3), np.float32)
    node_tri = np.empty(m_cap, np.int32)
    node_ntri = np.empty(m_cap, np.int32)
    node_skip = np.empty(m_cap, np.int32)
    node_data = np.empty(m_cap, np.int32)
    node_count = np.empty(m_cap, np.int32)
    order = np.empty(max_refs, np.int64)
    if method == "sbvh":
        m = int(lib.rt_build_bvh_sbvh(
            tris.reshape(-1), n, leaf_size, max_refs,
            node_min.reshape(-1), node_max.reshape(-1),
            node_tri, node_ntri, node_skip, node_data, node_count, order))
    elif method == "ploc":
        m = int(lib.rt_build_bvh_ploc(
            tris.reshape(-1), n, leaf_size, 8,  # window (exp35 W sweep)
            node_min.reshape(-1), node_max.reshape(-1),
            node_tri, node_ntri, node_skip, node_data, node_count, order))
    else:
        m = int(fn(tris.reshape(-1), n, leaf_size,
                   node_min.reshape(-1), node_max.reshape(-1),
                   node_tri, node_ntri, node_skip, node_data, node_count,
                   order))
    if m <= 0 or (method not in ("sah", "sbvh", "ploc") and m != m_cap):
        raise RuntimeError(f"native BVH build failed (m={m})")
    n_refs = int(node_ntri[:m][node_tri[:m] >= 0].sum()) \
        if method == "sbvh" else n
    return HostBVH(node_min[:m].copy(), node_max[:m].copy(),
                   node_tri[:m].copy(), node_ntri[:m].copy(),
                   node_skip[:m].copy(), node_data[:m].copy(),
                   node_count[:m].copy(), order[:n_refs].copy())
