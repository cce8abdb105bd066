"""Wavefront .obj loader producing triangle soups.

Replaces the reference's Assimp JNI import (``renderer/SceneBuilder.java:144``,
``aiImportFile(path, Triangulate | JoinIdenticalVertices)``): supports
v / vn / vt / f records, ``v``, ``v/vt``, ``v//vn``, ``v/vt/vn`` face forms,
negative (relative) indices, and fan-triangulation of n-gons (what
``aiProcess_Triangulate`` does). Only positions matter downstream — the
reference bakes per-instance color/material and derives face normals in the
kernel, so normals/uvs are parsed but discarded.
"""

from __future__ import annotations

import os

import numpy as np


def load_obj(path: str) -> np.ndarray:
    """Parse a .obj file -> f32[T, 3, 3] array of triangles (v0, v1, v2).

    Uses the C++ native parser (native/raytpu_native.cpp) when built;
    falls back to the pure-Python parser below. RAYTPU_NATIVE=0 disables."""
    if os.environ.get("RAYTPU_NATIVE", "1") != "0":
        try:
            from raytracer_tpu import native_bridge

            tris = native_bridge.load_obj(path)
            if tris is not None:
                return tris
        except (FileNotFoundError, PermissionError):
            raise
        except Exception:
            pass  # fall through to the Python parser
    return load_obj_python(path)


def load_obj_python(path: str) -> np.ndarray:
    """Pure-Python reference parser."""
    verts: list[tuple[float, float, float]] = []
    tris: list[tuple[int, int, int]] = []

    with open(path, "r", encoding="utf-8", errors="replace") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            tag = parts[0]
            if tag == "v":
                verts.append((float(parts[1]), float(parts[2]), float(parts[3])))
            elif tag == "f":
                idx = [_vertex_index(tok, len(verts)) for tok in parts[1:]]
                # Fan triangulation for polygons with >3 vertices.
                for k in range(1, len(idx) - 1):
                    tris.append((idx[0], idx[k], idx[k + 1]))
            # vn / vt / o / g / s / usemtl / mtllib intentionally ignored.

    if not tris:
        return np.zeros((0, 3, 3), np.float32)
    v = np.asarray(verts, np.float32)
    t = np.asarray(tris, np.int64)
    return v[t]  # [T, 3, 3]


def _vertex_index(token: str, num_verts: int) -> int:
    """'5', '5/2', '5//3', '5/2/3' and negative relative indices -> 0-based."""
    s = token.split("/")[0]
    i = int(s)
    return i - 1 if i > 0 else num_verts + i
