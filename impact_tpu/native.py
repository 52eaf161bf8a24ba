"""ctypes bindings for the native C++ components.

The runtime around the XLA compute path is native where the reference's is
(impact_tesselation is pure Rust there): native/tessellation.cpp implements
incremental 3D Delaunay (Bowyer-Watson) and Voronoi cell extraction, built as
libimpact_native.so (``make -C native``) and auto-built on first import when
a compiler is available.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libimpact_native.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    src = _NATIVE_DIR / "tessellation.cpp"
    stale = (
        not _LIB_PATH.exists()
        or (src.exists() and src.stat().st_mtime > _LIB_PATH.stat().st_mtime)
    )
    if stale:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True
        )
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.impact_delaunay_tetrahedralize.restype = ctypes.c_int
    lib.impact_delaunay_tetrahedralize.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    lib.impact_voronoi_cell_vertices.restype = ctypes.c_int
    lib.impact_voronoi_cell_vertices.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    _lib = lib
    return lib


def delaunay_tetrahedralize(points) -> np.ndarray:
    """3D Delaunay tetrahedralization (ref: impact_tesselation delaunay.rs).

    points: [N,3] float array → [T,4] int32 tetrahedron vertex indices.
    """
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    n = len(pts)
    max_tets = max(64, 8 * n)
    out = np.empty((max_tets, 4), np.int32)
    count = lib.impact_delaunay_tetrahedralize(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), max_tets,
    )
    if count < 0:
        raise RuntimeError("delaunay: tetrahedron buffer overflow")
    return out[:count].copy()


def voronoi_cell_vertices(points, tets, site: int) -> np.ndarray:
    """Voronoi cell vertices (circumcenters of incident tets) for a site
    (ref: impact_tesselation voronoi.rs dual extraction)."""
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    tt = np.ascontiguousarray(tets, np.int32)
    max_v = max(64, len(tt))
    out = np.empty((max_v, 3), np.float32)
    count = lib.impact_voronoi_cell_vertices(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(pts),
        tt.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(tt), site,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_v,
    )
    if count < 0:
        raise RuntimeError("voronoi: vertex buffer overflow")
    return out[:count].copy()


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False
