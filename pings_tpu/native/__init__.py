"""ctypes bindings for the native C++ library (libpings.so).

Built by ``make -C pings_tpu/native`` (g++, no external deps). The library
provides the host-side geometry hot spots:

- ``marching_tetrahedra`` — isosurface extraction from SDF grids
  (replaces skimage.measure.marching_cubes of the reference).
- ``nn_distances`` — grid-accelerated nearest-neighbor distances for mesh
  evaluation (replaces open3d KDTree usage).

Auto-builds on first import if the shared object is missing and a compiler
is available; raises a clear error otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libpings.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    subprocess.run(["make", "-C", _DIR, "-s"], check=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        _build()
    lib = ctypes.CDLL(_SO)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.marching_tetrahedra.restype = ctypes.c_int
    lib.marching_tetrahedra.argtypes = [
        f32p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float,
        f32p, i32p, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.nn_distances.restype = ctypes.c_int
    lib.nn_distances.argtypes = [
        f32p, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_float, f32p,
    ]
    _lib = lib
    return lib


def marching_tetrahedra(
    sdf: np.ndarray,
    origin,
    resolution: float,
    iso: float = 0.0,
    mask: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the iso-surface of sdf[(x,y,z)]. Returns (verts (V,3) f32,
    tris (T,3) i32)."""
    lib = get_lib()
    sdf = np.ascontiguousarray(sdf, np.float32)
    nx, ny, nz = sdf.shape
    flat = sdf.reshape(-1)
    if mask is not None:
        mask_arr = np.ascontiguousarray(mask.reshape(-1), np.uint8)
        mask_ptr = mask_arr.ctypes.data_as(ctypes.c_void_p)
    else:
        mask_arr = None
        mask_ptr = None
    # generous initial caps; retry doubled on overflow
    max_v = max(1 << 16, int(flat.size * 0.5))
    for _ in range(4):
        max_t = 2 * max_v
        verts = np.empty((max_v, 3), np.float32)
        tris = np.empty((max_t, 3), np.int32)
        nv = ctypes.c_int32(0)
        nt = ctypes.c_int32(0)
        ret = lib.marching_tetrahedra(
            flat, mask_ptr, nx, ny, nz, float(iso),
            float(origin[0]), float(origin[1]), float(origin[2]),
            float(resolution),
            verts.reshape(-1), tris.reshape(-1),
            max_v, max_t, ctypes.byref(nv), ctypes.byref(nt))
        if ret == 0:
            return verts[: nv.value].copy(), tris[: nt.value].copy()
        max_v *= 2
    return verts[: nv.value].copy(), tris[: nt.value].copy()


def nn_distances(query: np.ndarray, ref: np.ndarray,
                 cell: float = 0.2) -> np.ndarray:
    """For each query point, distance to the nearest ref point (capped at
    ~3*cell search radius; farther points report 1e9)."""
    lib = get_lib()
    q = np.ascontiguousarray(query, np.float32)
    r = np.ascontiguousarray(ref, np.float32)
    out = np.empty(len(q), np.float32)
    lib.nn_distances(q.reshape(-1), len(q), r.reshape(-1), len(r),
                     float(cell), out)
    return out
