"""ctypes bindings for the native mesh runtime (C++: marching tetrahedra +
BVH point->mesh distances).  The shared library is compiled lazily on first
use and cached next to the source."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "mesh_native.cpp")
_SO = os.path.join(_DIR, "mesh_native.so")
_LOCK = threading.Lock()
_LIB = None


def _build() -> None:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-fopenmp",
           _SRC, "-o", _SO + ".tmp"]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(_SO + ".tmp", _SO)


def _lib() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.mc_extract.restype = ctypes.c_int64
        lib.mc_extract.argtypes = [f32p, ctypes.c_int64, ctypes.c_int64,
                                   ctypes.c_int64, f32p, f32p, ctypes.c_float]
        lib.mc_num_verts.restype = ctypes.c_int64
        lib.mc_num_tris.restype = ctypes.c_int64
        lib.mc_get_verts.argtypes = [f32p]
        lib.mc_get_tris.argtypes = [i32p]
        lib.bvh_create.argtypes = [f32p, ctypes.c_int64, i32p, ctypes.c_int64]
        lib.bvh_sq_distances.argtypes = [f32p, ctypes.c_int64, f32p]
        lib.bvh_ray_intersect.argtypes = [f32p, f32p, ctypes.c_int64,
                                          f32p, i32p, f32p]
        _LIB = lib
        return lib


def marching_cubes(field: np.ndarray, origin, spacing, iso: float = 0.0
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the iso-surface of a [nx,ny,nz] scalar field.

    Returns (verts [V,3] float32, tris [T,3] int32).  Vertices below `iso`
    are considered inside (pass -sdf with iso=0 to match the reference's
    `-sdf` threshold convention, renderer.py:455-462)."""
    lib = _lib()
    field = np.ascontiguousarray(field, np.float32)
    origin = np.ascontiguousarray(origin, np.float32)
    spacing = np.ascontiguousarray(spacing, np.float32)
    with _LOCK:
        lib.mc_extract(field, *field.shape, origin, spacing, np.float32(iso))
        nv, nt = lib.mc_num_verts(), lib.mc_num_tris()
        verts = np.empty((nv, 3), np.float32)
        tris = np.empty((nt, 3), np.int32)
        if nv:
            lib.mc_get_verts(verts)
        if nt:
            lib.mc_get_tris(tris)
        lib.mc_free()
    return verts, tris


def ray_mesh_intersect(ray_o: np.ndarray, ray_d: np.ndarray, verts: np.ndarray,
                       tris: np.ndarray):
    """Closest-hit ray casting against a triangle mesh.

    Returns (t [N] (-1 = miss), tri_idx [N], bary_uv [N, 2])."""
    lib = _lib()
    ray_o = np.ascontiguousarray(ray_o, np.float32)
    ray_d = np.ascontiguousarray(ray_d, np.float32)
    verts = np.ascontiguousarray(verts, np.float32)
    tris = np.ascontiguousarray(tris, np.int32)
    n = ray_o.shape[0]
    out_t = np.empty(n, np.float32)
    out_tri = np.empty(n, np.int32)
    out_uv = np.empty((n, 2), np.float32)
    with _LOCK:
        lib.bvh_create(verts, verts.shape[0], tris, tris.shape[0])
        lib.bvh_ray_intersect(ray_o, ray_d, n, out_t, out_tri, out_uv)
        lib.bvh_free()
    return out_t, out_tri, out_uv


def point_mesh_sq_distances(points: np.ndarray, verts: np.ndarray,
                            tris: np.ndarray) -> np.ndarray:
    """Squared distance from each point to the mesh (igl replacement)."""
    lib = _lib()
    points = np.ascontiguousarray(points, np.float32)
    verts = np.ascontiguousarray(verts, np.float32)
    tris = np.ascontiguousarray(tris, np.int32)
    out = np.empty(points.shape[0], np.float32)
    with _LOCK:
        lib.bvh_create(verts, verts.shape[0], tris, tris.shape[0])
        lib.bvh_sq_distances(points, points.shape[0], out)
        lib.bvh_free()
    return out
