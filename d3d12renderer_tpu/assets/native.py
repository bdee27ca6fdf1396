"""ctypes bindings for the native mesh-ops library (native/mesh_ops.cpp).

The reference's asset import hot paths are C++ (src/asset/
mesh_postprocessing.cpp, obj.cpp); ours stay native too.  The shared library
compiles on first use with g++ -O3 and caches next to the source; every entry
point has a NumPy fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "mesh_ops.cpp")
_LIB_PATH = _SRC.replace(".cpp", ".so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            # Compile to a temp file + atomic rename: an in-place `g++ -o`
            # truncates the inode, corrupting the mapping of any process
            # that already CDLL'd the old library.
            tmp = _LIB_PATH + f".tmp{os.getpid()}"
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", tmp, _SRC],
                check=True, capture_output=True,
            )
            os.replace(tmp, _LIB_PATH)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.weld_vertices.restype = ctypes.c_int64
        lib.weld_vertices.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
            ctypes.POINTER(ctypes.c_int32)]
        lib.generate_normals.restype = None
        lib.generate_normals.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        lib.obj_count.restype = ctypes.c_int64
        lib.obj_count.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        lib.obj_parse.restype = ctypes.c_int64
        lib.obj_parse.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32)]
        lib.bvh_build.restype = ctypes.c_int64
        lib.bvh_build.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def weld_remap(positions: np.ndarray, tolerance: float = 1e-5
               ) -> Tuple[int, np.ndarray]:
    """(unique_count, remap) — native grid-hash weld with NumPy fallback."""
    positions = np.ascontiguousarray(positions, np.float32)
    n = len(positions)
    lib = _load()
    if lib is not None:
        remap = np.empty(n, np.int32)
        unique = lib.weld_vertices(_fptr(positions), n,
                                   ctypes.c_float(tolerance), _iptr(remap))
        return int(unique), remap
    key = np.round(positions / tolerance).astype(np.int64)
    _, first, inverse = np.unique(key, axis=0, return_index=True,
                                  return_inverse=True)
    return len(first), inverse.astype(np.int32)


def compute_normals(positions: np.ndarray, indices: np.ndarray) -> np.ndarray:
    positions = np.ascontiguousarray(positions, np.float32)
    indices = np.ascontiguousarray(indices, np.int32)
    lib = _load()
    if lib is not None:
        out = np.empty_like(positions)
        lib.generate_normals(_fptr(positions), len(positions),
                             _iptr(indices), len(indices), _fptr(out))
        return out
    fn = np.cross(positions[indices[:, 1]] - positions[indices[:, 0]],
                  positions[indices[:, 2]] - positions[indices[:, 0]])
    out = np.zeros_like(positions)
    for k in range(3):
        np.add.at(out, indices[:, k], fn)
    ln = np.linalg.norm(out, axis=-1, keepdims=True)
    return (out / np.maximum(ln, 1e-12)).astype(np.float32)


def bvh_build_arrays(lo: np.ndarray, hi: np.ndarray, cent: np.ndarray,
                     leaf_size: int):
    """Native median-split BVH build (native/mesh_ops.cpp bvh_build).

    lo/hi/cent: (T, 3) triangle AABBs + centroids (float64).  Returns
    (node_min f32, node_max f32, node_first i32, node_count i32,
    node_miss i32, perm i64) in the exact layout render/bvh.py expects
    (DFS pre-order, skip links, leaf-order permutation), or None when the
    native library is unavailable (caller falls back to the NumPy builder)."""
    lib = _load()
    t = len(lo)
    if lib is None or t == 0:
        return None
    lo = np.ascontiguousarray(lo, np.float64)
    hi = np.ascontiguousarray(hi, np.float64)
    cent = np.ascontiguousarray(cent, np.float64)
    cap = 2 * t + 3
    node_min = np.empty((cap, 3), np.float32)
    node_max = np.empty((cap, 3), np.float32)
    node_first = np.empty(cap, np.int32)
    node_count = np.empty(cap, np.int32)
    node_miss = np.empty(cap, np.int32)
    perm = np.empty(t, np.int64)

    def dptr(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))

    n = lib.bvh_build(
        dptr(lo), dptr(hi), dptr(cent), t, leaf_size, cap,
        _fptr(node_min), _fptr(node_max), _iptr(node_first),
        _iptr(node_count), _iptr(node_miss),
        perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if n < 0:
        return None
    return (node_min[:n].copy(), node_max[:n].copy(), node_first[:n].copy(),
            node_count[:n].copy(), node_miss[:n].copy(), perm)


def parse_obj_geometry(text: str) -> Tuple[np.ndarray, np.ndarray]:
    """Fast positions+triangles scan of OBJ text (native two-pass parser;
    full material-aware loading stays in loaders.load_obj)."""
    lib = _load()
    data = text.encode()
    if lib is not None:
        nv = ctypes.c_int64()
        nt = ctypes.c_int64()
        lib.obj_count(data, len(data), ctypes.byref(nv), ctypes.byref(nt))
        pos = np.empty((nv.value, 3), np.float32)
        idx = np.empty((nt.value, 3), np.int32)
        lib.obj_parse(data, len(data), _fptr(pos), _iptr(idx))
        return pos, idx
    # Fallback: the Python loader.
    import io

    positions, tris = [], []
    for line in text.splitlines():
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "v":
            positions.append([float(x) for x in parts[1:4]])
        elif parts[0] == "f":
            ids = [int(v.split("/")[0]) - 1 for v in parts[1:]]
            for k in range(1, len(ids) - 1):
                tris.append([ids[0], ids[k], ids[k + 1]])
    return (np.asarray(positions, np.float32), np.asarray(tris, np.int32))
