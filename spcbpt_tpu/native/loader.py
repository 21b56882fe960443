"""ctypes loader for the native C++ runtime pieces.

The hot host-side loops of the reference (SAH BVH build standing in for OptiX
GAS builds, OBJ parsing standing in for tiny_obj_loader, octree classifier
build from classTree_host.h) are implemented in C++ (see *.cpp here) and
compiled on first use with g++. Everything has a numpy fallback, so the
framework works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build() -> str | None:
    so = os.path.join(_DIR, "libspcbpt_native.so")
    srcs = [os.path.join(_DIR, f) for f in
            ("bvh_builder.cpp", "obj_loader.cpp", "classtree.cpp")
            if os.path.exists(os.path.join(_DIR, f))]
    if not srcs:
        return None
    newest_src = max(os.path.getmtime(s) for s in srcs)
    if os.path.exists(so) and os.path.getmtime(so) >= newest_src:
        return so
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", so] + srcs
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        return so
    except Exception:
        return None


def get_lib():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so = _build()
        if so is None:
            return None
        try:
            _LIB = ctypes.CDLL(so)
        except OSError:
            _LIB = None
        return _LIB


def native_build_bvh(tri_p0, tri_e1, tri_e2, leaf_size: int):
    """Returns FlatBVH or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "bvh_build"):
        return None
    from ..ops.bvh import FlatBVH

    t = len(tri_p0)
    p0 = np.ascontiguousarray(tri_p0, np.float32)
    e1 = np.ascontiguousarray(tri_e1, np.float32)
    e2 = np.ascontiguousarray(tri_e2, np.float32)
    max_nodes = max(2 * t + 2, 8)
    bmin = np.zeros((max_nodes, 3), np.float32)
    bmax = np.zeros((max_nodes, 3), np.float32)
    skip = np.zeros(max_nodes, np.int32)
    leaf_start = np.zeros(max_nodes, np.int32)
    leaf_count = np.zeros(max_nodes, np.int32)
    order = np.zeros(t, np.int64)
    out_depth = np.zeros(1, np.int32)

    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)

    n_nodes = lib.bvh_build(
        p0.ctypes.data_as(f32p), e1.ctypes.data_as(f32p),
        e2.ctypes.data_as(f32p), ctypes.c_int32(t), ctypes.c_int32(leaf_size),
        bmin.ctypes.data_as(f32p), bmax.ctypes.data_as(f32p),
        skip.ctypes.data_as(i32p), leaf_start.ctypes.data_as(i32p),
        leaf_count.ctypes.data_as(i32p), order.ctypes.data_as(i64p),
        out_depth.ctypes.data_as(i32p))
    if n_nodes <= 0:
        return None
    return FlatBVH(bounds_min=bmin[:n_nodes], bounds_max=bmax[:n_nodes],
                   skip=skip[:n_nodes], leaf_start=leaf_start[:n_nodes],
                   leaf_count=leaf_count[:n_nodes], order=order,
                   max_depth=int(out_depth[0]))


def native_load_obj(path: str):
    """Returns MeshData or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "obj_count"):
        return None
    from ..scene.obj import MeshData

    lib.obj_count.restype = ctypes.c_int64
    lib.obj_load.restype = ctypes.c_int64
    pb = path.encode()
    t = lib.obj_count(ctypes.c_char_p(pb))
    if t < 0:
        return None
    pos = np.zeros((t, 3, 3), np.float32)
    nrm = np.zeros((t, 3, 3), np.float32)
    uv = np.zeros((t, 3, 2), np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    got = lib.obj_load(ctypes.c_char_p(pb), pos.ctypes.data_as(f32p),
                       nrm.ctypes.data_as(f32p), uv.ctypes.data_as(f32p))
    if got != t:
        return None
    return MeshData(positions=pos, normals=nrm, uvs=uv)
