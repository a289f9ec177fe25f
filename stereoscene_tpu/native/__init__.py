"""ctypes bindings for the native host kernels (kitti_host.cc).

The library is built on demand (g++ -O3) and cached next to the source; all
entry points degrade gracefully to numpy implementations in
data/preprocess.py and data/pipeline.py when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "kitti_host.cc")
_LIB_PATH = os.path.join(_DIR, "libkitti_host.so")
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
             "-o", _LIB_PATH],
            check=True, capture_output=True,
        )
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_LIB_PATH) or (
        os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
    ):
        if not _build():
            _load_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _load_failed = True
        return None

    i64 = ctypes.c_int64
    i32 = ctypes.c_int32
    p = np.ctypeslib.ndpointer
    lib.unpack_remap_labels.argtypes = [
        p(np.uint16), p(np.uint8), p(np.int32), i64, p(np.uint8)]
    lib.majority_downsample.argtypes = [
        p(np.uint8), i64, i64, i64, i64, p(np.uint8)]
    lib.scatter_depth.argtypes = [
        p(np.float32), ctypes.c_void_p, i64, i64, i64, p(np.float32),
        ctypes.c_void_p]
    lib.point_majority_vote.argtypes = [
        p(np.int32), p(np.int32), i64, i64, i64, i64, i32, p(np.int32),
        p(np.uint8)]
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def unpack_remap_labels(labels: np.ndarray, invalid_packed: np.ndarray,
                        lut: np.ndarray) -> np.ndarray:
    lib = load()
    assert lib is not None
    labels = np.ascontiguousarray(labels, np.uint16)
    invalid_packed = np.ascontiguousarray(invalid_packed, np.uint8)
    lut = np.ascontiguousarray(lut, np.int32)
    out = np.empty(labels.shape[0], np.uint8)
    lib.unpack_remap_labels(labels, invalid_packed, lut, labels.shape[0], out)
    return out


def majority_downsample(grid: np.ndarray, k: int) -> np.ndarray:
    lib = load()
    assert lib is not None
    grid = np.ascontiguousarray(grid, np.uint8)
    x, y, z = grid.shape
    out = np.empty((x // k, y // k, z // k), np.uint8)
    lib.majority_downsample(grid, x, y, z, k, out)
    return out


def scatter_depth(uvd: np.ndarray, h: int, w: int,
                  seg: Optional[np.ndarray] = None):
    lib = load()
    assert lib is not None
    uvd = np.ascontiguousarray(uvd, np.float32)
    depth = np.empty((h, w), np.float32)
    if seg is not None:
        seg = np.ascontiguousarray(seg, np.float32)
        seg_out = np.empty((h, w), np.float32)
        lib.scatter_depth(
            uvd, seg.ctypes.data_as(ctypes.c_void_p), uvd.shape[0], h, w,
            depth, seg_out.ctypes.data_as(ctypes.c_void_p),
        )
        return depth, seg_out
    lib.scatter_depth(uvd, None, uvd.shape[0], h, w, depth, None)
    return depth


def point_majority_vote(coords: np.ndarray, labels: np.ndarray,
                        grid_shape, num_classes: int = 20) -> np.ndarray:
    lib = load()
    assert lib is not None
    coords = np.ascontiguousarray(coords, np.int32)
    labels = np.ascontiguousarray(labels, np.int32)
    x, y, z = grid_shape
    scratch = np.zeros((x * y * z * num_classes,), np.int32)
    out = np.empty((x * y * z,), np.uint8)
    lib.point_majority_vote(coords, labels, coords.shape[0], x, y, z,
                            num_classes, scratch, out)
    return out.reshape(x, y, z)
