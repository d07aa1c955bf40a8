"""ctypes bindings for the C++ host data plane (src/dataplane.cpp).

Builds the shared library on first import if missing (g++ -O3); every entry
point has a pure-Python fallback in plr2_tpu/data, so the package works
without a toolchain. `available()` reports whether the native path loaded.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "dataplane.cpp")
_LIB = os.path.join(_DIR, "libplr2_dataplane.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _LIB],
            check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None

    lib.plr2_snap_bbox.argtypes = [ctypes.c_int] * 6 + [
        ctypes.POINTER(ctypes.c_int)]
    lib.plr2_mask_bbox_choose.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_uint64, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int32)]
    lib.plr2_mask_bbox_choose.restype = ctypes.c_int
    lib.plr2_mask_bbox.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int)]
    lib.plr2_mask_bbox.restype = ctypes.c_int
    lib.plr2_choose_in_bbox.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_uint64, ctypes.POINTER(ctypes.c_int32)]
    lib.plr2_choose_in_bbox.restype = ctypes.c_int
    lib.plr2_backproject.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.POINTER(ctypes.c_float)]
    lib.plr2_parse_ply.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    lib.plr2_parse_ply.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def snap_bbox(rmin: int, rmax: int, cmin: int, cmax: int,
              img_h: int = 480, img_w: int = 640) -> Tuple[int, int, int, int]:
    lib = _load()
    out = (ctypes.c_int * 4)()
    lib.plr2_snap_bbox(rmin, rmax, cmin, cmax, img_h, img_w, out)
    return out[0], out[1], out[2], out[3]


def mask_bbox_choose(mask: np.ndarray, num_points: int, seed: int = 0):
    """mask (H, W) bool -> (bbox (4,), choose (num_points,) int32, count)."""
    lib = _load()
    m = np.ascontiguousarray(mask, dtype=np.uint8)
    bbox = (ctypes.c_int * 4)()
    choose = np.empty(num_points, dtype=np.int32)
    count = lib.plr2_mask_bbox_choose(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        m.shape[0], m.shape[1], num_points, seed, bbox,
        choose.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return (bbox[0], bbox[1], bbox[2], bbox[3]), choose, count


def mask_bbox(mask: np.ndarray) -> Tuple[int, int, int, int]:
    """Snapped border-list bbox of `mask` alone (H, W) bool."""
    lib = _load()
    m = np.ascontiguousarray(mask, dtype=np.uint8)
    bbox = (ctypes.c_int * 4)()
    lib.plr2_mask_bbox(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        m.shape[0], m.shape[1], bbox)
    return bbox[0], bbox[1], bbox[2], bbox[3]


def choose_in_bbox(mask: np.ndarray, bbox: Tuple[int, int, int, int],
                   num_points: int, seed: int = 0):
    """Choose sampling of `mask` pixels inside a given bbox window ->
    (choose (num_points,) int32 crop-flat indices, count)."""
    lib = _load()
    m = np.ascontiguousarray(mask, dtype=np.uint8)
    choose = np.empty(num_points, dtype=np.int32)
    count = lib.plr2_choose_in_bbox(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        m.shape[0], m.shape[1], bbox[0], bbox[1], bbox[2], bbox[3],
        num_points, seed,
        choose.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return choose, count


def backproject(depth_crop: np.ndarray, choose: np.ndarray, crop_w: int,
                row0: int, col0: int, cx: float, cy: float, fx: float,
                fy: float, cam_scale: float) -> np.ndarray:
    lib = _load()
    d = np.ascontiguousarray(depth_crop, dtype=np.float32).reshape(-1)
    ch = np.ascontiguousarray(choose, dtype=np.int32)
    cloud = np.empty((len(ch), 3), dtype=np.float32)
    lib.plr2_backproject(
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ch.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(ch), crop_w, row0, col0, cx, cy, fx, fy, cam_scale,
        cloud.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return cloud


def parse_ply(path: str, max_pts: int = 300000) -> np.ndarray:
    lib = _load()
    out = np.empty((max_pts, 3), dtype=np.float32)
    n = lib.plr2_parse_ply(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_pts)
    if n < 0:
        raise IOError(f"failed to parse PLY {path!r}")
    return out[:n].copy()
