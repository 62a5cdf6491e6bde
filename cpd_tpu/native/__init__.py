"""ctypes bindings for the native host library (with NumPy fallbacks).

Builds ``libcpd_native.so`` from src/pointcloud.cpp on first import (g++ -O3)
and exposes the hot host-side kernels used by the data pipeline and the
pseudo-label factory. Every entry point has a pure-NumPy fallback so the
framework works without a toolchain (tests assert both paths agree).
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent / "src" / "pointcloud.cpp"
_LIB = Path(__file__).parent / "libcpd_native.so"
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             str(_SRC), "-o", str(_LIB)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(str(_LIB))
        lib.points_in_boxes_first.restype = None
        lib.points_in_boxes_mask.restype = None
        lib.rigid_transform.restype = None
        lib.decode_waymo_points.restype = ctypes.c_int64
        lib.voxel_downsample.restype = ctypes.c_int64
        lib.radius_neighbor_count.restype = None
        _lib = lib
    except Exception:
        _lib = False
    return _lib


def available() -> bool:
    return bool(_load())


def _f32(a):
    return np.ascontiguousarray(a, dtype=np.float32)


def points_in_boxes_first(points: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """(N, 3+), (M, 7) -> (N,) int32 index of first containing box or -1."""
    lib = _load()
    points = _f32(points)
    boxes = _f32(boxes[:, :7]) if len(boxes) else np.zeros((0, 7), np.float32)
    n, m = len(points), len(boxes)
    if not lib or m == 0:
        from ..datasets.box_np import points_in_boxes_mask_np

        if m == 0:
            return np.full(n, -1, np.int32)
        mask = points_in_boxes_mask_np(points, boxes)
        hit = mask.any(axis=0)
        return np.where(hit, mask.argmax(axis=0), -1).astype(np.int32)
    out = np.empty(n, np.int32)
    lib.points_in_boxes_first(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, points.shape[1],
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), m,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def points_in_boxes_mask(points: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """(N, 3+), (M, 7) -> (M, N) bool."""
    lib = _load()
    points = _f32(points)
    boxes = _f32(boxes[:, :7]) if len(boxes) else np.zeros((0, 7), np.float32)
    n, m = len(points), len(boxes)
    if not lib or m == 0:
        from ..datasets.box_np import points_in_boxes_mask_np

        return points_in_boxes_mask_np(points, boxes)
    out = np.empty((m, n), np.uint8)
    lib.points_in_boxes_mask(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, points.shape[1],
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), m,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out.astype(bool)


def rigid_transform(points: np.ndarray, pose: np.ndarray) -> np.ndarray:
    """(N, 3+) x (4, 4) -> (N, 3+) with xyz transformed, extras copied."""
    lib = _load()
    points = _f32(points)
    if not lib or len(points) == 0:
        from ..unsupervised.ppscore import points_rigid_transform

        return points_rigid_transform(points, pose)
    out = points.copy()
    pose = _f32(pose).ravel()
    lib.rigid_transform(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(points), points.shape[1],
        pose.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.shape[1])
    return out


def decode_waymo_points(raw: np.ndarray) -> np.ndarray:
    """(N, 6) raw -> (K, 5) NLZ-filtered with tanh intensity."""
    lib = _load()
    raw = _f32(raw)
    if not lib:
        pts = raw[raw[:, 5] == -1][:, :5].copy()
        pts[:, 3] = np.tanh(pts[:, 3])
        return pts
    out = np.empty((len(raw), 5), np.float32)
    k = lib.decode_waymo_points(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(raw),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out[:k]


def voxel_downsample(points: np.ndarray, voxel: float = 0.1) -> np.ndarray:
    """First-point-per-voxel dedup; returns the kept subset (order preserved)."""
    lib = _load()
    points = _f32(points)
    if not lib or len(points) == 0:
        from ..unsupervised.outline import voxel_sampling

        return voxel_sampling(points, voxel)
    idx = np.empty(len(points), np.int32)
    k = lib.voxel_downsample(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(points),
        points.shape[1], ctypes.c_float(voxel),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return points[idx[:k]]


def radius_neighbor_count(query: np.ndarray, support: np.ndarray, radius: float) -> np.ndarray:
    """(N, 3), (M, 3) -> (N,) neighbor counts within radius (spatial hash)."""
    lib = _load()
    query = _f32(query[:, :3])
    support = _f32(support[:, :3])
    if not lib:
        from scipy.spatial import cKDTree

        return np.asarray(
            cKDTree(support).query_ball_point(query, r=radius, return_length=True),
            np.int32,
        )
    out = np.empty(len(query), np.int32)
    lib.radius_neighbor_count(
        query.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(query),
        support.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(support),
        ctypes.c_float(radius),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out
