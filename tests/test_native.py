"""Native C++ host library vs NumPy fallbacks (both paths must agree)."""
import time

import numpy as np
import pytest

from cpd_tpu import native
from cpd_tpu.datasets.box_np import points_in_boxes_mask_np
from . import oracles


def test_native_builds():
    assert native.available(), "g++ build of libcpd_native.so failed"


def test_points_in_boxes_agree():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-30, 30, (5000, 5)).astype(np.float32)
    boxes = oracles.random_boxes(20, rng, span=25).astype(np.float32)
    got = native.points_in_boxes_mask(pts, boxes)
    want = points_in_boxes_mask_np(pts, boxes)
    assert (got == want).mean() > 0.9999
    first = native.points_in_boxes_first(pts, boxes)
    hit = want.any(axis=0)
    np.testing.assert_array_equal(first >= 0, hit)
    ok = first >= 0
    # the returned index must contain the point
    assert want[first[ok], np.where(ok)[0]].all()


def test_rigid_transform_agrees():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(1000, 5)).astype(np.float32)
    th = 0.7
    pose = np.eye(4, dtype=np.float32)
    pose[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    pose[:3, 3] = [1, 2, 3]
    got = native.rigid_transform(pts, pose)
    from cpd_tpu.unsupervised.ppscore import points_rigid_transform

    want = points_rigid_transform(pts, pose)
    np.testing.assert_allclose(got[:, :3], want[:, :3], atol=1e-4)
    np.testing.assert_allclose(got[:, 3:], pts[:, 3:], atol=0)


def test_decode_waymo_points():
    raw = np.zeros((100, 6), np.float32)
    raw[:, :3] = np.random.default_rng(2).normal(size=(100, 3))
    raw[:, 3] = 2.0
    raw[:, 5] = -1
    raw[::10, 5] = 1  # 10 NLZ points
    out = native.decode_waymo_points(raw)
    assert len(out) == 90
    np.testing.assert_allclose(out[:, 3], np.tanh(2.0), atol=1e-6)


def test_voxel_downsample():
    pts = np.array([[0, 0, 0], [0.01, 0.02, 0.03], [5, 5, 5]], np.float32)
    out = native.voxel_downsample(pts, 0.1)
    assert len(out) == 2


def test_radius_neighbor_count_agrees_with_kdtree():
    rng = np.random.default_rng(3)
    q = rng.uniform(-5, 5, (500, 3)).astype(np.float32)
    s = rng.uniform(-5, 5, (2000, 3)).astype(np.float32)
    got = native.radius_neighbor_count(q, s, 0.5)
    from scipy.spatial import cKDTree

    want = cKDTree(s).query_ball_point(q, r=0.5, return_length=True)
    # boundary floats may differ by one count occasionally
    assert (np.abs(got - want) <= 1).all()
    assert (got == want).mean() > 0.99


def test_native_speedup_points_in_boxes():
    if not native.available():
        pytest.skip("no native lib")
    rng = np.random.default_rng(4)
    pts = rng.uniform(-75, 75, (200_000, 5)).astype(np.float32)
    boxes = oracles.random_boxes(100, rng, span=70).astype(np.float32)
    t0 = time.perf_counter()
    native.points_in_boxes_first(pts, boxes)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    points_in_boxes_mask_np(pts[:20000], boxes)  # numpy on 1/10 of the data
    t_np = (time.perf_counter() - t0) * 10
    assert t_native < t_np, (t_native, t_np)
