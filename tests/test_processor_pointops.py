import numpy as np

from cpd_tpu.datasets.processor import DataProcessor
from cpd_tpu.datasets.point_ops import (
    box_cut, la_sampling, radius_sampling, random_drop_out, remove_past,
)


def _data(n=1000, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-30, 30, (n, 5)).astype(np.float32)
    boxes = np.array([[0, 0, 0, 4, 2, 2, 0.3], [50, 50, 0, 4, 2, 2, 0.0]], np.float32)
    return {"points": pts, "points1": pts.copy(), "gt_boxes": boxes,
            "gt_names": np.asarray(["Vehicle", "Vehicle"])}


def test_processor_queue():
    cfgs = [
        {"NAME": "mask_points_and_boxes_outside_range", "REMOVE_OUTSIDE_BOXES": True},
        {"NAME": "shuffle_points", "SHUFFLE_ENABLED": {"train": True, "test": False}},
        {"NAME": "sample_points", "NUM_POINTS": {"train": 256, "test": 256}},
        {"NAME": "transform_points_to_voxels", "VOXEL_SIZE": [0.1, 0.1, 0.15]},
    ]
    proc = DataProcessor(cfgs, [-20, -20, -2, 20, 20, 4], training=True)
    out = proc(_data(), np.random.default_rng(0))
    assert len(out["points"]) == 256
    assert len(out["points1"]) == 256
    assert len(out["gt_boxes"]) == 1  # far box removed
    assert proc.voxel_cfg["VOXEL_SIZE"] == [0.1, 0.1, 0.15]
    assert np.abs(out["points"][:, :2]).max() <= 20.0


def test_box_cut():
    pts = np.array([[0, 0, 0, 0, 0], [10, 10, 10, 0, 0]], np.float32)
    boxes = np.array([[0, 0, 0, 2, 2, 2, 0.0]], np.float32)
    inside, outside = box_cut(pts, boxes)
    assert len(inside) == 1 and len(outside) == 1


def test_la_and_radius_sampling_reduce_points():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-40, 40, (5000, 5)).astype(np.float32)
    assert 0 < len(la_sampling(pts)) < 5000
    assert 0 < len(radius_sampling(pts)) < 5000
    assert 0 < len(random_drop_out(pts, 0.9, rng)) < 5000


def test_remove_past():
    pts = np.array([[0, 0, 0, 0, 0], [100, 0, 0, 0, 0]], np.float32)
    boxes = np.array([[0, 0, 0, 2, 2, 2, 0.0], [100, 0, 0, 4, 4, 4, 0.0]], np.float32)
    names = np.asarray(["Vehicle", "Vehicle"])
    p2, b2, n2 = remove_past(pts, boxes, names)
    assert len(b2) == 1 and len(p2) == 1
