"""Unit tests for the TF-free half of the official-WOD metric adapter
(evaluation/waymo_official.py) against hand-computed fixtures mirroring
waymo_eval.py:26-87 (flatten + difficulty backfill), :169-176 (100 m +0.5
slack mask) and the heading limit. The TF half stays import-gated."""
import numpy as np

from cpd_tpu.evaluation.waymo_official import (
    WAYMO_CLASSES, _limit_period, distance_mask, flatten_annos,
)


def test_limit_period_wraps_to_pm_pi():
    vals = np.array([0.0, np.pi, -np.pi, 3 * np.pi, -2.5 * np.pi, 0.3])
    out = _limit_period(vals, offset=0.5, period=2 * np.pi)
    assert np.all(out >= -np.pi) and np.all(out < np.pi)
    np.testing.assert_allclose(np.cos(out), np.cos(vals), atol=1e-12)
    np.testing.assert_allclose(np.sin(out), np.sin(vals), atol=1e-12)


def _gt_anno(names, boxes, npts, dif):
    return {"name": np.asarray(names),
            "gt_boxes_lidar": np.asarray(boxes, np.float64),
            "num_points_in_gt": np.asarray(npts),
            "difficulty": np.asarray(dif)}


def test_flatten_gt_backfill_and_zero_point_drop():
    """waymo_eval.py:44-50: unset difficulty becomes L1 when > 5 points else
    L2; zero-point gts are dropped; out-of-class names are dropped."""
    boxes = np.tile(np.array([[1.0, 2, 0.5, 4, 2, 1.5, 0.1]]), (5, 1))
    anno = _gt_anno(
        ["Vehicle", "Vehicle", "Vehicle", "Sign", "Vehicle"],
        boxes,
        npts=[10, 3, 0, 10, 7],
        dif=[0, 0, 0, 0, 2])
    fid, bx, typ, sc, dif = flatten_annos([anno], ["Vehicle"], is_gt=True)
    # row 2 (zero points) and row 3 (Sign) dropped
    assert len(bx) == 3
    np.testing.assert_array_equal(dif, [1, 2, 2])  # backfill 10->L1, 3->L2; explicit 2 kept
    np.testing.assert_array_equal(typ, [WAYMO_CLASSES.index("Vehicle")] * 3)
    np.testing.assert_array_equal(sc, [1.0, 1.0, 1.0])  # gt scores are 1
    np.testing.assert_array_equal(fid, [0, 0, 0])


def test_flatten_pred_passthrough_and_frame_ids():
    det0 = {"name": np.array(["Vehicle"]),
            "boxes_lidar": np.array([[0.0, 0, 0, 4, 2, 1.5, 4.0]]),
            "score": np.array([0.7])}
    det1 = {"name": np.array(["Cyclist", "Pedestrian"]),
            "boxes_lidar": np.array([[1.0, 1, 0, 2, 1, 1.8, -4.0],
                                     [2.0, 2, 0, 1, 1, 1.8, 0.0]]),
            "score": np.array([0.2, 0.9])}
    fid, bx, typ, sc, dif = flatten_annos([det0, det1],
                                          ["Vehicle", "Pedestrian", "Cyclist"],
                                          is_gt=False)
    np.testing.assert_array_equal(fid, [0, 1, 1])
    np.testing.assert_array_equal(sc, [0.7, 0.2, 0.9])
    np.testing.assert_array_equal(dif, [0, 0, 0])
    np.testing.assert_array_equal(
        typ, [WAYMO_CLASSES.index("Vehicle"), WAYMO_CLASSES.index("Cyclist"),
              WAYMO_CLASSES.index("Pedestrian")])
    # headings wrapped into [-pi, pi)
    assert np.all(bx[:, 6] >= -np.pi) and np.all(bx[:, 6] < np.pi)
    np.testing.assert_allclose(np.sin(bx[0, 6]), np.sin(4.0), atol=1e-12)


def test_distance_mask_100m_plus_half_slack():
    """waymo_eval.py:169-176: keep hypot(x, y) < thresh + 0.5."""
    boxes = np.zeros((4, 7))
    boxes[:, 0] = [99.0, 100.2, 100.6, 30.0]
    fid = np.arange(4)
    sc = np.linspace(0, 1, 4)
    b2, f2, s2 = distance_mask(boxes, fid, sc, thresh=100.0)
    np.testing.assert_array_equal(f2, [0, 1, 3])  # 100.6 >= 100.5 dropped
    assert len(b2) == 3 and len(s2) == 3


def test_official_available_is_false_here():
    from cpd_tpu.evaluation.waymo_official import official_available

    assert official_available() is False  # package absent in this image
