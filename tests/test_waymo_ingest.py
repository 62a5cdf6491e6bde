"""TF-free coverage of the raw-Waymo ingestion helpers (waymo_utils.py).

The TF decode itself needs waymo_open_dataset (absent here); everything
else -- the on-disk layout, the both-returns concatenation, the per-point
NLZ filter semantics the dataset consumer applies, the no-label-zone and
info structures, pose/intrinsic math, and the difficulty backfill -- is
pure NumPy and exercised against fixtures mirroring the reference
(cpd/datasets/waymo_unsupervised/waymo_utils.py:148-169,196-203,316-325 and
waymo_unsupervised_dataset.py:137-144)."""
import types

import numpy as np
import pytest

from cpd_tpu.datasets import waymo_utils as wu


def _fake_laser(n, nlz_val=-1.0, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "xyz": rng.normal(0, 10, (n, 3)).astype(np.float32),
        "intensity": rng.uniform(0, 3, n).astype(np.float32),
        "elongation": rng.uniform(0, 1, n).astype(np.float32),
        "nlz": np.full(n, nlz_val, np.float32),
    }


def test_assemble_return_points_layout_and_counts():
    lasers = [_fake_laser(5, seed=0), _fake_laser(3, nlz_val=2.0, seed=1),
              _fake_laser(0, seed=2)]
    pts, counts = wu.assemble_return_points(lasers)
    assert pts.shape == (8, 6)
    assert counts == [5, 3, 0]
    # column layout [x y z intensity elongation NLZ]
    np.testing.assert_allclose(pts[:5, :3], lasers[0]["xyz"])
    np.testing.assert_allclose(pts[:5, 3], lasers[0]["intensity"])
    np.testing.assert_allclose(pts[:5, 4], lasers[0]["elongation"])
    np.testing.assert_allclose(pts[:5, 5], -1.0)
    np.testing.assert_allclose(pts[5:, 5], 2.0)


def test_assemble_save_points_both_returns_fp16():
    r0, _ = wu.assemble_return_points([_fake_laser(4, seed=3)])
    r1, _ = wu.assemble_return_points([_fake_laser(2, seed=4)])
    saved = wu.assemble_save_points(r0, r1)
    assert saved.dtype == np.float16
    assert saved.shape == (6, 6)  # first-return rows then second-return rows
    np.testing.assert_allclose(saved[:4], r0.astype(np.float16))
    np.testing.assert_allclose(saved[4:], r1.astype(np.float16))


def test_nlz_filter_semantics():
    """Points with NLZ >= 0 (inside a no-label zone) are dropped; only the
    -1 sentinel survives; intensity is tanh-squashed
    (waymo_unsupervised_dataset.py:141-143)."""
    pts = np.zeros((4, 6), np.float32)
    pts[:, 3] = [0.5, 2.0, 0.1, 3.0]  # intensity
    pts[:, 5] = [-1, 0, -1, 3]  # NLZ: two zone-flagged rows
    out = wu.nlz_filter_points(pts)
    assert out.shape == (2, 5)
    np.testing.assert_allclose(out[:, 3], np.tanh([0.5, 0.1]), rtol=1e-6)


def test_saved_layout_roundtrips_through_dataset_get_lidar(tmp_path):
    """Producer (save layout) -> consumer (get_lidar) agreement: the
    dataset's own loader must see exactly nlz_filter_points' output."""
    from cpd_tpu.config import ConfigDict
    from cpd_tpu.datasets.waymo_unsupervised import WaymoUnsupervisedDataset

    r0, _ = wu.assemble_return_points([_fake_laser(64, seed=5)])
    r1, _ = wu.assemble_return_points([_fake_laser(32, nlz_val=1.0, seed=6)])
    saved = wu.assemble_save_points(r0, r1)
    seq = "segment-test"
    (tmp_path / seq).mkdir(parents=True)
    np.save(tmp_path / seq / "0000.npy", saved)

    ds = WaymoUnsupervisedDataset.__new__(WaymoUnsupervisedDataset)
    ds.data_path = tmp_path
    got = ds.get_lidar(seq, 0)
    want = wu.nlz_filter_points(saved.astype(np.float32))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert len(got) == 64  # the second return was entirely zone-flagged


def test_build_no_label_zone_list_structure():
    zones = [types.SimpleNamespace(id=7, x=[0.0, 1.0, 1.0], y=[0.0, 0.0, 1.0]),
             types.SimpleNamespace(id=9, x=[5.0], y=[6.0])]
    out = wu.build_no_label_zone_list(zones)
    assert out == [{7: [[0.0, 1.0, 1.0], [0.0, 0.0, 1.0]]},
                   {9: [[5.0], [6.0]]}]


def test_pose_and_intrinsic_math():
    t = np.arange(16, dtype=np.float64)
    pose = wu.pose_from_transform(t)
    assert pose.shape == (4, 4) and pose.dtype == np.float32
    assert pose[1, 2] == 6.0  # row-major
    iw = np.array([100.0, 110.0, 320.0, 240.0, 0, 0, 0, 0, 0], np.float32)
    K = wu.camera_intrinsic_matrix(iw)
    assert K.shape == (3, 4)
    assert K[0, 0] == 100.0 and K[1, 1] == 110.0
    assert K[0, 2] == 320.0 and K[1, 2] == 240.0 and K[2, 2] == 1.0


def _fake_label(cls=1, npts=10, lvl=0, seed=0):
    rng = np.random.default_rng(seed)
    box = types.SimpleNamespace(
        center_x=1.0, center_y=2.0, center_z=0.5,
        length=4.0, width=2.0, height=1.5, heading=0.3)
    return types.SimpleNamespace(
        box=box, type=cls, num_lidar_points_in_box=npts,
        detection_difficulty_level=lvl, id=f"obj{seed}")


def test_generate_labels_difficulty_backfill():
    """Unset difficulty (0) becomes L2 iff <= 5 points, else stays 0 (the
    estimator backfills >5-point unknowns to L1 downstream); explicit levels
    pass through (reference generate_labels :56-61)."""
    labels = [_fake_label(npts=3, lvl=0, seed=0),   # sparse unknown -> 2
              _fake_label(npts=50, lvl=0, seed=1),  # dense unknown -> stays 0
              _fake_label(npts=2, lvl=1, seed=2)]   # explicit L1 kept
    annos = wu.generate_labels_from(labels)
    np.testing.assert_array_equal(annos["difficulty"], [2, 0, 1])
    assert annos["gt_boxes_lidar"].shape == (3, 7)
    np.testing.assert_allclose(annos["gt_boxes_lidar"][0],
                               [1.0, 2.0, 0.5, 4.0, 2.0, 1.5, 0.3])
    assert list(annos["name"]) == ["Vehicle"] * 3
    np.testing.assert_array_equal(annos["num_points_in_gt"], [3, 50, 2])


def test_build_frame_info_schema():
    info = wu.build_frame_info(
        "segment-x", 20, np.eye(4, dtype=np.float32),
        {"name": np.array([])}, [10, 2, 3, 4, 5], [1, 0, 0, 0, 0],
        "ctx", 123456, [{1: [[0.0], [0.0]]}])
    assert info["frame_id"] == "segment-x_020"
    assert info["point_cloud"] == {"num_features": 5,
                                   "lidar_sequence": "segment-x",
                                   "sample_idx": 20}
    assert info["num_points_of_each_lidar_0"] == [10, 2, 3, 4, 5]
    assert info["num_points_of_each_lidar_1"] == [1, 0, 0, 0, 0]
    assert info["context_name"] == "ctx"
    assert info["timestamp_micros"] == 123456
    assert info["no_label_zone_list"] == [{1: [[0.0], [0.0]]}]
    assert "annos" in info


def test_ingestion_requires_waymo_package():
    if wu.HAVE_WAYMO:  # pragma: no cover
        pytest.skip("waymo_open_dataset present")
    with pytest.raises(ImportError, match="waymo_open_dataset"):
        wu.process_single_sequence("/nonexistent.tfrecord", "/tmp/out")
