"""KITTI reader/converters on synthetic bin/calib/label files."""
import numpy as np
import pytest

from cpd_tpu.datasets.kitti import (
    Calibration, Kitti2WaymoDataset, Object3d, boxes_camera_to_lidar,
    boxes_lidar_to_camera, create_kitti_groundtruth_database, create_kitti_infos,
)

CALIB = """P0: 707.0 0 604.0 0 0 707.0 180.5 0 0 0 1.0 0
P2: 707.0 0 604.0 45.75 0 707.0 180.5 -0.34 0 0 1.0 0.005
R0_rect: 0.9999 0.0098 -0.0074 -0.0098 0.9999 -0.0043 0.0074 0.0043 0.9999
Tr_velo_to_cam: 0.0075 -0.9999 -0.0006 -0.0027 0.0029 0.0007 -0.9999 -0.0752 0.9999 0.0075 0.0029 -0.2721
"""
LABEL = "Car 0.00 0 -1.58 587.01 173.33 614.12 200.12 1.65 1.67 3.64 -0.65 1.71 46.70 -1.59\n" \
        "Pedestrian 0.00 1 0.5 100.0 150.0 130.0 250.0 1.75 0.6 0.8 2.0 1.6 12.0 0.3\n" \
        "DontCare -1 -1 -10 500 160 520 170 -1 -1 -1 -1000 -1000 -1000 -10\n"


@pytest.fixture
def kitti_root(tmp_path):
    for sub in ("velodyne", "calib", "label_2"):
        (tmp_path / "training" / sub).mkdir(parents=True)
    rng = np.random.default_rng(0)
    pts = np.concatenate([rng.uniform(0, 60, (5000, 1)), rng.uniform(-20, 20, (5000, 1)),
                          rng.uniform(-2, 2, (5000, 1)), rng.uniform(0, 1, (5000, 1))], 1).astype(np.float32)
    pts.tofile(tmp_path / "training" / "velodyne" / "000000.bin")
    (tmp_path / "training" / "calib" / "000000.txt").write_text(CALIB)
    (tmp_path / "training" / "label_2" / "000000.txt").write_text(LABEL)
    (tmp_path / "ImageSets").mkdir()
    (tmp_path / "ImageSets" / "train.txt").write_text("000000\n")
    return tmp_path


def _cfg():
    return {
        "POINT_CLOUD_RANGE": [0, -40, -3, 70.4, 40, 1],
        "POINT_CAP": 8192, "GT_CAP": 16, "STAGES": 2,
        "DATA_SPLIT": {"train": "train", "test": "train"},
        "POINT_FEATURE_ENCODING": {
            "used_feature_list": ["x", "y", "z", "intensity", "time"],
            "src_feature_list": ["x", "y", "z", "intensity", "time"],
        },
    }


def test_camera_lidar_roundtrip(kitti_root):
    calib = Calibration(kitti_root / "training" / "calib" / "000000.txt")
    objs = [Object3d(l) for l in LABEL.splitlines()[:2]]
    boxes = boxes_camera_to_lidar(objs, calib)
    assert boxes.shape == (2, 7)
    # the Car at camera (x~-0.65, z~46.7) should be ~46m ahead in lidar x
    assert 44 < boxes[0, 0] < 49
    loc, lwh, ry = boxes_lidar_to_camera(boxes, calib)
    np.testing.assert_allclose(loc[0], objs[0].loc, atol=0.05)
    np.testing.assert_allclose((ry[0] - objs[0].ry + np.pi) % (2 * np.pi) - np.pi, 0, atol=1e-4)


def test_dataset_getitem_and_builders(kitti_root, tmp_path):
    ds = Kitti2WaymoDataset(dataset_cfg=_cfg(), class_names=["Vehicle", "Pedestrian", "Cyclist"],
                            training=True, root_path=str(kitti_root))
    assert len(ds) == 1
    s = ds[0]
    assert s["points"].shape == (8192, 5)
    assert s["gt_valid"].sum() == 2
    infos = create_kitti_infos(ds, tmp_path / "infos.pkl")
    assert len(infos) == 1 and len(infos[0]["annos"]["name"]) == 2
    counts = create_kitti_groundtruth_database(ds, tmp_path / "db.pkl", min_points=1)
    assert isinstance(counts, dict)
