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
# bbox and alpha fields are GEOMETRICALLY CONSISTENT with loc/dims/ry under
# CALIB (bbox = projected 3D box corners, alpha = ry - atan2(x, z)) so the
# camera-protocol eval path can be asserted exactly
LABEL = "Car 0.00 0 -1.5761 582.11 181.35 608.41 207.42 1.65 1.67 3.64 -0.65 1.71 46.70 -1.59\n" \
        "Pedestrian 0.00 1 0.1349 698.95 171.25 751.01 277.91 1.75 0.6 0.8 2.0 1.6 12.0 0.3\n" \
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


def test_prediction_dicts_carry_camera_protocol(kitti_root):
    """generate_prediction_dicts must emit bbox/alpha/location/dimensions/
    rotation_y from the REAL dataset path (kitti2waymo_dataset.py:247-307),
    and collect_gt_annos the matching gt fields, so the bbox-AP/AOS eval
    dimensions run without hand-built fixtures."""
    import jax.numpy as jnp

    ds = Kitti2WaymoDataset(dataset_cfg=_cfg(),
                            class_names=["Vehicle", "Pedestrian", "Cyclist"],
                            training=False, root_path=kitti_root)
    calib = ds.get_calib("000000")
    objs = [Object3d(l) for l in LABEL.splitlines()[:2]]
    gt_lidar = boxes_camera_to_lidar(objs, calib)
    # predictions = the two gts (Vehicle, Pedestrian) + one padding row
    boxes = np.zeros((1, 3, 7), np.float32)
    boxes[0, :2] = gt_lidar
    preds = {
        "pred_boxes": jnp.asarray(boxes),
        "pred_scores": jnp.asarray([[0.9, 0.8, 0.0]]),
        "pred_labels": jnp.asarray([[1, 2, 1]], dtype=np.int32),
        "pred_valid": jnp.asarray([[True, True, False]]),
    }
    batch = {"batch_size": 1, "frame_id": ["000000"]}
    out = ds.generate_prediction_dicts(batch, preds,
                                       ["Vehicle", "Pedestrian", "Cyclist"])
    rec = out[0]
    for k in ("bbox", "alpha", "location", "dimensions", "rotation_y"):
        assert k in rec, sorted(rec)
    assert rec["bbox"].shape == (2, 4)
    # projected bbox of the exact-gt Car must overlap the labeled 2D box
    gt2d = objs[0].box2d
    bb = rec["bbox"][0]
    ix = max(0, min(bb[2], gt2d[2]) - max(bb[0], gt2d[0]))
    iy = max(0, min(bb[3], gt2d[3]) - max(bb[1], gt2d[1]))
    inter = ix * iy
    area = (gt2d[2] - gt2d[0]) * (gt2d[3] - gt2d[1])
    assert inter / area > 0.5, (bb, gt2d)
    # alpha of the exact-gt boxes matches the KITTI geometry
    # (alpha = ry - atan2(x_cam, z_cam); the synthetic Pedestrian label's
    # alpha field is intentionally arbitrary, so compare against geometry)
    for i, o in enumerate(objs):
        want = o.ry - np.arctan2(o.loc[0], o.loc[2])
        da = (rec["alpha"][i] - want + np.pi) % (2 * np.pi) - np.pi
        assert abs(da) < 0.1, (i, rec["alpha"][i], want)

    gts = ds.collect_gt_annos()
    for k in ("bbox", "alpha", "truncated", "occluded"):
        assert k in gts[0], sorted(gts[0])

    # the full eval consumes them: 2d/aos results appear and the exact-match
    # Vehicle scores perfectly at every difficulty with a gt present
    from cpd_tpu.evaluation import kitti_style_eval

    _, res = kitti_style_eval(out, gts, ["Vehicle", "Pedestrian"])
    assert any("bbox" in k for k in res), sorted(res)
    assert any("aos" in k for k in res), sorted(res)
    # the Car gt's 26.8px bbox height fails the easy min-height gate (40px)
    # -- the camera-protocol difficulty gates are live from real label fields
    assert res["Vehicle_3d/easy_R40"] == 0.0, res
    assert res["Vehicle_3d/moderate_R40"] > 99.0, res
    assert res["Vehicle_aos/moderate_R40"] > 99.0, res
    assert res["Vehicle_bbox/moderate_R40"] > 99.0, res
