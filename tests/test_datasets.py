"""Data layer tests: augmentor math, template protocol, loader determinism."""
import numpy as np

from cpd_tpu.datasets.augmentor import (
    DataAugmentor, DataBaseSampler, TestAugmentor, WorldTransformParam,
    box_collision_test,
)
from cpd_tpu.datasets.dataset import DatasetTemplate, collate_batch
from cpd_tpu.datasets.loader import DataLoader
from cpd_tpu.datasets.box_np import points_in_boxes_mask_np


def _boxes(rows):
    return np.asarray(rows, np.float32)


def test_world_transform_roundtrip():
    rng = np.random.default_rng(0)
    boxes = np.zeros((10, 7), np.float32)
    boxes[:, :3] = rng.uniform(-10, 10, (10, 3))
    boxes[:, 3:6] = rng.uniform(1, 4, (10, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, 10)
    p = WorldTransformParam(flip_x=True, rot=0.5, scale=1.04, trans=(0.3, -0.2, 0.1))
    pts = rng.normal(size=(50, 5)).astype(np.float32)
    _, tb = p.apply(pts, boxes)
    back = p.inverse_boxes(tb)
    np.testing.assert_allclose(back[:, :6], boxes[:, :6], atol=1e-4)
    # heading equal modulo 2pi
    d = (back[:, 6] - boxes[:, 6]) % (2 * np.pi)
    d = np.minimum(d, 2 * np.pi - d)
    np.testing.assert_allclose(d, 0, atol=1e-4)


def test_transform_consistency_points_and_boxes():
    """Points inside a box must remain inside after any world transform."""
    rng = np.random.default_rng(1)
    box = _boxes([[2.0, -3.0, 0.5, 4.0, 2.0, 1.5, 0.7]])
    local = rng.uniform(-0.45, 0.45, (100, 3)) * box[0, 3:6]
    c, s = np.cos(box[0, 6]), np.sin(box[0, 6])
    pts = np.stack([
        local[:, 0] * c - local[:, 1] * s + box[0, 0],
        local[:, 0] * s + local[:, 1] * c + box[0, 1],
        local[:, 2] + box[0, 2],
    ], axis=1).astype(np.float32)
    for p in [
        WorldTransformParam(flip_x=True),
        WorldTransformParam(flip_y=True),
        WorldTransformParam(rot=1.1),
        WorldTransformParam(scale=1.05),
        WorldTransformParam(flip_x=True, flip_y=True, rot=-0.6, scale=0.97, trans=(1, 2, 3)),
    ]:
        tp, tb = p.apply(pts.copy(), box.copy())
        inside = points_in_boxes_mask_np(tp, tb)
        assert inside.all(), p.__dict__


def test_box_collision():
    a = _boxes([[0, 0, 0, 4, 2, 1, 0.0]])
    b = _boxes([[1, 0, 0, 4, 2, 1, 0.0], [10, 0, 0, 4, 2, 1, 0.4]])
    hit = box_collision_test(a, b)
    np.testing.assert_array_equal(hit, [[True, False]])


def test_database_sampler_pastes_and_avoids_collisions():
    db = {
        "Vehicle": [
            {"name": "Vehicle", "box3d_lidar": np.array([5.0, 5, 0, 4, 2, 1.5, 0.0]),
             "points": np.random.rand(30, 5).astype(np.float32) + np.array([5, 5, 0, 0, 0], np.float32),
             "num_points_in_gt": 30},
            {"name": "Vehicle", "box3d_lidar": np.array([0.5, 0, 0, 4, 2, 1.5, 0.0]),
             "points": np.random.rand(30, 5).astype(np.float32),
             "num_points_in_gt": 30},
        ]
    }
    sampler = DataBaseSampler(None, ["Vehicle"], {"Vehicle": 3}, min_points=5, db=db)
    pts = np.random.uniform(-10, 10, (500, 5)).astype(np.float32)
    gt = _boxes([[0, 0, 0, 4, 2, 1.5, 0.0]])
    names = np.asarray(["Vehicle"])
    new_pts, new_gt, new_names = sampler(pts, gt, names)
    # the colliding db entry (at 0.5,0) must be rejected; the far one accepted
    assert len(new_gt) == 2
    assert not box_collision_test(new_gt[1:2], gt).any()


class SyntheticDataset(DatasetTemplate):
    def __init__(self, n=16, **kw):
        super().__init__(**kw)
        self.n = n
        self._rng = np.random.default_rng(0)

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        rng = np.random.default_rng(idx)
        pts = rng.uniform(-20, 20, (3000, 5)).astype(np.float32)
        pts[:, 2] = rng.uniform(-2, 4, 3000)
        gt = np.zeros((4, 7), np.float32)
        gt[:, :2] = rng.uniform(-15, 15, (4, 2))
        gt[:, 3:6] = rng.uniform(1, 4, (4, 3))
        names = np.asarray(["Vehicle", "Pedestrian", "Cyclist", "Vehicle"])
        data = {"points": pts, "points1": pts.copy(), "gt_boxes": gt,
                "gt_names": names, "frame_id": idx, "sample_idx": idx,
                "css_score": rng.uniform(0.2, 1, 4).astype(np.float32)}
        return self.prepare_data(data)


def _tmpl_cfg():
    return {
        "POINT_CLOUD_RANGE": [-20, -20, -2, 20, 20, 4],
        "POINT_CAP": 4096,
        "GT_CAP": 16,
        "STAGES": 2,
        "POINT_FEATURE_ENCODING": {
            "used_feature_list": ["x", "y", "z", "intensity", "time"],
            "src_feature_list": ["x", "y", "z", "intensity", "time"],
        },
        "DATA_AUGMENTOR": {"AUG_CONFIG_LIST": [
            {"NAME": "random_world_flip", "ALONG_AXIS_LIST": ["x"]},
            {"NAME": "random_world_rotation", "WORLD_ROT_ANGLE": [-0.5, 0.5]},
            {"NAME": "random_world_scaling", "WORLD_SCALE_RANGE": [0.95, 1.05]},
        ]},
    }


def test_template_protocol_shapes():
    ds = SyntheticDataset(dataset_cfg=_tmpl_cfg(), class_names=["Vehicle", "Pedestrian", "Cyclist"], training=True)
    s = ds[0]
    assert s["points"].shape == (4096, 5)
    assert s["points1"].shape == (4096, 5)
    assert s["gt_boxes"].shape == (16, 8)
    assert s["gt_valid"].sum() == 4
    assert set(np.asarray(s["gt_boxes"][s["gt_valid"], 7], int)) <= {1, 2, 3}
    assert (s["css_score"][s["gt_valid"]] > 0).all()


def test_collate_and_loader():
    ds = SyntheticDataset(dataset_cfg=_tmpl_cfg(), class_names=["Vehicle"], training=True)
    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == 4
    b = batches[0]
    assert b["points"].shape == (4, 4096, 5)
    assert b["batch_size"] == 4
    # determinism per epoch (fresh dataset instance: augmentor rng is stateful)
    ds2 = SyntheticDataset(dataset_cfg=_tmpl_cfg(), class_names=["Vehicle"], training=True)
    loader2 = DataLoader(ds2, batch_size=4, shuffle=True, seed=1)
    b2 = next(iter(loader2))
    np.testing.assert_array_equal(b["points"], b2["points"])


def test_loader_world_sharding():
    ds = SyntheticDataset(dataset_cfg=_tmpl_cfg(), class_names=["Vehicle"], training=False)
    l0 = DataLoader(ds, 2, world_size=2, rank=0, drop_last=False)
    l1 = DataLoader(ds, 2, world_size=2, rank=1, drop_last=False)
    ids0 = [s for b in l0 for s in b["frame_id"]]
    ids1 = [s for b in l1 for s in b["frame_id"]]
    assert sorted(ids0 + ids1) == list(range(16))


def test_tta_roundtrip():
    tta = TestAugmentor({"AUG_CONFIG_LIST": [
        {"NAME": "world_flip", "ALONG_AXIS_LIST": ["x"]},
        {"NAME": "world_rotation", "WORLD_ROT_ANGLE": [0.3]},
    ]}, test_iter=1)
    boxes = _boxes([[1, 2, 0, 4, 2, 1.5, 0.3]])
    data = {"points": np.random.rand(10, 5).astype(np.float32), "gt_boxes": boxes.copy()}
    out = tta.forward(data)
    back = tta.backward(out["gt_boxes"])
    np.testing.assert_allclose(back[:, :6], boxes[:, :6], atol=1e-5)


def test_local_augmentations():
    from cpd_tpu.datasets.augmentor import (
        noise_per_object, local_pyramid_dropout, random_local_flip, DADataBaseSampler,
    )
    from cpd_tpu.datasets.box_np import points_in_boxes_mask_np

    rng = np.random.default_rng(0)
    box = _boxes([[0.0, 0, 0, 4, 2, 2, 0.2]])
    local = rng.uniform(-0.4, 0.4, (200, 3)) * box[0, 3:6]
    c, s = np.cos(box[0, 6]), np.sin(box[0, 6])
    pts = np.stack([local[:, 0] * c - local[:, 1] * s, local[:, 0] * s + local[:, 1] * c,
                    local[:, 2]], 1).astype(np.float32)
    pts = np.concatenate([pts, rng.uniform(-20, 20, (300, 3)).astype(np.float32)])
    p2, b2 = noise_per_object(pts, box.copy(), rng)
    # object points moved WITH the box: still inside
    inside = points_in_boxes_mask_np(p2[:200], b2)
    assert inside.mean() > 0.95
    p3 = local_pyramid_dropout(pts, box, np.random.default_rng(1), prob=1.0)
    assert len(p3) < len(pts)
    p4 = random_local_flip(pts, box, np.random.default_rng(2), prob=1.0)
    inside2 = points_in_boxes_mask_np(p4[:200], box)
    assert inside2.mean() > 0.95

    db = {"Vehicle": [{"name": "Vehicle", "box3d_lidar": np.array([30.0, 0, 0, 4, 2, 1.5, 0.0]),
                       "points": rng.uniform(28, 32, (200, 5)).astype(np.float32),
                       "num_points_in_gt": 200}]}
    da = DADataBaseSampler(None, ["Vehicle"], {"Vehicle": 1}, db=db)
    _, gb, _ = da(pts[:, :3].repeat(1, 0) if False else np.concatenate([pts, np.zeros((len(pts), 2), np.float32)], 1),
                  np.zeros((0, 7), np.float32), np.asarray([]))
    assert len(gb) == 1
