"""Pseudo-label factory tests on synthetic LiDAR scenes with known geometry."""
import numpy as np
import pytest

from cpd_tpu.unsupervised.ground import GroundSegmenter
from cpd_tpu.unsupervised.outline import (
    box_fit, box_fit_DGD, clustering, corner_align, get_box_cls,
    hierarchical_occupancy_score, KL_entropy_score, minimum_bounding_rectangle,
    voxel_sampling, smooth_points,
)
from cpd_tpu.unsupervised.tracker import Tracker3D, TrackSmooth
from cpd_tpu.unsupervised.ppscore import compute_ephe_score, ppscore_for_frame
from cpd_tpu.unsupervised.cproto import CProtoRefiner, CSS
from cpd_tpu.unsupervised.generators import DBSCANGenerator, MFCFGenerator


def box_surface_points(box, n=300, rng=None):
    """Sample points on the visible (sensor-facing) surfaces of a box."""
    rng = rng or np.random.default_rng(0)
    l, w, h = box[3:6]
    # two faces + top edge-ish band, like LiDAR sees
    xs = rng.uniform(-l / 2, l / 2, n)
    ys = np.full(n, -w / 2) + rng.normal(0, 0.02, n)
    zs = rng.uniform(-h / 2, h / 2, n)
    face1 = np.stack([xs, ys, zs], 1)
    ys2 = rng.uniform(-w / 2, w / 2, n // 2)
    xs2 = np.full(n // 2, -l / 2) + rng.normal(0, 0.02, n // 2)
    zs2 = rng.uniform(-h / 2, h / 2, n // 2)
    face2 = np.stack([xs2, ys2, zs2], 1)
    pts = np.concatenate([face1, face2])
    c, s = np.cos(box[6]), np.sin(box[6])
    out = pts.copy()
    out[:, 0] = pts[:, 0] * c - pts[:, 1] * s + box[0]
    out[:, 1] = pts[:, 0] * s + pts[:, 1] * c + box[1]
    out[:, 2] += box[2]
    return out


def make_scene(boxes, n_ground=3000, rng=None, span=40.0):
    """Waymo-frame scene: ground at z ~ 0 (the reference's banded min-height
    gating, ground_min_threshold[0]=0.2 inside 20 m, assumes this frame)."""
    rng = rng or np.random.default_rng(0)
    gx = rng.uniform(-span, span, n_ground)
    gy = rng.uniform(-span, span, n_ground)
    gz = rng.normal(0.0, 0.03, n_ground)
    pts = [np.stack([gx, gy, gz], 1)]
    for b in boxes:
        pts.append(box_surface_points(b, rng=rng))
    return np.concatenate(pts).astype(np.float64)


VEH = np.array([10.0, 5.0, 0.85, 4.6, 2.0, 1.7, 0.5])
PED = np.array([-8.0, -6.0, 0.85, 0.8, 0.8, 1.7, 0.0])


def test_ground_removal():
    scene = make_scene([VEH])
    seg = GroundSegmenter()
    mask, gz = seg(scene)
    # nearly all ground points removed, object points kept
    obj = box_surface_points(VEH)
    assert mask.sum() < len(scene) * 0.25
    kept = scene[mask]
    # kept points should be near the object
    d = np.linalg.norm(kept[:, :2] - VEH[:2], axis=1)
    assert (d < 5.0).mean() > 0.9


def test_clustering_and_box_fit():
    scene = make_scene([VEH, PED])
    seg = GroundSegmenter()
    mask, _ = seg(scene)
    clusters = clustering(scene[mask], eps=0.7, min_samples=8)
    assert len(clusters) == 2
    for c in clusters:
        b = box_fit(c)
        if np.linalg.norm(b[:2] - VEH[:2]) < 2:
            assert abs(b[3] - VEH[3]) < 0.6
            assert abs(b[4] - VEH[4]) < 0.5
            dyaw = abs((b[6] - VEH[6] + np.pi / 2) % np.pi - np.pi / 2)
            assert dyaw < 0.1, dyaw


def test_minimum_bounding_rectangle_exact():
    rng = np.random.default_rng(1)
    l, w, yaw = 4.0, 2.0, 0.7
    xs = rng.uniform(-l / 2, l / 2, 500)
    ys = rng.uniform(-w / 2, w / 2, 500)
    # force extreme corners so the rect is tight
    xs[:4] = [-l / 2, l / 2, -l / 2, l / 2]
    ys[:4] = [-w / 2, -w / 2, w / 2, w / 2]
    c, s = np.cos(yaw), np.sin(yaw)
    xy = np.stack([xs * c - ys * s + 3.0, xs * s + ys * c - 2.0], 1)
    center, (ll, ww), ang = minimum_bounding_rectangle(xy, "area")
    np.testing.assert_allclose(center, [3.0, -2.0], atol=1e-2)
    np.testing.assert_allclose([ll, ww], [l, w], atol=1e-2)
    assert abs((ang - yaw + np.pi / 2) % np.pi - np.pi / 2) < 1e-3


def test_get_box_cls():
    # reference size-band tables + check order (outline_utils.py:891)
    assert get_box_cls(np.array([0, 0, 0.8, 4.6, 2.0, 1.6, 0])) == "Vehicle"
    assert get_box_cls(np.array([0, 0, 0.85, 0.8, 0.7, 1.7, 0])) == "Pedestrian"
    assert get_box_cls(np.array([0, 0, 0.8, 1.8, 0.7, 1.6, 0])) == "Cyclist"
    assert get_box_cls(np.array([0, 0, 1.5, 13.0, 3.5, 3.0, 0])) == "Dis_Large"
    assert get_box_cls(np.array([0, 0, 0.1, 0.5, 0.5, 0.2, 0])) == "Dis_Small"
    # the top-z gate fires before any size band (reference order)
    assert get_box_cls(np.array([0, 0, 3.0, 4.6, 2.0, 1.6, 0])) == "Dis_Large"


def test_corner_align_keeps_nearest_corner():
    box = np.array([10.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0])
    out = corner_align(box, 5.0, 2.2)
    # nearest corner is at x=8, y=+-1 -> must stay fixed
    assert abs((out[0] - out[3] / 2) - 8.0) < 1e-6
    assert out[3] == 5.0 and out[4] == 2.2


def test_voxel_sampling_and_smooth():
    pts = np.array([[0, 0, 0], [0.01, 0.01, 0.0], [5, 5, 5]], float)
    out = voxel_sampling(pts, 0.1)
    assert len(out) == 2
    dense = np.random.default_rng(0).normal(0, 0.1, (100, 3))
    outlier = np.array([[10.0, 10, 10]])
    sm = smooth_points(np.concatenate([dense, outlier]), rad=0.2)
    assert len(sm) <= 100


def _norm3(v):
    v = np.asarray(v, float)
    return v / v.sum()


def test_scores():
    pts = box_surface_points(VEH, n=500)
    mlo = hierarchical_occupancy_score(pts, VEH, (9, 7, 5))
    assert 0.1 < mlo <= 1.0
    # reference KL operates on NORMALIZED size vectors (c_proto_refine.py:32)
    kl_good = KL_entropy_score(_norm3(VEH[3:6]), _norm3((4.7, 2.1, 1.7)))
    kl_bad = KL_entropy_score(_norm3((1.0, 3.0, 0.2)), _norm3((4.7, 2.1, 1.7)))
    assert kl_good > 0.8 > kl_bad


def test_ephe_score_direction():
    static_counts = np.tile([[10, 11, 9, 10, 10, 10]], (1, 1))
    moving_counts = np.array([[0, 0, 40, 0, 0, 0]])
    h_static = compute_ephe_score(static_counts)[0]
    h_moving = compute_ephe_score(moving_counts)[0]
    assert h_static > 0.95 > h_moving


def test_ppscore_for_frame():
    rng = np.random.default_rng(2)
    static = rng.uniform(-5, 5, (200, 3))
    eye = np.eye(4)
    frames = [static + rng.normal(0, 0.02, static.shape) for _ in range(12)]
    # a moving point appears at a location only in frame 6
    cur = np.concatenate([static, [[20.0, 0, 0]]])
    scores = ppscore_for_frame(cur, eye, frames, [eye] * 12, radius=0.5, window=3)
    assert scores[:200].mean() > 0.8
    assert scores[200] < 0.5


def test_tracker_follows_moving_object():
    tr = Tracker3D(match_dist=5.0)
    for f in range(10):
        box = np.array([[f * 1.0, 0, 0, 4, 2, 1.5, 0.0]])
        ids = tr.step(f, box, np.array([0.9]))
        assert ids[0] == 0  # same track throughout
    tracks = tr.post_processing(min_length=2)
    assert len(tracks) == 1
    t = tracks[0]
    assert len(t.boxes) == 10


def test_tracker_interpolates_gaps():
    tr = Tracker3D(match_dist=6.0, max_misses=5)
    for f in range(10):
        if f in (4, 5):  # occlusion
            tr.step(f, np.zeros((0, 7)), np.zeros(0))
            continue
        box = np.array([[f * 1.0, 0, 0, 4, 2, 1.5, 0.0]])
        tr.step(f, box, np.array([0.9]))
    tracks = tr.post_processing()
    assert len(tracks) == 1
    t = list(tracks.values())[0]
    # interpolated positions at the gap
    assert abs(t.boxes[4][0] - 4.0) < 0.75
    assert abs(t.boxes[5][0] - 5.0) < 0.75


def _make_sequence(n_frames=8, move=True, with_ppscore=True):
    rng = np.random.default_rng(3)
    frames = []
    veh = VEH.copy()
    for f in range(n_frames):
        b = veh.copy()
        if move:
            b[0] += f * 1.5  # moving vehicle
        scene = make_scene([b, PED], n_ground=2000, rng=np.random.default_rng(100 + f))
        frames.append({"points": scene, "pose": np.eye(4), "gt": [b.copy(), PED.copy()]})
    if with_ppscore:
        pts = [fr["points"] for fr in frames]
        poses = [fr["pose"] for fr in frames]
        for f, fr in enumerate(frames):
            fr["ppscore"] = ppscore_for_frame(pts[f], poses[f], pts, poses,
                                              radius=0.3, window=2)
    return frames


def test_dbscan_generator():
    frames = _make_sequence(2, move=False)
    gen = DBSCANGenerator(min_samples=8)
    out = gen(frames)
    assert set(out) == {0, 1}
    r = out[0]
    assert len(r["outline_box"]) >= 2
    # a vehicle-sized box near the vehicle
    d = np.linalg.norm(r["outline_box"][:, :2] - VEH[:2], axis=1)
    assert d.min() < 1.0


def test_mfcf_generator_and_cproto():
    frames = _make_sequence(8, move=True)
    gen = MFCFGenerator(window=2, min_samples=8, min_track_len=2)
    labels = gen(frames)
    n_boxes = sum(len(labels[f]["outline_box"]) for f in labels)
    assert n_boxes >= 8, n_boxes
    refiner = CProtoRefiner(min_proto_points=30)
    labels, protos = refiner(frames, labels)
    for f in labels:
        r = labels[f]
        assert "outline_proto_id" in r
        assert r["outline_score"].shape == (len(r["outline_box"]),)
        assert np.all(r["outline_score"] >= 0) and np.all(r["outline_score"] <= 1)
    # at least one prototype bank was built
    assert len(protos) >= 1
    # vehicle size should be closer to the prior after refinement
    last = labels[max(labels)]
    if len(last["outline_box"]):
        sizes = last["outline_box"][:, 3:6]
        d_vehicle = np.abs(sizes - np.array([4.6, 2.0, 1.7])).sum(1)
        assert d_vehicle.min() < 1.2
