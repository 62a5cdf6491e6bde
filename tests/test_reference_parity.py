"""Golden-parity harness: run the reference's pure-NumPy unsupervised core
(/root/reference/cpd/unsupervised_core, CPU-runnable in this image) on
synthetic scenes and assert the repo's reimplementations agree.

Every covered function asserts numeric agreement with the reference's own
NumPy implementation (density_guided_drift included, since round 2).
"""
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, REFERENCE)
    try:
        from cpd.unsupervised_core import outline_utils
        from cpd.unsupervised_core import c_proto_refine
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")
    finally:
        sys.path.remove(REFERENCE)
    return outline_utils, c_proto_refine


def _cluster(seed=0, n=400, center=(12.0, 8.0, 0.4), size=(4.4, 1.9, 1.6), yaw=0.5):
    """L-shaped car-like cluster (two visible faces) at a world offset."""
    rng = np.random.default_rng(seed)
    l, w, h = size
    n1 = n // 2
    side = np.stack([rng.uniform(-l / 2, l / 2, n1),
                     np.full(n1, -w / 2) + rng.normal(0, 0.03, n1),
                     rng.uniform(-h / 2, h / 2, n1)], 1)
    rear = np.stack([np.full(n - n1, -l / 2) + rng.normal(0, 0.03, n - n1),
                     rng.uniform(-w / 2, w / 2, n - n1),
                     rng.uniform(-h / 2, h / 2, n - n1)], 1)
    pts = np.concatenate([side, rear])
    c, s = np.cos(yaw), np.sin(yaw)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    return (pts @ rot.T + np.asarray(center)).astype(np.float64)


def test_kl_entropy_score_matches(ref):
    outline_utils, _ = ref
    from cpd_tpu.unsupervised.outline import KL_entropy_score
    rng = np.random.default_rng(0)
    for _ in range(20):
        x = rng.uniform(0.1, 1.0, 3)
        y = rng.uniform(0.1, 1.0, 3)
        x, y = x / x.sum(), y / y.sum()
        assert abs(KL_entropy_score(x, y) - outline_utils.KL_entropy_score(x, y)) < 1e-9


def test_mlo_occupancy_matches(ref):
    outline_utils, _ = ref
    from cpd_tpu.unsupervised.outline import hierarchical_occupancy_score
    for seed in range(5):
        pts = _cluster(seed)
        box = np.array([12.0, 8.0, 0.4, 4.6, 2.0, 1.7, 0.5])
        for parts in ([7, 5, 3], [9, 7, 5]):
            got = hierarchical_occupancy_score(pts, box, tuple(parts))
            want = outline_utils.hierarchical_occupancy_score(pts, box, parts)
            assert abs(got - want) < 1e-9, (seed, parts, got, want)


def test_css_matches_reference(ref):
    _, c_proto_refine = ref
    from cpd_tpu.unsupervised.cproto import CSS
    from cpd_tpu.config import ConfigDict

    sizes = {"Vehicle": [5.065, 1.86, 1.49], "Pedestrian": [1.0, 1.0, 2.0],
             "Cyclist": [1.9, 0.85, 1.8]}
    cfg = ConfigDict({"MaxDis": 80, "MLOParts": [9, 7, 5],
                      "PredifinedSize": sizes, "CSS_weight": [1, 1, 1]})
    ref_css = c_proto_refine.CSS(cfg)
    css = CSS(mlo_parts=(9, 7, 5), max_dist=80.0, predefined_size=sizes)
    for seed in range(5):
        pts = _cluster(seed)
        box = np.array([12.0, 8.0, 0.4, 4.6, 2.0, 1.7, 0.5])
        got = css(pts, box, "Vehicle")
        want = float(ref_css(pts, box.copy(), "Vehicle"))
        assert abs(got - want) < 1e-7, (seed, got, want)


def test_corner_align_behavioral_equivalence(ref):
    """Our corner_align takes absolute new dims and keeps the nearest corner
    fixed; the reference takes dim OFFSETS and moves the center to the
    farthest mini-corner. For boxes away from the origin both anchor the
    growth away from the sensor -- same resulting box."""
    outline_utils, _ = ref
    from cpd_tpu.unsupervised.outline import corner_align
    rng = np.random.default_rng(1)
    for _ in range(20):
        box = np.array([rng.uniform(6, 40) * np.sign(rng.normal()),
                        rng.uniform(6, 40) * np.sign(rng.normal()),
                        0.5, rng.uniform(3.5, 5.0), rng.uniform(1.6, 2.2),
                        1.6, rng.uniform(-np.pi, np.pi)])
        dl, dw = rng.uniform(0.2, 1.0), rng.uniform(0.1, 0.4)
        want = outline_utils.corner_align(box.copy(), dl, dw)
        got = corner_align(box.copy(), box[3] + dl, box[4] + dw)
        np.testing.assert_allclose(got[:7], want[:7], atol=1e-5)


def test_rigid_transforms_match(ref, monkeypatch):
    outline_utils, _ = ref
    # the reference uses np.mat, removed in NumPy 2.0
    monkeypatch.setattr(np, "mat", np.asmatrix, raising=False)
    monkeypatch.setattr(outline_utils.np, "mat", np.asmatrix, raising=False)
    from cpd_tpu.unsupervised.outline import (box_rigid_transform,
                                              get_registration_angle,
                                              points_rigid_transform)
    rng = np.random.default_rng(2)
    for _ in range(10):
        ang = rng.uniform(-np.pi, np.pi)
        pose = np.eye(4)
        pose[:2, :2] = [[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]]
        pose[:3, 3] = rng.normal(0, 5, 3)
        pts = rng.normal(0, 10, (50, 3))
        np.testing.assert_allclose(points_rigid_transform(pts, pose)[:, :3],
                                   outline_utils.points_rigid_transform(pts, pose),
                                   atol=1e-4)
        a = get_registration_angle(pose)
        b = outline_utils.get_registration_angle(pose)
        assert abs(((a - b) + np.pi) % (2 * np.pi) - np.pi) < 1e-6
        # reference box_rigid_transform(box, pose_pre, pose_cur) applies
        # inv(pose_cur) @ pose_pre; ours takes the composed pose
        pose_pre, pose_cur = pose, np.eye(4)
        pose_cur[:3, 3] = rng.normal(0, 2, 3)
        comp = np.linalg.inv(pose_cur) @ pose_pre
        box = np.concatenate([rng.normal(0, 10, 3), [4.5, 1.9, 1.6, 0.3]])
        want = outline_utils.box_rigid_transform(box.copy(), pose_pre, pose_cur)
        got = box_rigid_transform(box[None].copy(), comp)[0]
        np.testing.assert_allclose(got[:3], want[:3], atol=1e-4)
        assert abs(((got[6] - want[6]) + np.pi) % (2 * np.pi) - np.pi) < 1e-6


def test_smooth_points_matches(ref):
    outline_utils, _ = ref
    from cpd_tpu.unsupervised.outline import smooth_points
    pts = _cluster(3, n=300)
    # add sparse outliers that the radius filter must drop
    out = np.array([[50.0, 50, 2], [-30, 10, 1]])
    allp = np.concatenate([pts, out])
    got = smooth_points(allp)
    want = outline_utils.smooth_points(allp)
    np.testing.assert_allclose(np.sort(got, axis=0), np.sort(want, axis=0), atol=1e-9)


def test_voxel_sampling_matches_as_set(ref):
    """Same surviving points (last-in-voxel); order is dict-insertion in the
    reference vs positional here."""
    outline_utils, _ = ref
    from cpd_tpu.unsupervised.outline import voxel_sampling
    pts = _cluster(4, n=500)
    got = voxel_sampling(pts, 0.1)
    want = outline_utils.voxel_sampling(pts, 0.1, 0.1, 0.1)
    assert got.shape == want.shape
    got_set = {tuple(np.round(p, 6)) for p in got}
    want_set = {tuple(np.round(p, 6)) for p in want}
    assert got_set == want_set


def test_correct_heading_matches(ref):
    outline_utils, _ = ref
    from cpd_tpu.unsupervised.outline import correct_heading
    rng = np.random.default_rng(5)
    for seed in range(8):
        pts = _cluster(seed)
        # tilt the z profile so front/rear max-z differ
        box = np.array([12.0, 8.0, 0.4, 4.6, 2.0, 1.7, 0.5])
        pts = pts.copy()
        pts[:, 2] += 0.2 * ((pts[:, 0] - 12.0) * np.cos(0.5)
                            + (pts[:, 1] - 8.0) * np.sin(0.5))
        want = outline_utils.correct_heading(pts, box[None].copy())[0]
        got = correct_heading(box.copy(), pts)
        assert abs(((got[6] - want[6]) + np.pi) % (2 * np.pi) - np.pi) < 1e-6


def test_density_guided_drift_matches(ref):
    """Exact parity with outline_utils.py:41 (majority-sign side anchoring,
    center-only shift): with dims pre-set, our drift must reproduce the
    reference's output box."""
    from cpd_tpu.unsupervised.outline import box_fit, density_guided_drift
    for seed in range(5):
        pts = _cluster(seed)
        box = box_fit(pts)
        prior = (5.065, 1.86)
        drifted = density_guided_drift(box, pts, size_prior=prior)
        ref_in = np.asarray(box, np.float64).copy()
        ref_in[3], ref_in[4] = prior  # the reference pre-sets dims
        outline_utils, _ = ref
        want = outline_utils.density_guided_drift(pts, ref_in)
        np.testing.assert_allclose(drifted, np.asarray(want, np.float32),
                                   rtol=1e-5, atol=1e-5)
        assert drifted[3] == pytest.approx(prior[0])
        assert drifted[4] == pytest.approx(prior[1])


def _np_mat_patch(monkeypatch, outline_utils):
    monkeypatch.setattr(np, "mat", np.asmatrix, raising=False)
    monkeypatch.setattr(outline_utils.np, "mat", np.asmatrix, raising=False)


def _our_corners(center, dims, yaw):
    l, w = dims
    local = np.array([[l, w], [l, -w], [-l, -w], [-l, w]]) / 2.0
    c, s = np.cos(yaw), np.sin(yaw)
    rot = np.array([[c, -s], [s, c]])
    return local @ rot.T + np.asarray(center)


def _assert_corner_sets_close(got, want, atol=1e-6):
    want = np.asarray(want)
    got = np.asarray(got)
    assert got.shape == want.shape
    for wc in want:
        d = np.linalg.norm(got - wc, axis=1).min()
        assert d < atol, (wc, got)


def test_minimum_bounding_rectangle_matches(ref):
    """Both objectives of the min-rect fit (outline_utils.py:609 area,
    :703 edge-distance) against the reference's own implementation: same
    rectangle corners for L-shaped and random clusters."""
    outline_utils, _ = ref
    from cpd_tpu.unsupervised.outline import minimum_bounding_rectangle

    fitter = outline_utils.OutlineFitter()
    rng = np.random.default_rng(0)
    for seed in range(8):
        pts = _cluster(seed)[:, :2]
        if seed >= 4:  # plus blob-shaped clusters
            pts = rng.normal(0, 1.5, (60, 2)) * np.array([2.0, 0.7]) + rng.normal(0, 8, 2)
        for crit, fn in (("area", fitter.minimum_bounding_rectangle),
                         ("distance", fitter.minimum_bounding_rectangle_distance)):
            corners, _, _ = fn(pts.copy())
            center, dims, yaw = minimum_bounding_rectangle(pts, crit)
            _assert_corner_sets_close(_our_corners(center, dims, yaw), corners,
                                      atol=1e-5)


def test_correct_orientation_matches(ref):
    """Exact parity with outline_utils.py:127 (7-slice extreme-point slope)."""
    outline_utils, _ = ref
    from cpd_tpu.unsupervised.outline import box_fit, correct_orientation

    for seed in range(8):
        pts = _cluster(seed, yaw=0.3 + 0.1 * seed)
        box = np.asarray(box_fit(pts), np.float64)
        box[6] += 0.05  # perturb so the correction is non-trivial
        want = outline_utils.correct_orientation(pts, box.copy())
        got = correct_orientation(box.copy(), pts)
        # the reference builds its local frame with a float32 matrix
        # (outline_utils.py:137) -- tolerance is float32 noise, not semantics
        assert abs(((got[6] - want[6]) + np.pi) % (2 * np.pi) - np.pi) < 1e-6, (
            seed, got[6], want[6])
        np.testing.assert_allclose(got[:6], np.asarray(want)[:6], atol=1e-6)


def test_clustering_matches(ref):
    """OutlineFitter.clustering (outline_utils.py:789): DBSCAN core size 10,
    strictly-greater min-points filter, ABSOLUTE max-z gate."""
    outline_utils, _ = ref
    from cpd_tpu.unsupervised.outline import clustering

    rng = np.random.default_rng(7)
    pts = np.concatenate([
        _cluster(0), _cluster(1, center=(-14.0, 6.0, 0.2), n=60),
        _cluster(2, center=(4.0, -18.0, 5.0)),        # above max z -> dropped
        rng.uniform(-30, 30, (80, 3)),                # sparse noise
    ])
    fitter = outline_utils.OutlineFitter(cluster_dis=0.7, cluster_min_points=40,
                                         discard_max_height=4)
    want, _ = fitter.clustering(pts)
    got = clustering(pts, eps=0.7, min_samples=10, min_points=40, max_height=4.0)
    assert len(got) == len(want), (len(got), len(want))
    key = lambda c: tuple(np.round(np.asarray(c).mean(0), 6))
    got_map = {key(c): np.asarray(c) for c in got}
    for c in want:
        k = key(c)
        assert k in got_map, (k, sorted(got_map))
        np.testing.assert_allclose(
            np.sort(got_map[k], axis=0), np.sort(np.asarray(c), axis=0), atol=1e-9)


def test_box_fit_dgd_matches(ref, monkeypatch):
    """The full gated DGD fit chain (outline_utils.py:848 box_fit_DGD):
    floor-offset filter, z/h stretches, near-ground stretch, volume/height/
    length gates, then drift -> orientation -> heading, in that order."""
    outline_utils, _ = ref
    _np_mat_patch(monkeypatch, outline_utils)
    from cpd_tpu.unsupervised.outline import box_fit_DGD

    fitter = outline_utils.OutlineFitter(
        sensor_height=0, ground_min_threshold=[0.2, -0.5, -0.5],
        ground_min_distance=[0, 20, 40, 100], cluster_dis=0.5,
        cluster_min_points=5, discard_max_height=4, min_box_volume=0.1,
        min_box_height=0.3, max_box_volume=200, max_box_len=10)
    n_checked = 0
    for seed in range(8):
        far = seed % 2 == 1
        center = (35.0, 20.0, 0.4) if far else (12.0, 8.0, 0.4)
        pts = _cluster(seed, center=center)
        want = fitter.box_fit_DGD([pts])
        got = box_fit_DGD(pts, ground_adjust=(0.2, 20.0), min_box_volume=0.1,
                          min_box_height=0.3, max_box_volume=200.0,
                          max_box_len=10.0)
        if len(want) == 0:
            assert got is None
            continue
        n_checked += 1
        want = np.asarray(want)[0]
        np.testing.assert_allclose(got[:3], want[:3], atol=1e-5)
        np.testing.assert_allclose(np.sort(got[3:5]), np.sort(want[3:5]), atol=1e-5)
        assert abs(got[5] - want[5]) < 1e-5
        dy = ((got[6] - want[6]) + np.pi) % (2 * np.pi) - np.pi
        assert abs(dy) < 1e-6, (seed, got[6], want[6])
    assert n_checked >= 4


def test_get_box_cls_matches(ref):
    """Exact parity with OutlineFitter.get_box_cls (outline_utils.py:891):
    same tables, same check order, same (low, high] band semantics."""
    outline_utils, _ = ref
    from cpd_tpu.config import ConfigDict
    from cpd_tpu.unsupervised.outline import get_box_cls

    cfg = ConfigDict({
        "cls": {"Dis_Small": 0, "Vehicle": 1, "Pedestrian": 2, "Cyclist": 3,
                "Dis_Large": 4},
        "cls_L": {"Dis_Small": [0, 12], "Vehicle": [0.5, 8],
                  "Pedestrian": [0.2, 1.0], "Cyclist": [1.3, 2.5],
                  "Dis_Large": [0, 12]},
        "cls_W": {"Dis_Small": [0, 12], "Vehicle": [0.5, 3],
                  "Pedestrian": [0.2, 1.0], "Cyclist": [0.5, 1.0],
                  "Dis_Large": [0, 12]},
        "cls_H": {"Dis_Small": [0, 0.8], "Vehicle": [1.0, 3],
                  "Pedestrian": [0.8, 2.3], "Cyclist": [1.4, 2.0],
                  "Dis_Large": [3, 12]},
        "max_top_z": 3, "max_width": 3, "max_len": 12,
    })
    fitter = outline_utils.OutlineFitter()
    rng = np.random.default_rng(11)
    boxes = np.zeros((300, 7))
    boxes[:, 0:2] = rng.uniform(-30, 30, (300, 2))
    boxes[:, 2] = rng.uniform(-0.5, 2.5, 300)
    boxes[:, 3] = rng.uniform(0.1, 13, 300)
    boxes[:, 4] = rng.uniform(0.1, 4, 300)
    boxes[:, 5] = rng.uniform(0.1, 4, 300)
    _, want, _ = fitter.get_box_cls(boxes, cfg)
    got = np.asarray([get_box_cls(b) for b in boxes])
    mism = np.where(got != want)[0]
    assert len(mism) == 0, [(i, boxes[i, 2:6], got[i], want[i]) for i in mism[:5]]
