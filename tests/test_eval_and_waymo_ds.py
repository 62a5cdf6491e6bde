"""Evaluation metrics + Waymo dataset round-trip on a synthetic processed sequence."""
import pickle
import numpy as np
import pytest

from cpd_tpu.evaluation import waymo_style_eval, kitti_style_eval, average_precision
from . import oracles


def _mk_annos(n_frames=4, n_obj=5, perfect=True, seed=0):
    rng = np.random.default_rng(seed)
    dets, gts = [], []
    for f in range(n_frames):
        boxes = oracles.random_boxes(n_obj, rng, span=30).astype(np.float32)
        names = np.asarray(["Vehicle"] * n_obj)
        gts.append({
            "frame_id": f, "gt_boxes_lidar": boxes, "name": names,
            "num_points_in_gt": np.full(n_obj, 50), "difficulty": np.zeros(n_obj),
        })
        if perfect:
            db, ds = boxes.copy(), np.linspace(0.9, 0.5, n_obj)
        else:
            db = boxes[: n_obj // 2].copy()
            ds = np.linspace(0.9, 0.5, len(db))
        dets.append({"frame_id": f, "boxes_lidar": db, "score": ds, "name": names[: len(db)]})
    return dets, gts


def test_waymo_eval_perfect_detections():
    dets, gts = _mk_annos(perfect=True)
    s, r = waymo_style_eval(dets, gts, ["Vehicle"])
    assert r["Vehicle_L1/AP"] > 99.0
    assert r["Vehicle_L2/AP"] > 99.0
    assert r["Vehicle_L2/APH"] > 99.0


def test_waymo_eval_half_recall():
    dets, gts = _mk_annos(perfect=False)
    _, r = waymo_style_eval(dets, gts, ["Vehicle"])
    assert 30.0 < r["Vehicle_L2/AP"] < 60.0


def test_waymo_eval_l1_ignores_sparse_gt():
    dets, gts = _mk_annos(perfect=True)
    for g in gts:
        g["num_points_in_gt"] = np.full(len(g["name"]), 3)  # all L2-only
    _, r = waymo_style_eval(dets, gts, ["Vehicle"])
    # no L1 gts -> AP L1 is 0 by convention; L2 still perfect
    assert r["Vehicle_L1/AP"] == 0.0
    assert r["Vehicle_L2/AP"] > 99.0


def test_aph_penalizes_heading():
    dets, gts = _mk_annos(perfect=True)
    for d in dets:
        d["boxes_lidar"][:, 6] += np.pi  # flipped heading
    _, r = waymo_style_eval(dets, gts, ["Vehicle"])
    assert r["Vehicle_L2/AP"] > 99.0
    assert r["Vehicle_L2/APH"] < 5.0


def test_kitti_eval():
    dets, gts = _mk_annos(perfect=True)
    _, r = kitti_style_eval(dets, gts, ["Vehicle"])
    assert r["Vehicle_3d/moderate_R40"] > 99.0


def test_average_precision_monotonic():
    scores = np.array([0.9, 0.8, 0.7, 0.6])
    tp = np.array([1, 1, 0, 1], bool)
    fp = ~tp
    ap_full = average_precision(scores, tp, fp, num_gt=3)
    ap_half = average_precision(scores, tp, fp, num_gt=6)
    assert ap_full > ap_half


@pytest.fixture(scope="module")
def synthetic_sequence(tmp_path_factory):
    """Write a processed-layout synthetic sequence and run the label pipeline."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_unsupervised import make_scene, VEH, PED
    from cpd_tpu.unsupervised.driver import compute_outline_box, save_ppscore

    root = tmp_path_factory.mktemp("waymo_processed")
    seq = "segment-0000"
    seq_dir = root / seq
    seq_dir.mkdir()
    infos = []
    n_frames = 6
    for f in range(n_frames):
        b = VEH.copy()
        scene = make_scene([b, PED], n_ground=1500, rng=np.random.default_rng(50 + f))
        # layout: (N, 6) with intensity/elongation/NLZ channels
        pts = np.zeros((len(scene), 6), np.float32)
        pts[:, :3] = scene
        pts[:, 3] = np.random.default_rng(f).uniform(0, 1, len(scene))
        pts[:, 5] = -1
        np.save(seq_dir / f"{f:04d}.npy", pts)
        infos.append({"pose": np.eye(4), "frame_id": f"{seq}_{f:03d}",
                      "point_cloud": {"lidar_sequence": seq, "sample_idx": f},
                      "annos": {"gt_boxes_lidar": np.stack([VEH, PED]),
                                "name": np.asarray(["Vehicle", "Pedestrian"]),
                                "num_points_in_gt": np.asarray([450, 450]),
                                "difficulty": np.zeros(2)}})
    with open(seq_dir / f"{seq}.pkl", "wb") as fh:
        pickle.dump(infos, fh)
    save_ppscore(seq_dir, window=2, max_range=5)
    cfg = {
        "InitLabelGenerator": "MFCF",
        "LabelRefiner": "C_PROTO",
        "GeneratorConfig": {"cluster_dis": 0.7, "cluster_min_points": 8,
                            "ppscore_thresh": 0.7, "frame_num": 2},
        "RefinerConfig": {"BasicProtoScoreThresh": {"Vehicle": 0.4, "Pedestrian": 0.4, "Cyclist": 0.4},
                          "HighQualityProtoNum": {"Vehicle": 10, "Pedestrian": 5, "Cyclist": 5},
                          "OrienThresh": 0.5,
                          "CSSConfig": {"MLOParts": [9, 7, 5]}},
    }
    labels = compute_outline_box(seq, root, cfg)
    return root, seq, labels


def test_label_pipeline_writes_cache(synthetic_sequence):
    root, seq, labels = synthetic_sequence
    assert (root / seq / f"{seq}_outline_C_PROTO.pkl").exists()
    assert (root / seq / f"{seq}_outline_MFCF_CSS_proto.pkl").exists()
    n = sum(len(labels[f]["outline_box"]) for f in labels)
    assert n >= 6


def test_waymo_dataset_getitem_training(synthetic_sequence):
    root, seq, labels = synthetic_sequence
    from cpd_tpu.datasets.waymo_unsupervised import WaymoUnsupervisedDataset

    cfg = {
        "DATA_PATH": str(root), "PROCESSED_DATA_TAG": "",
        "POINT_CLOUD_RANGE": [-75.2, -75.2, -2, 75.2, 75.2, 4],
        "POINT_CAP": 8192, "GT_CAP": 32, "STAGES": 2,
        "InitLabelGenerator": "MFCF", "LabelRefiner": "C_PROTO",
        "NUM_FRAMES": 1,
        "DATA_SPLIT": {"train": "train", "test": "val"},
        "SAMPLED_INTERVAL": {"train": 1, "test": 1},
        "RefinerConfig": {"DiscardThreshMin": {"Vehicle": 0.3, "Pedestrian": 0.3, "Cyclist": 0.3},
                          "DiscardThreshMax": {"Vehicle": 0.7, "Pedestrian": 0.55, "Cyclist": 0.55}},
        "POINT_FEATURE_ENCODING": {
            "used_feature_list": ["x", "y", "z", "intensity", "time"],
            "src_feature_list": ["x", "y", "z", "intensity", "time"],
        },
    }
    ds = WaymoUnsupervisedDataset(dataset_cfg=cfg, class_names=["Vehicle", "Pedestrian", "Cyclist"],
                                  training=True, root_path=str(root))
    # PROCESSED_DATA_TAG "" makes data_path == root
    assert len(ds) == 6
    s = ds[0]
    assert s["points"].shape == (8192, 5)
    assert s["points1"].shape == (8192, 5)
    # at least one proto-gated gt survived with normalized css
    if s["gt_valid"].any():
        css = s["css_score"][s["gt_valid"]]
        assert np.all(css >= 0) and np.all(css <= 1)
        assert np.all(s["proto_group_id"][s["gt_valid"]] >= -1)


def test_waymo_dataset_eval_mode(synthetic_sequence):
    root, seq, labels = synthetic_sequence
    from cpd_tpu.datasets.waymo_unsupervised import WaymoUnsupervisedDataset

    cfg = {
        "DATA_PATH": str(root), "PROCESSED_DATA_TAG": "",
        "POINT_CLOUD_RANGE": [-75.2, -75.2, -2, 75.2, 75.2, 4],
        "POINT_CAP": 8192, "GT_CAP": 32,
        "InitLabelGenerator": "MFCF", "LabelRefiner": "C_PROTO",
        "DATA_SPLIT": {"train": "train", "test": "val"},
        "SAMPLED_INTERVAL": {"train": 1, "test": 1},
        "POINT_FEATURE_ENCODING": {
            "used_feature_list": ["x", "y", "z", "intensity", "time"],
            "src_feature_list": ["x", "y", "z", "intensity", "time"],
        },
    }
    ds = WaymoUnsupervisedDataset(dataset_cfg=cfg, class_names=["Vehicle", "Pedestrian", "Cyclist"],
                                  training=False, root_path=str(root))
    s = ds[0]
    assert s["points"].shape == (8192, 5)
    gt_annos = ds.collect_gt_annos()
    assert len(gt_annos) == 6
    # perfect "detections" from gt -> near-100 AP through the dataset evaluation API
    dets = [{
        "frame_id": a["frame_id"], "boxes_lidar": a["gt_boxes_lidar"][:, :7],
        "score": np.linspace(0.9, 0.6, len(a["name"])), "name": a["name"],
    } for a in gt_annos]
    _, r = ds.evaluation(dets, ["Vehicle", "Pedestrian"], gt_annos=gt_annos)
    assert r["Vehicle_L2/AP"] > 99.0


def test_recall_stats():
    from cpd_tpu.evaluation.ap import recall_stats

    dets, gts = _mk_annos(perfect=False)
    rec = recall_stats(dets, gts)
    assert 0.3 < rec["recall_0.7"] < 0.7  # half the gts detected
    dets2, gts2 = _mk_annos(perfect=True)
    rec2 = recall_stats(dets2, gts2)
    assert rec2["recall_0.7"] > 0.99


def test_waymo_dataset_multiframe(synthetic_sequence):
    root, seq, labels = synthetic_sequence
    from cpd_tpu.datasets.waymo_unsupervised import WaymoUnsupervisedDataset

    cfg = {
        "DATA_PATH": str(root), "PROCESSED_DATA_TAG": "",
        "POINT_CLOUD_RANGE": [-75.2, -75.2, -2, 75.2, 75.2, 4],
        "POINT_CAP": 16384, "GT_CAP": 32,
        "InitLabelGenerator": "MFCF", "LabelRefiner": "C_PROTO",
        "NUM_FRAMES": 3,
        "DATA_SPLIT": {"train": "train", "test": "val"},
        "SAMPLED_INTERVAL": {"train": 1, "test": 1},
        "POINT_FEATURE_ENCODING": {
            "used_feature_list": ["x", "y", "z", "intensity", "time"],
            "src_feature_list": ["x", "y", "z", "intensity", "time"],
        },
    }
    ds = WaymoUnsupervisedDataset(dataset_cfg=cfg, class_names=["Vehicle", "Pedestrian", "Cyclist"],
                                  training=False, root_path=str(root))
    s2 = ds[2]  # frame 2: concat of frames 2, 1, 0 with time channel
    times = s2["points"][s2["points_valid"], 4]
    uniq = np.unique(np.round(times.astype(np.float64), 2))
    assert np.all(np.isin(uniq, [0.0, -0.1, -0.2])), uniq
    assert (times < 0).sum() > 0  # past frames present


def test_greedy_vs_hungarian_agreement_and_tie_cases():
    """The matcher-fidelity check (VERDICT): both matchers within 0.1 AP on a
    random suite, and on an adversarial tie layout Hungarian recovers the
    assignment greedy forfeits."""
    from cpd_tpu.evaluation.ap import match_frame, waymo_style_eval

    # random suite: deltas must be tiny
    for seed in range(4):
        dets, gts = _mk_annos(perfect=True, seed=seed)
        _, rg = waymo_style_eval(dets, gts, ["Vehicle"], matcher="greedy")
        _, rh = waymo_style_eval(dets, gts, ["Vehicle"], matcher="hungarian")
        for k in rg:
            assert abs(rg[k] - rh[k]) < 0.1, (seed, k, rg[k], rh[k])

    # adversarial: det0 (higher score) overlaps both gts, better with gt1;
    # det1 only overlaps gt1. Greedy gives det0->gt1 and det1 unmatched;
    # Hungarian assigns det0->gt0, det1->gt1 (2 TPs).
    g0 = np.array([0.0, 0, 0, 4, 2, 1.6, 0])
    g1 = np.array([3.0, 0, 0, 4, 2, 1.6, 0])
    d0 = np.array([2.0, 0, 0, 4, 2, 1.6, 0])   # IoU ~0.33 with g0, ~0.6 with g1
    d1 = np.array([3.2, 0, 0, 4, 2, 1.6, 0])   # IoU high with g1 only
    dets = np.stack([d0, d1])
    scores = np.array([0.9, 0.8])
    gts_b = np.stack([g0, g1])
    tp_g, fp_g, _ = match_frame(dets, scores, gts_b, 0.3, matcher="greedy")
    tp_h, fp_h, _ = match_frame(dets, scores, gts_b, 0.3, matcher="hungarian")
    assert tp_g.sum() == 1 and tp_h.sum() == 2


def test_waymo_bev_eval_keys():
    from cpd_tpu.evaluation.ap import waymo_bev_eval

    dets, gts = _mk_annos(perfect=True)
    # z offsets must NOT matter for the BEV protocol
    for d in dets:
        d["boxes_lidar"][:, 2] += 5.0
    _, r = waymo_bev_eval(dets, gts, ["Vehicle"])
    assert r["Vehicle_L2/AP_2D"] > 99.0


def test_kitti_bbox_bev_aos():
    dets, gts = _mk_annos(perfect=True)
    rng = np.random.default_rng(0)
    for det, gt in zip(dets, gts):
        n = len(gt["name"])
        bbox = np.stack([rng.uniform(0, 800, n), rng.uniform(0, 300, n),
                         np.zeros(n), np.zeros(n)], 1)
        bbox[:, 2] = bbox[:, 0] + rng.uniform(60, 120, n)
        bbox[:, 3] = bbox[:, 1] + rng.uniform(50, 90, n)
        alpha = rng.uniform(-np.pi, np.pi, n)
        gt["bbox"] = bbox
        gt["alpha"] = alpha
        gt["truncated"] = np.zeros(n)
        gt["occluded"] = np.zeros(n, np.int64)
        det["bbox"] = bbox.copy()
        det["alpha"] = alpha.copy()
    _, r = kitti_style_eval(dets, gts, ["Vehicle"])
    assert r["Vehicle_bbox/moderate_R40"] > 99.0
    assert r["Vehicle_bev/moderate_R40"] > 99.0
    assert r["Vehicle_aos/moderate_R40"] > 99.0
    # wrong alpha tanks AOS but not bbox AP
    for det in dets:
        det["alpha"] = det["alpha"] + np.pi
    _, r2 = kitti_style_eval(dets, gts, ["Vehicle"])
    assert r2["Vehicle_bbox/moderate_R40"] > 99.0
    assert r2["Vehicle_aos/moderate_R40"] < 5.0


def test_kitti_similar_class_and_height_gates():
    dets, gts = _mk_annos(perfect=True)
    # relabel one gt per frame as Van: must be ignored for Car, not FP-matched
    for det, gt in zip(dets, gts):
        gt["name"] = np.asarray(["Car"] * (len(gt["name"]) - 1) + ["Van"])
        det["name"] = np.asarray(["Car"] * len(det["name"]))
    _, r = kitti_style_eval(dets, gts, ["Car"])
    assert r["Car_3d/moderate_R40"] > 99.0


def test_r11_protocol_matches_official_semantics():
    """R11 INCLUDES the recall-0 sample (eval.py:561 get_mAP sums points
    0,4,...,40 of the 41-grid / 11); R40 excludes it (get_mAP_R40 sums
    1..40 / 40). tp=[1,0] over 2 gts: recall caps at 0.5, precision
    [1.0, 0.5] -> R11 = 6 of 11 positions at precision 1.0, R40 = 20 of 40."""
    scores = np.array([0.9, 0.8])
    tp = np.array([1, 0], bool)
    ap11 = average_precision(scores, tp, ~tp, num_gt=2, n_points=11)
    ap40 = average_precision(scores, tp, ~tp, num_gt=2, n_points=40)
    assert abs(ap11 - 6.0 / 11.0) < 1e-9, ap11
    assert abs(ap40 - 0.5) < 1e-9, ap40


def test_kitti_eval_emits_both_protocols():
    dets, gts = _mk_annos(perfect=True)
    _, r = kitti_style_eval(dets, gts, ["Vehicle"], n_points=(40, 11))
    assert r["Vehicle_3d/moderate_R40"] > 99.0
    assert r["Vehicle_3d/moderate_R11"] > 99.0


def _camera_iou3d_oracle(a, b):
    """Official camera-frame 3D IoU (eval.py d3_box_overlap semantics):
    rotated rectangle overlap in the camera x-z plane + y-interval overlap
    with location at the box bottom. Boxes (loc(3), l, w, h, ry)."""
    from cpd_tpu.evaluation.ap import _clip, _area

    def corners_xz(box):
        x, _, z, l, w, _, ry = box
        local = np.array([[l, w], [-l, w], [-l, -w], [l, -w]]) / 2.0
        c, s = np.cos(ry), np.sin(ry)
        # rotation around +y: x' = c*x + s*z, z' = -s*x + c*z
        rot = np.array([[c, s], [-s, c]])
        return local @ rot.T + np.array([x, z])

    o = _area(_clip(corners_xz(a), corners_xz(b)))
    ya0, ya1 = a[1] - a[5], a[1]  # y down, loc at bottom (max y)
    yb0, yb1 = b[1] - b[5], b[1]
    yo = max(0.0, min(ya1, yb1) - max(ya0, yb0))
    inter = o * yo
    va = a[3] * a[4] * a[5]
    vb = b[3] * b[4] * b[5]
    return inter / max(va + vb - inter, 1e-6)


def test_camera_frame_iou_matches_official_oracle():
    """camera_boxes_to_pseudo_lidar must make iou3d_pair reproduce the
    official camera-frame 3D IoU exactly (rigid-map invariance)."""
    from cpd_tpu.evaluation.ap import camera_boxes_to_pseudo_lidar, iou3d_pair

    rng = np.random.default_rng(3)
    for _ in range(30):
        loc = rng.uniform(-10, 10, (2, 3))
        loc[:, 2] = rng.uniform(5, 40, 2)
        loc[1] = loc[0] + rng.normal(0, 1.0, 3)  # force overlap candidates
        dims = rng.uniform(0.8, 5.0, (2, 3))
        ry = rng.uniform(-np.pi, np.pi, 2)
        pl = camera_boxes_to_pseudo_lidar(loc, dims, ry)
        got = iou3d_pair(pl[0], pl[1])
        a = np.concatenate([loc[0], dims[0], [ry[0]]])
        b = np.concatenate([loc[1], dims[1], [ry[1]]])
        want = _camera_iou3d_oracle(a, b)
        assert abs(got - want) < 1e-6, (got, want)


def test_kitti_eval_camera_frame_iou_auto_path():
    """When det+gt annos carry location/dimensions/rotation_y, the 3D/BEV
    overlaps come from the camera frame (official d3_box_overlap); exact
    camera-frame duplicates score perfectly even with garbage lidar boxes."""
    dets, gts = _mk_annos(perfect=True)
    rng = np.random.default_rng(5)
    for det, gt in zip(dets, gts):
        n = len(gt["name"])
        loc = rng.uniform(-5, 5, (n, 3))
        loc[:, 2] = rng.uniform(8, 50, n)
        dims = rng.uniform(1.0, 5.0, (n, 3))
        ry = rng.uniform(-np.pi, np.pi, n)
        for rec in (gt, det):
            rec["location"] = loc.copy()
            rec["dimensions"] = dims.copy()
            rec["rotation_y"] = ry.copy()
        # garbage lidar-frame dets: only the camera path can match
        det["boxes_lidar"] = det["boxes_lidar"] + 1000.0
    _, r = kitti_style_eval(dets, gts, ["Vehicle"])
    assert r["Vehicle_3d/moderate_R40"] > 99.0
    assert r["Vehicle_bev/moderate_R40"] > 99.0
    # explicit opt-out falls back to the (garbage) lidar boxes
    _, r2 = kitti_style_eval(dets, gts, ["Vehicle"], camera_frame_iou=False)
    assert r2["Vehicle_3d/moderate_R40"] == 0.0


def test_waymo_official_adapter_protocol():
    """The official-estimator adapter's NumPy protocol stages (waymo_eval.py
    :26-87, :169-176): difficulty backfill from num_points_in_gt, zero-point
    gt drop, 100 m (+0.5) range gate, heading wrap to (-pi, pi]."""
    from cpd_tpu.evaluation.waymo_official import (distance_mask,
                                                   flatten_annos,
                                                   official_available)

    assert official_available() is False  # package absent in this image
    gts = [{
        "name": np.asarray(["Vehicle", "Vehicle", "Pedestrian", "Sign"]),
        "gt_boxes_lidar": np.asarray([
            [5.0, 0, 0, 4, 2, 1.5, 3 * np.pi],      # heading wraps to pi
            [120.0, 0, 0, 4, 2, 1.5, 0.0],          # out of 100 m range
            [8.0, 0, 0, 1, 1, 1.7, 0.0],
            [9.0, 0, 0, 1, 1, 2.0, 0.0],            # class not evaluated
        ]),
        "num_points_in_gt": np.asarray([50, 50, 3, 50]),
        "difficulty": np.asarray([0, 0, 0, 0]),
    }]
    fid, box, typ, _, dif = flatten_annos(gts, ["Vehicle", "Pedestrian"], is_gt=True)
    assert len(box) == 3  # Sign dropped
    assert dif.tolist() == [1, 1, 2]  # backfill: >5 pts -> L1, <=5 -> L2
    assert abs(abs(box[0, 6]) - np.pi) < 1e-9
    box, fid, typ, dif = distance_mask(box, fid, typ, dif)
    assert len(box) == 2  # 120 m gt dropped
    # zero-point gts are dropped entirely
    gts[0]["num_points_in_gt"] = np.asarray([0, 50, 3, 50])
    _, box2, _, _, _ = flatten_annos(gts, ["Vehicle", "Pedestrian"], is_gt=True)
    assert len(box2) == 2


def test_waymo_hand_computed_l1_l2_ap():
    """Hand-computed 3-box scene (weak #7): 2 L1 vehicles + 1 L2 (4 points),
    detections hit the two L1 boxes and miss the L2 one with a spurious det.

    L1 protocol: the L2-only gt is IGNORE -> dets: TP, TP, FP, num_gt=2.
    recall hits 1.0 at the 2nd det, precision there 1.0; the FP is ranked
    last (score 0.3) so every recall position sees precision 1.0 -> AP_L1 =
    100. L2: all 3 gts count, recall caps at 2/3 with precisions 1.0 ->
    AP_L2 = sum_{r<=2/3} 1.0 / 40 = 26/40 within the matched band."""
    gt = {
        "frame_id": 0,
        "gt_boxes_lidar": np.asarray([
            [0.0, 0, 0, 4, 2, 1.5, 0.0],
            [10.0, 0, 0, 4, 2, 1.5, 0.0],
            [20.0, 0, 0, 4, 2, 1.5, 0.0],
        ]),
        "name": np.asarray(["Vehicle"] * 3),
        "num_points_in_gt": np.asarray([50, 50, 4]),
        "difficulty": np.zeros(3),
    }
    det = {
        "frame_id": 0,
        "boxes_lidar": np.asarray([
            [0.0, 0, 0, 4, 2, 1.5, 0.0],
            [10.0, 0, 0, 4, 2, 1.5, 0.0],
            [40.0, 0, 0, 4, 2, 1.5, 0.0],  # matches nothing
        ]),
        "score": np.asarray([0.9, 0.8, 0.3]),
        "name": np.asarray(["Vehicle"] * 3),
    }
    _, r = waymo_style_eval([det], [gt], ["Vehicle"])
    assert abs(r["Vehicle_L1/AP"] - 100.0) < 1e-6, r
    want_l2 = sum(1.0 for k in range(1, 41) if k / 40 <= 2 / 3) / 40 * 100
    assert abs(r["Vehicle_L2/AP"] - want_l2) < 1e-6, (r["Vehicle_L2/AP"], want_l2)
