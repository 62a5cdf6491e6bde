"""Detection metrics: Waymo-style 3D AP/APH (L1/L2) and KITTI-style AP.

Replaces the reference's metric backends:
  - cpd/datasets/waymo_unsupervised/waymo_eval.py (official WOD TF graph,
    IoU 0.7/0.5/0.5, L2 = <=5 points or hard, Hungarian matching)
  - cpd/datasets/kitti/kitti_object_eval_python (numba 11/40-point AP)

This is an independent NumPy implementation of the same protocols (the
waymo-open-dataset package and numba are not available in this image):
rotated 3D IoU from the host-side polygon clipping oracle, per-frame
score-greedy matching (the standard AP matching; the official WOD Hungarian
matcher differs only in rare tie cases), 40-point interpolated AP, and APH
(precision weighted by heading accuracy 1 - |dyaw|/pi).
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


# ---------------------------------------------------------------------------
# rotated IoU (host NumPy; same construction as tests/oracles.py)
# ---------------------------------------------------------------------------

def _corners_bev(box):
    x, y, _, dx, dy, _, yaw = box[:7]
    local = np.array([[dx, dy], [-dx, dy], [-dx, -dy], [dx, -dy]]) / 2.0
    c, s = np.cos(yaw), np.sin(yaw)
    rot = np.array([[c, -s], [s, c]])
    return local @ rot.T + np.array([x, y])


def _clip(subject, clipper):
    def inside(p, a, b):
        return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0]) >= -1e-12

    def inter(p1, p2, a, b):
        d1 = np.asarray(p2) - np.asarray(p1)
        d2 = np.asarray(b) - np.asarray(a)
        den = d1[0] * d2[1] - d1[1] * d2[0]
        if abs(den) < 1e-12:  # parallel/collinear edges: zero-area sliver
            return (np.asarray(p1) + np.asarray(p2)) / 2.0
        t = ((a[0] - p1[0]) * d2[1] - (a[1] - p1[1]) * d2[0]) / den
        return np.asarray(p1) + t * d1

    out = list(subject)
    for i in range(len(clipper)):
        a, b = clipper[i], clipper[(i + 1) % len(clipper)]
        inp, out = out, []
        if not inp:
            break
        s = inp[-1]
        for p in inp:
            if inside(p, a, b):
                if not inside(s, a, b):
                    out.append(inter(s, p, a, b))
                out.append(p)
            elif inside(s, a, b):
                out.append(inter(s, p, a, b))
            s = p
    return out


def _area(poly):
    if len(poly) < 3:
        return 0.0
    poly = np.asarray(poly)
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def iou3d_pair(a, b):
    # cheap reject first
    if np.hypot(a[0] - b[0], a[1] - b[1]) > (np.hypot(a[3], a[4]) + np.hypot(b[3], b[4])) / 2:
        return 0.0
    o = _area(_clip(_corners_bev(a), _corners_bev(b)))
    if o <= 0:
        return 0.0
    zo = max(0.0, min(a[2] + a[5] / 2, b[2] + b[5] / 2) - max(a[2] - a[5] / 2, b[2] - b[5] / 2))
    inter = o * zo
    va, vb = a[3] * a[4] * a[5], b[3] * b[4] * b[5]
    return inter / max(va + vb - inter, 1e-6)


def iou_matrix(dets, gts):
    out = np.zeros((len(dets), len(gts)))
    for i, d in enumerate(dets):
        for j, g in enumerate(gts):
            out[i, j] = iou3d_pair(d, g)
    return out


# ---------------------------------------------------------------------------
# matching + AP
# ---------------------------------------------------------------------------

def match_frame(det_boxes, det_scores, gt_boxes, iou_thresh, ignore_mask=None):
    """Score-greedy one-to-one matching for one frame.

    ignore_mask: gts to exclude from the positive pool; a det matched to an
    ignored gt is neither TP nor FP. Returns (tp (D,), fp (D,), matched_gt (D,)).
    """
    d = len(det_boxes)
    g = len(gt_boxes)
    tp = np.zeros(d, bool)
    fp = np.zeros(d, bool)
    matched_gt = np.full(d, -1, np.int64)
    if g == 0:
        fp[:] = True
        return tp, fp, matched_gt
    iou = iou_matrix(det_boxes, gt_boxes)
    taken = np.zeros(g, bool)
    order = np.argsort(-np.asarray(det_scores))
    ignore_mask = ignore_mask if ignore_mask is not None else np.zeros(g, bool)
    for i in order:
        cand = np.where((iou[i] >= iou_thresh) & ~taken)[0]
        if len(cand) == 0:
            fp[i] = True
            continue
        j = cand[np.argmax(iou[i][cand])]
        taken[j] = True
        matched_gt[i] = j
        if ignore_mask[j]:
            pass  # neither TP nor FP
        else:
            tp[i] = True
    return tp, fp, matched_gt


def average_precision(scores, tp, fp, num_gt, weights=None, n_points: int = 40):
    """Interpolated AP over ``n_points`` recall positions (KITTI R40 style).

    weights: per-det TP weight in [0,1] (APH heading accuracy); None = 1.
    """
    if num_gt == 0:
        return 0.0
    order = np.argsort(-np.asarray(scores))
    tp = np.asarray(tp, float)[order]
    fp = np.asarray(fp, float)[order]
    w = np.ones_like(tp) if weights is None else np.asarray(weights, float)[order]
    ctp = np.cumsum(tp * w)
    cfp = np.cumsum(fp)
    craw = np.cumsum(tp)
    recall = craw / num_gt
    precision = ctp / np.maximum(craw + cfp, 1e-9)
    ap = 0.0
    for r in np.linspace(1.0 / n_points, 1.0, n_points):
        mask = recall >= r
        ap += (precision[mask].max() if mask.any() else 0.0) / n_points
    return float(ap)


# ---------------------------------------------------------------------------
# Waymo-style evaluation
# ---------------------------------------------------------------------------

WAYMO_IOU = {"Vehicle": 0.7, "Pedestrian": 0.5, "Cyclist": 0.5}


def waymo_style_eval(det_annos: List[dict], gt_annos: List[dict],
                     class_names: Sequence[str]):
    """3D AP/APH at L1/L2 per class (protocol of waymo_eval.py:86-108).

    det_annos[i]: {boxes_lidar (D, 7), score (D,), name (D,)}
    gt_annos[i]: {gt_boxes_lidar (G, 7[+]), name (G,), num_points_in_gt (G,),
                  difficulty (G,)}  (difficulty 2 or <=5 points -> L2-only)
    Returns (result_str, result_dict).
    """
    results = {}
    for cls in class_names:
        iou_t = WAYMO_IOU.get(cls, 0.5)
        all_scores, all_tp, all_fp, all_hacc = [], [], [], []
        # L1 pass: L2-only gts are "ignore"; L2 pass: all gts count
        l1_records = {"scores": [], "tp": [], "fp": [], "h": [], "ngt": 0}
        l2_records = {"scores": [], "tp": [], "fp": [], "h": [], "ngt": 0}
        for det, gt in zip(det_annos, gt_annos):
            dm = np.asarray(det["name"]) == cls
            dboxes = np.asarray(det["boxes_lidar"]).reshape(-1, 7)[dm]
            dscores = np.asarray(det["score"]).reshape(-1)[dm]
            gm = np.asarray(gt["name"]) == cls
            gboxes = np.asarray(gt["gt_boxes_lidar"]).reshape(-1, gt["gt_boxes_lidar"].shape[-1] if len(np.asarray(gt["gt_boxes_lidar"]).shape) > 1 else 7)[gm][:, :7]
            npts = np.asarray(gt.get("num_points_in_gt", np.full(gm.sum(), 100)))
            npts = npts[gm] if len(npts) == len(gm) else np.full(int(gm.sum()), 100)
            dif = np.asarray(gt.get("difficulty", np.zeros(int(gm.sum()))))
            dif = dif[gm] if len(dif) == len(gm) else np.zeros(int(gm.sum()))
            is_l2_only = (npts <= 5) | (dif == 2)
            for rec, ignore in ((l1_records, is_l2_only), (l2_records, np.zeros(len(gboxes), bool))):
                tp, fp, mg = match_frame(dboxes, dscores, gboxes, iou_t, ignore)
                # heading accuracy for APH
                h = np.ones(len(dboxes))
                for i in range(len(dboxes)):
                    if mg[i] >= 0 and tp[i]:
                        dy = abs(dboxes[i][6] - gboxes[mg[i]][6]) % (2 * np.pi)
                        dy = min(dy, 2 * np.pi - dy)
                        h[i] = max(0.0, 1.0 - dy / np.pi)
                rec["scores"].append(dscores)
                rec["tp"].append(tp)
                rec["fp"].append(fp)
                rec["h"].append(h)
                rec["ngt"] += int((~ignore).sum())
        for level, rec in (("L1", l1_records), ("L2", l2_records)):
            scores = np.concatenate(rec["scores"]) if rec["scores"] else np.zeros(0)
            tp = np.concatenate(rec["tp"]) if rec["tp"] else np.zeros(0, bool)
            fp = np.concatenate(rec["fp"]) if rec["fp"] else np.zeros(0, bool)
            h = np.concatenate(rec["h"]) if rec["h"] else np.zeros(0)
            ap = average_precision(scores, tp, fp, rec["ngt"])
            aph = average_precision(scores, tp, fp, rec["ngt"], weights=h)
            results[f"{cls}_{level}/AP"] = ap * 100
            results[f"{cls}_{level}/APH"] = aph * 100
    lines = [f"{k}: {v:.4f}" for k, v in sorted(results.items())]
    return "\n".join(lines), results


# ---------------------------------------------------------------------------
# KITTI-style evaluation
# ---------------------------------------------------------------------------

KITTI_IOU = {"Car": 0.7, "Vehicle": 0.7, "Pedestrian": 0.5, "Cyclist": 0.5}
# difficulty gates: (max truncation, max occlusion, min bbox height px)
KITTI_DIFFICULTY = {0: (0.15, 0, 40), 1: (0.3, 1, 25), 2: (0.5, 2, 25)}


def kitti_style_eval(det_annos: List[dict], gt_annos: List[dict],
                     class_names: Sequence[str], n_points: int = 40):
    """3D AP per class x difficulty (protocol of kitti_object_eval_python).

    Uses lidar-frame boxes (boxes_lidar / gt_boxes_lidar); difficulty from the
    gt 'difficulty' field when present, else all easy.
    """
    results = {}
    for cls in class_names:
        iou_t = KITTI_IOU.get(cls, 0.5)
        for dlevel in (0, 1, 2):
            scores_l, tp_l, fp_l, ngt = [], [], [], 0
            for det, gt in zip(det_annos, gt_annos):
                dm = np.asarray(det["name"]) == cls
                dboxes = np.asarray(det["boxes_lidar"]).reshape(-1, 7)[dm]
                dscores = np.asarray(det["score"]).reshape(-1)[dm]
                gm = np.asarray(gt["name"]) == cls
                gboxes = np.asarray(gt["gt_boxes_lidar"]).reshape(-1, 7)[gm] if gm.any() else np.zeros((0, 7))
                dif = np.asarray(gt.get("difficulty", np.zeros(int(gm.sum()))))
                dif = dif[gm] if len(dif) == int(len(gm)) else np.zeros(len(gboxes))
                ignore = dif > dlevel
                tp, fp, _ = match_frame(dboxes, dscores, gboxes, iou_t, ignore)
                scores_l.append(dscores)
                tp_l.append(tp)
                fp_l.append(fp)
                ngt += int((~ignore).sum())
            scores = np.concatenate(scores_l) if scores_l else np.zeros(0)
            tp = np.concatenate(tp_l) if tp_l else np.zeros(0, bool)
            fp = np.concatenate(fp_l) if fp_l else np.zeros(0, bool)
            results[f"{cls}_3d/{['easy', 'moderate', 'hard'][dlevel]}_R{n_points}"] = (
                average_precision(scores, tp, fp, ngt, n_points=n_points) * 100
            )
    lines = [f"{k}: {v:.4f}" for k, v in sorted(results.items())]
    return "\n".join(lines), results


def recall_stats(det_annos, gt_annos, thresh_list=(0.3, 0.5, 0.7)):
    """Recall of detections vs gt at several IoU thresholds
    (detector3d_template.py:344-386 recall counters, eval_utils.py:94-101).

    Class-agnostic, score-ignoring: measures whether any detection covers
    each gt. Returns {'recall_0.3': ..., 'gt_count': N}.
    """
    hits = {t: 0 for t in thresh_list}
    total_gt = 0
    for det, gt in zip(det_annos, gt_annos):
        gboxes = np.asarray(gt["gt_boxes_lidar"]).reshape(-1, 7)
        dboxes = np.asarray(det["boxes_lidar"]).reshape(-1, 7)
        total_gt += len(gboxes)
        if len(gboxes) == 0 or len(dboxes) == 0:
            continue
        iou = iou_matrix(dboxes, gboxes)
        best = iou.max(axis=0)
        for t in thresh_list:
            hits[t] += int((best >= t).sum())
    out = {f"recall_{t}": (hits[t] / total_gt if total_gt else 0.0) for t in thresh_list}
    out["gt_count"] = total_gt
    return out
