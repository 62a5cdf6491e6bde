"""Adapter to the OFFICIAL Waymo Open Dataset detection metrics.

Parity target: cpd/datasets/waymo_unsupervised/waymo_eval.py:23-238
(OpenPCDetWaymoDetectionMetricsEstimator). When the ``waymo_open_dataset``
package (and TF) are installed, :func:`waymo_official_eval` runs the
official estimator with the reference's exact protocol:

  * per-frame arrays flattened with int64 frame ids
  * gt difficulty backfill: unset (0) becomes L1 when num_points_in_gt > 5
    else L2; zero-point gts dropped (waymo_eval.py:44-50)
  * 100 m distance mask on both sides (+0.5 slack, waymo_eval.py:169-176)
  * TYPE_HUNGARIAN matcher, TYPE_3D boxes, IoU 0.7/0.5/0.5, 101 score
    cutoffs (waymo_eval.py:89-111 build_config)
  * heading limited to (-pi, pi]

This image does not ship ``waymo_open_dataset``; the import is gated and
callers fall back to the NumPy Hungarian implementation in ``ap.py`` (same
matcher semantics), so real deployments can flip to the official metric by
installing the package -- no code change.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

WAYMO_CLASSES = ("unknown", "Vehicle", "Pedestrian", "Truck", "Cyclist")


def official_available() -> bool:
    try:  # pragma: no cover - package absent in this image
        import tensorflow  # noqa: F401
        from waymo_open_dataset.metrics.python import detection_metrics  # noqa: F401
        from waymo_open_dataset.protos import metrics_pb2  # noqa: F401

        return True
    except Exception:
        return False


def _limit_period(val, offset=0.5, period=np.pi):
    return val - np.floor(val / period + offset) * period


def flatten_annos(annos: List[dict], class_names: Sequence[str], is_gt: bool
                  ) -> Tuple[np.ndarray, ...]:
    """Frame-indexed flat arrays in the official estimator's layout
    (waymo_eval.py:26-87 generate_waymo_type_results).

    Returns (frame_id int64, boxes (N, 7), type uint8, score, difficulty).
    """
    frame_id, boxes, types, scores, diffs = [], [], [], [], []
    box_key = "gt_boxes_lidar" if is_gt else "boxes_lidar"
    for f, anno in enumerate(annos):
        names = np.asarray(anno["name"]).reshape(-1)
        bx = np.asarray(anno[box_key], np.float64).reshape(-1, 7).copy()
        if is_gt:
            mask = np.isin(names, list(class_names))
            npts = np.asarray(anno.get(
                "num_points_in_gt", np.full(len(names), 100))).reshape(-1)
            dif = np.asarray(anno.get(
                "difficulty", np.zeros(len(names)))).astype(np.int64).copy()
            # unset difficulty backfill + zero-point drop (waymo_eval.py:44-50)
            dif[(npts > 5) & (dif == 0)] = 1
            dif[(npts <= 5) & (dif == 0)] = 2
            mask = mask & (npts > 0)
            sc = np.ones(int(mask.sum()))
        else:
            mask = np.ones(len(names), bool)
            dif = np.zeros(len(names), np.int64)
            sc = np.asarray(anno["score"]).reshape(-1)[mask]
        bx = bx[mask]
        names = names[mask]
        dif = dif[mask]
        bx[:, 6] = _limit_period(bx[:, 6], offset=0.5, period=2 * np.pi)
        frame_id.append(np.full(len(bx), f, np.int64))
        boxes.append(bx)
        types.append(np.asarray(
            [WAYMO_CLASSES.index(n) if n in WAYMO_CLASSES else 0 for n in names],
            np.uint8))
        scores.append(sc)
        diffs.append(dif.astype(np.uint8))
    return (np.concatenate(frame_id), np.concatenate(boxes).reshape(-1, 7),
            np.concatenate(types), np.concatenate(scores), np.concatenate(diffs))


def distance_mask(boxes, *arrays, thresh: float = 100.0):
    """100 m range gate, +0.5 slack (waymo_eval.py:169-176)."""
    m = np.linalg.norm(boxes[:, :2], axis=1) < thresh + 0.5
    return (boxes[m],) + tuple(a[m] for a in arrays)


def waymo_official_eval(det_annos: List[dict], gt_annos: List[dict],
                        class_names: Sequence[str],
                        distance_thresh: float = 100.0) -> Dict[str, float]:
    """Run the OFFICIAL WOD detection metric (requires waymo_open_dataset).

    Raises ImportError when the package is absent -- callers fall back to
    :func:`cpd_tpu.evaluation.waymo_style_eval` (same TYPE_HUNGARIAN
    protocol, NumPy implementation).
    """
    import tensorflow as tf
    from google.protobuf import text_format
    from waymo_open_dataset.metrics.python import detection_metrics
    from waymo_open_dataset.protos import metrics_pb2

    pd_fid, pd_box, pd_type, pd_score, _ = flatten_annos(
        det_annos, class_names, is_gt=False)
    gt_fid, gt_box, gt_type, _, gt_dif = flatten_annos(
        gt_annos, class_names, is_gt=True)
    pd_box, pd_fid, pd_type, pd_score = distance_mask(
        pd_box, pd_fid, pd_type, pd_score, thresh=distance_thresh)
    gt_box, gt_fid, gt_type, gt_dif = distance_mask(
        gt_box, gt_fid, gt_type, gt_dif, thresh=distance_thresh)

    config = metrics_pb2.Config()
    text_format.Merge(
        """
        breakdown_generator_ids: OBJECT_TYPE
        difficulties { levels:1 levels:2 }
        matcher_type: TYPE_HUNGARIAN
        iou_thresholds: 0.0
        iou_thresholds: 0.7
        iou_thresholds: 0.5
        iou_thresholds: 0.5
        iou_thresholds: 0.5
        box_type: TYPE_3D
        """, config)
    for x in range(101):
        config.score_cutoffs.append(min(x * 0.01, 1.0))

    tf.compat.v1.disable_eager_execution()
    graph = tf.Graph()
    with graph.as_default():
        ph = {
            "pd_fid": tf.compat.v1.placeholder(dtype=tf.int64),
            "pd_box": tf.compat.v1.placeholder(dtype=tf.float32),
            "pd_type": tf.compat.v1.placeholder(dtype=tf.uint8),
            "pd_score": tf.compat.v1.placeholder(dtype=tf.float32),
            "pd_nlz": tf.compat.v1.placeholder(dtype=tf.bool),
            "gt_fid": tf.compat.v1.placeholder(dtype=tf.int64),
            "gt_box": tf.compat.v1.placeholder(dtype=tf.float32),
            "gt_type": tf.compat.v1.placeholder(dtype=tf.uint8),
            "gt_dif": tf.compat.v1.placeholder(dtype=tf.uint8),
        }
        metrics = detection_metrics.get_detection_metric_ops(
            config=config,
            prediction_frame_id=ph["pd_fid"], prediction_bbox=ph["pd_box"],
            prediction_type=ph["pd_type"], prediction_score=ph["pd_score"],
            prediction_overlap_nlz=ph["pd_nlz"],
            ground_truth_bbox=ph["gt_box"], ground_truth_type=ph["gt_type"],
            ground_truth_frame_id=ph["gt_fid"],
            ground_truth_difficulty=ph["gt_dif"],
        )
    with tf.compat.v1.Session(graph=graph) as sess:
        sess.run(tf.compat.v1.initializers.local_variables())
        sess.run([tf.group([v[1] for v in metrics.values()])], feed_dict={
            ph["pd_fid"]: pd_fid, ph["pd_box"]: pd_box, ph["pd_type"]: pd_type,
            ph["pd_score"]: pd_score,
            ph["pd_nlz"]: np.zeros(len(pd_box), bool),
            ph["gt_fid"]: gt_fid, ph["gt_box"]: gt_box, ph["gt_type"]: gt_type,
            ph["gt_dif"]: gt_dif,
        })
        return {k: float(np.asarray(sess.run([v[0]])[0]).reshape(-1)[0])
                for k, v in metrics.items()}
