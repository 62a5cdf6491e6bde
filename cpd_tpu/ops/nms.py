"""Rotated NMS and weighted box fusion with static shapes.

TPU-native replacement for the reference's mask-block CUDA NMS
(cpd/ops/iou3d_nms/src/iou3d_nms_kernel.cu ``nms_gpu``/``nms_normal_gpu``) and
the NMS/WBF wrappers (cpd/models/model_utils/model_nms_utils.py:14,115,137).

The CUDA version builds 64-bit suppression mask blocks; on TPU we instead
top-K the scores to a fixed pre-NMS capacity, build the full (K, K) rotated
IoU matrix in one fused vmap (MXU/VPU friendly), and run the greedy sweep as
a K-step ``lax.fori_loop`` over boolean vectors. K<=1024 keeps this cheap.
All outputs are fixed-size index arrays + validity masks (static shapes).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .iou3d import boxes_aligned_iou_bev, boxes_iou_bev, boxes_iou3d
from .geometry import limit_period


def _greedy_suppress(iou, valid, thresh):
    """iou: (K, K) of score-sorted boxes, valid: (K,) -> keep: (K,) bool."""
    k = iou.shape[0]
    suppress = iou > thresh

    def body(i, state):
        keep, suppressed = state
        is_kept = valid[i] & ~suppressed[i]
        keep = keep.at[i].set(is_kept)
        row = suppress[i] & is_kept
        row = row.at[i].set(False)
        suppressed = suppressed | row
        return keep, suppressed

    keep0 = jnp.zeros((k,), dtype=bool)
    keep, _ = jax.lax.fori_loop(0, k, body, (keep0, jnp.zeros((k,), dtype=bool)))
    return keep


def _fast_suppress(iou, valid, thresh):
    """YOLACT-style fast NMS (sanctioned by the reference test config
    ``USE_FAST_NMS: True``, voxel_rcnn_cproto_center.yaml): box i survives if
    no higher-scoring box overlaps it -- suppressed boxes still suppress.
    One triangular-mask reduction, no sequential loop."""
    k = iou.shape[0]
    j_lt_i = jnp.triu(jnp.ones((k, k), bool), k=1)  # [j, i] True iff j < i
    m = (iou > thresh) & j_lt_i & valid[:, None]  # j suppresses i
    return valid & ~jnp.any(m, axis=0)


@partial(jax.jit, static_argnames=("pre_max_size", "post_max_size", "use_bev_iou", "fast"))
def nms_bev(boxes, scores, thresh, pre_max_size=1024, post_max_size=256, valid=None,
            use_bev_iou=True, fast=False):
    """Rotated-BEV NMS.

    boxes: (N, 7+), scores: (N,). Returns (indices (post_max,), keep_mask (post_max,)):
    ``indices`` point into the original ``boxes`` order; invalid slots are 0
    with ``keep_mask`` False. Parity with reference ``nms_gpu``.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    scores = jnp.where(valid, scores, -jnp.inf)
    k = min(pre_max_size, n)
    top_scores, order = jax.lax.top_k(scores, k)
    top_valid = jnp.isfinite(top_scores)
    top_boxes = boxes[order]
    iou_fn = boxes_iou_bev if use_bev_iou else boxes_iou3d
    iou = iou_fn(top_boxes[:, :7], top_boxes[:, :7])
    if fast:
        keep = _fast_suppress(iou, top_valid, thresh)
    else:
        keep = _greedy_suppress(iou, top_valid, thresh)
    # compact kept indices to the front, fixed post_max_size
    keep_scores = jnp.where(keep, top_scores, -jnp.inf)
    m = min(post_max_size, k)
    sel_scores, sel = jax.lax.top_k(keep_scores, m)
    out_idx = order[sel]
    out_mask = jnp.isfinite(sel_scores)
    return out_idx, out_mask


@partial(jax.jit, static_argnames=("pre_max_size", "post_max_size"))
def nms_normal_bev(boxes, scores, thresh, pre_max_size=1024, post_max_size=256, valid=None):
    """Axis-aligned-footprint NMS (reference ``nms_normal_gpu``)."""
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    scores = jnp.where(valid, scores, -jnp.inf)
    k = min(pre_max_size, n)
    top_scores, order = jax.lax.top_k(scores, k)
    top_valid = jnp.isfinite(top_scores)
    top_boxes = boxes[order]
    iou = boxes_aligned_iou_bev(top_boxes[:, :7], top_boxes[:, :7])
    keep = _greedy_suppress(iou, top_valid, thresh)
    keep_scores = jnp.where(keep, top_scores, -jnp.inf)
    m = min(post_max_size, k)
    sel_scores, sel = jax.lax.top_k(keep_scores, m)
    return order[sel], jnp.isfinite(sel_scores)


def class_agnostic_nms(box_scores, box_preds, nms_config, score_thresh=None, valid=None):
    """Parity with model_nms_utils.class_agnostic_nms (model_nms_utils.py:115).

    Honors nms_config['USE_FAST_NMS'] (reference test config).
    """
    n = box_scores.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    if score_thresh is not None:
        valid = valid & (box_scores >= score_thresh)
    idx, mask = nms_bev(
        box_preds,
        box_scores,
        thresh=nms_config["NMS_THRESH"],
        pre_max_size=int(nms_config["NMS_PRE_MAXSIZE"]),
        post_max_size=int(nms_config["NMS_POST_MAXSIZE"]),
        valid=valid,
        fast=bool(nms_config.get("USE_FAST_NMS", False)),
    )
    sel_scores = jnp.where(mask, box_scores[idx], 0.0)
    return idx, mask, sel_scores


def multi_classes_nms(cls_scores, box_preds, nms_config, score_thresh=None, valid=None):
    """Per-class NMS (model_nms_utils.py:137). cls_scores: (N, num_classes).

    Returns (idx (C, post_max), mask (C, post_max), scores (C, post_max)); the
    class axis is kept fixed so callers can flatten + re-sort as needed.
    """
    num_classes = cls_scores.shape[1]
    outs = []
    for c in range(num_classes):
        outs.append(class_agnostic_nms(cls_scores[:, c], box_preds, nms_config, score_thresh, valid))
    idx = jnp.stack([o[0] for o in outs])
    mask = jnp.stack([o[1] for o in outs])
    scores = jnp.stack([o[2] for o in outs])
    return idx, mask, scores


def weighted_box_fusion(boxes, scores, labels, iou_thresh=0.7, valid=None):
    """Weighted Box Fusion with circular-mean yaw.

    Parity with model_nms_utils.compute_WBF (model_nms_utils.py:14): clusters
    boxes by rotated IoU against the score-sorted survivors, then replaces
    each survivor with the score-weighted mean of its cluster (yaw averaged
    via sin/cos). Static-shape version: every box joins the best-matching
    kept box above ``iou_thresh``.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    keep_idx, keep_mask = nms_bev(boxes, scores, thresh=iou_thresh, pre_max_size=n, post_max_size=n, valid=valid)
    kept_boxes = boxes[keep_idx]
    iou = boxes_iou_bev(kept_boxes[:, :7], boxes[:, :7])  # (K, N)
    same_label = labels[keep_idx][:, None] == labels[None, :]
    member = (iou >= iou_thresh) & valid[None, :] & keep_mask[:, None] & same_label
    w = jnp.where(member, scores[None, :], 0.0)  # (K, N)
    wsum = jnp.clip(jnp.sum(w, axis=1, keepdims=True), min=1e-6)
    wn = w / wsum
    fused_xyzdim = wn @ boxes[:, :6]
    yaw_sin = wn @ jnp.sin(boxes[:, 6])
    yaw_cos = wn @ jnp.cos(boxes[:, 6])
    fused_yaw = jnp.arctan2(yaw_sin, yaw_cos)
    fused = jnp.concatenate([fused_xyzdim, fused_yaw[:, None]], axis=-1)
    fused = jnp.where(keep_mask[:, None], fused, 0.0)
    fused_scores = jnp.where(keep_mask, scores[keep_idx], 0.0)
    fused_labels = jnp.where(keep_mask, labels[keep_idx], 0)
    return fused, fused_scores, fused_labels, keep_mask
