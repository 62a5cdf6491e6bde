"""ATSS anchor target assigner (adaptive training sample selection).

Parity with cpd/models/dense_heads/target_assigner/atss_target_assigner.py:
per gt, take the top-k closest anchors (center distance) as candidates,
threshold at mean+std of their IoUs, require centers inside the gt box.
Vectorized static-shape version.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.iou3d import boxes_aligned_iou_bev
from ..ops.geometry import points_in_boxes_mask


@partial(jax.jit, static_argnames=("topk",))
def atss_assign(anchors, gt_boxes, gt_valid, topk: int = 9):
    """anchors (A, 7), gt (G, 8) -> labels (A,) {-1 bg, g index fg}, per-anchor gt.

    Returns dict labels (A,) int32 (gt index or -1), max_iou (A,).
    """
    a = anchors.shape[0]
    iou = boxes_aligned_iou_bev(anchors[:, :7], gt_boxes[:, :7])  # (A, G)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    dist = jnp.linalg.norm(anchors[:, None, :2] - gt_boxes[None, :, :2], axis=-1)
    dist = jnp.where(gt_valid[None, :], dist, jnp.inf)
    # top-k closest anchors per gt
    _, cand = jax.lax.top_k(-dist.T, min(topk, a))  # (G, k)
    cand_iou = jnp.take_along_axis(iou.T, cand, axis=1)  # (G, k)
    thr = jnp.mean(cand_iou, axis=1) + jnp.std(cand_iou, axis=1)  # (G,)
    # candidate anchors above per-gt threshold, with centers inside the gt
    inside = points_in_boxes_mask(
        jnp.concatenate([anchors[:, :2], gt_boxes[:, 2:3].mean() * jnp.ones((a, 1))], axis=1),
        gt_boxes[:, :7],
    )  # (G, A)
    ok = (iou.T >= thr[:, None]) & inside & gt_valid[:, None]  # (G, A)
    # each anchor takes the gt with max IoU among its accepting gts
    iou_masked = jnp.where(ok.T, iou, -1.0)
    best_gt = jnp.argmax(iou_masked, axis=1)
    best_iou = jnp.max(iou_masked, axis=1)
    labels = jnp.where(best_iou > 0, best_gt.astype(jnp.int32), -1)
    return {"labels": labels, "max_iou": best_iou}
