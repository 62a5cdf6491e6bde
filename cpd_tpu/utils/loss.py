"""Loss zoo (pure functions over batched arrays with validity masks).

Parity targets in the reference:
  - SigmoidFocalClassificationLoss (cpd/utils/loss_utils.py:10)
  - WeightedSmoothL1Loss / WeightedL1Loss (loss_utils.py:76,140)
  - FocalLossCenterNet / RegLossCenterNet (loss_utils.py:303,365)
  - get_corner_loss_lidar (loss_utils.py:210)
  - bb_loss: per-axis 1D IoU product x angle weight + angle cosine term +
    center distance (cpd/utils/bbloss.py:30) -- the CPD box-consistency loss.

All functions are shape-polymorphic jnp code; weights/masks make padding
slots contribute zero so everything is static-shape safe.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.geometry import boxes_to_corners_3d


def safe_norm(x, axis=-1, eps: float = 1e-9):
    """sqrt(sum(x^2) + eps): finite gradient at zero (plain norm NaNs there)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis) + eps)


def sigmoid_focal_loss(logits, targets, weights, gamma: float = 2.0, alpha: float = 0.25):
    """Per-anchor sigmoid focal loss.

    logits/targets: (..., C); weights: broadcastable to (...,). Returns (..., C).
    """
    p = jax.nn.sigmoid(logits)
    alpha_w = targets * alpha + (1 - targets) * (1 - alpha)
    pt = targets * (1.0 - p) + (1 - targets) * p
    focal = alpha_w * jnp.power(pt, gamma)
    bce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    loss = focal * bce
    return loss * weights[..., None]


def smooth_l1(diff, beta: float = 1.0 / 9.0):
    n = jnp.abs(diff)
    return jnp.where(n < beta, 0.5 * n ** 2 / beta, n - 0.5 * beta)


def weighted_smooth_l1_loss(preds, targets, weights, code_weights=None, beta: float = 1.0 / 9.0):
    """preds/targets: (..., D); weights: (...,). Returns (..., D)."""
    diff = preds - targets
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, dtype=diff.dtype)
    return smooth_l1(diff, beta) * weights[..., None]


def weighted_l1_loss(preds, targets, weights, code_weights=None):
    diff = preds - targets
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, dtype=diff.dtype)
    return jnp.abs(diff) * weights[..., None]


def binary_cross_entropy_with_logits(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def focal_loss_centernet(pred_hm, gt_hm, eps: float = 1e-4):
    """CornerNet penalty-reduced focal loss on sigmoid heatmaps.

    pred_hm: (B, C, H, W) probabilities in (0, 1); gt_hm gaussian targets.
    Normalized by #positives (gt == 1).
    """
    pred = jnp.clip(pred_hm, eps, 1.0 - eps)
    pos_mask = (gt_hm >= 1.0).astype(pred.dtype)
    neg_mask = 1.0 - pos_mask
    neg_weights = jnp.power(1.0 - gt_hm, 4.0)
    pos_loss = -jnp.log(pred) * jnp.power(1.0 - pred, 2.0) * pos_mask
    neg_loss = -jnp.log(1.0 - pred) * jnp.power(pred, 2.0) * neg_weights * neg_mask
    num_pos = jnp.sum(pos_mask)
    loss = jnp.sum(pos_loss) + jnp.sum(neg_loss)
    return loss / jnp.clip(num_pos, min=1.0)


def reg_loss_centernet(pred_map, targets, inds, mask):
    """L1 at gathered heatmap-peak locations.

    pred_map: (B, D, H, W) regression map; targets (B, N, D); inds (B, N) flat
    HW indices; mask (B, N) validity. Returns scalar-per-channel (D,) mean.
    """
    b, d, h, w = pred_map.shape
    flat = pred_map.reshape(b, d, h * w)
    gathered = jnp.take_along_axis(flat, inds[:, None, :], axis=2)  # (B, D, N)
    gathered = jnp.transpose(gathered, (0, 2, 1))  # (B, N, D)
    m = mask[..., None].astype(pred_map.dtype)
    loss = jnp.abs(gathered - targets) * m
    return jnp.sum(loss, axis=(0, 1)) / jnp.clip(jnp.sum(m), min=1.0)


def sanitize_boxes(boxes, valid):
    """Replace masked box rows with a finite unit box at the origin.

    Static-shape losses compute EVERY row, including masked garbage rois
    whose decoded dims can exp-overflow to inf (the reference's dynamic
    boolean indexing never sees those rows). Masking the OUTPUT alone is
    not enough: under autodiff an inf primal in the masked branch still
    yields NaN cotangents (0-cotangent x inf-tangent in the VJP), so the
    inputs themselves must be finite on masked rows -- the double-where
    pattern. ``valid`` broadcasts against ``boxes[..., 0]``."""
    unit = jnp.zeros_like(boxes).at[..., 3:6].set(1.0)
    return jnp.where((valid > 0)[..., None], boxes, unit)


def corner_loss_lidar(pred_boxes, gt_boxes, weights, beta: float = 1.0):
    """Huber loss over the 8 box corners, min over gt heading flip
    (loss_utils.py:210). pred/gt: (N, 7); weights: (N,). Returns (N,)."""
    # double-where: masked rows run on finite unit boxes (loss exactly 0
    # there) so both the forward sum and the VJP stay finite regardless of
    # what garbage the masked rows carry (see sanitize_boxes)
    pred_boxes = sanitize_boxes(pred_boxes, weights)
    gt_boxes = sanitize_boxes(gt_boxes, weights)
    pred_corners = boxes_to_corners_3d(pred_boxes)
    gt_corners = boxes_to_corners_3d(gt_boxes)
    gt_flip = gt_boxes.at[:, 6].add(jnp.pi)
    gt_corners_flip = boxes_to_corners_3d(gt_flip)
    d1 = safe_norm(pred_corners - gt_corners)
    d2 = safe_norm(pred_corners - gt_corners_flip)
    dist = jnp.minimum(d1, d2)  # (N, 8)
    loss = smooth_l1(dist, beta=beta)
    return jnp.where(weights > 0, jnp.mean(loss, axis=-1) * weights, 0.0)


def _axis_overlap_ratio(c1, d1, c2, d2):
    """Reference ``compute_iou`` (bbloss.py:21-29): 1D overlap divided by the
    HULL extent (max-min of the two intervals), NOT the union. The hull is
    clipped at 1e-6 (the reference divides unguarded; identical for any
    non-degenerate box)."""
    lo = jnp.maximum(c1 - d1 / 2, c2 - d2 / 2)
    hi = jnp.minimum(c1 + d1 / 2, c2 + d2 / 2)
    inter = jnp.clip(hi - lo, min=0.0)
    hull = jnp.clip(jnp.maximum(c1 + d1 / 2, c2 + d2 / 2)
                    - jnp.minimum(c1 - d1 / 2, c2 - d2 / 2), min=1e-6)
    return inter / hull


def _limit_angle(ang):
    """Wrap to (-pi, pi] (bbloss.py:5-12)."""
    ang = ang % (2 * jnp.pi)
    ang = jnp.where(ang > jnp.pi, ang - 2 * jnp.pi, ang)
    return jnp.where(ang < -jnp.pi, ang + 2 * jnp.pi, ang)


def bb_loss(pred_boxes, gt_boxes):
    """CPD box-consistency loss, exact reference formula (cpd/utils/bbloss.py:40).

    1 - (prod of per-axis overlap/hull ratios, x (1 - |sin dr|)) plus
    1.25 (1 - |cos dr|) and the SQUARED center distance, all x 1.5.
    pred/gt: (..., 7). Returns (...,). Golden-tested against the reference
    torch code in tests/test_reference_parity_torch.py.
    """
    iou_x = _axis_overlap_ratio(pred_boxes[..., 0], pred_boxes[..., 3], gt_boxes[..., 0], gt_boxes[..., 3])
    iou_y = _axis_overlap_ratio(pred_boxes[..., 1], pred_boxes[..., 4], gt_boxes[..., 1], gt_boxes[..., 4])
    iou_z = _axis_overlap_ratio(pred_boxes[..., 2], pred_boxes[..., 5], gt_boxes[..., 2], gt_boxes[..., 5])
    ang_w = 1.0 - jnp.abs(jnp.sin(_limit_angle(pred_boxes[..., 6])
                                  - _limit_angle(gt_boxes[..., 6])))
    iou3d = iou_x * iou_y * iou_z * ang_w
    ang = pred_boxes[..., 6] - gt_boxes[..., 6]
    angle_term = 1.25 * (1.0 - jnp.abs(jnp.cos(ang)))
    center_term = jnp.sum((pred_boxes[..., :3] - gt_boxes[..., :3]) ** 2, axis=-1)
    return 1.5 * ((1.0 - iou3d) + angle_term + center_term)


def cosine_consistency_loss(feat_a, feat_b, mask=None):
    """Negative-cosine feature consistency used by proto_loss
    (voxel_rcnn_head.py:388-459): -cos(a, stop_grad(b)) averaged over valid."""
    b = jax.lax.stop_gradient(feat_b)
    an = feat_a / safe_norm(feat_a)[..., None]
    bn = b / safe_norm(b)[..., None]
    cos = jnp.sum(an * bn, axis=-1)
    if mask is not None:
        m = mask.astype(cos.dtype)
        return -jnp.sum(cos * m) / jnp.clip(jnp.sum(m), min=1.0)
    return -jnp.mean(cos)


def odiou_3d(pred_boxes, gt_boxes, weights=None):
    """Differentiable rotated-IoU loss (cpd/utils/odiou_loss.py:824 odiou_3D).

    The reference builds a 900-LoC differentiable polygon-clipping chain; here
    the rotated-overlap construction in cpd_tpu.ops.iou3d is already plain
    jnp (sorting treated as constant under autodiff -- valid subgradients),
    so the loss is simply 1 - IoU3D, optionally weighted. pred/gt: (N, 7).
    """
    from ..ops.iou3d import boxes_iou3d

    iou = jax.vmap(lambda p, g: boxes_iou3d(p[None, :7], g[None, :7])[0, 0])(
        pred_boxes, gt_boxes
    )
    loss = 1.0 - iou
    if weights is not None:
        return jnp.sum(loss * weights) / jnp.clip(jnp.sum(weights), min=1.0)
    return jnp.mean(loss)
