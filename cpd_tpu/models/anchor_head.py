"""Anchor-based RPN heads for the DBSCAN/OYSTER baseline configs.

Parity with the reference anchor stack (cpd/models/dense_heads/
anchor_head_template.py:13-385, anchor_head_single.py:31-194,
target_assigner/{anchor_generator.py, axis_aligned_target_assigner.py}):
grid anchors per class at two rotations, axis-aligned nearest-BEV IoU
matching with per-class pos/neg thresholds, sin-difference localization loss,
direction-bin classification, and the V2 decomposed conv branches with a
point-density anchor mask. Assignment here is fully vectorized (no per-class
Python loops over boxes) and runs inside the jitted train step.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import iou3d
from ..ops.box_coders import ResidualCoder
from ..ops.geometry import limit_period
from ..utils import loss as loss_utils
from .norm import BatchNorm2d


def generate_anchors(grid_size_xy, point_cloud_range, anchor_sizes, anchor_rotations=(0.0, 1.5708),
                     anchor_bottom_heights=(-1.0,), align_center=False):
    """(H, W, S*R, 7) anchors over the BEV grid (anchor_generator.py:78 parity).

    anchor_sizes: (S, 3) per-class (dx, dy, dz).
    """
    nx, ny = grid_size_xy
    pcr = jnp.asarray(point_cloud_range)
    stride_x = (pcr[3] - pcr[0]) / nx
    stride_y = (pcr[4] - pcr[1]) / ny
    xs = pcr[0] + (jnp.arange(nx) + 0.5) * stride_x
    ys = pcr[1] + (jnp.arange(ny) + 0.5) * stride_y
    xg, yg = jnp.meshgrid(xs, ys, indexing="xy")  # (H=ny, W=nx)
    sizes = jnp.asarray(anchor_sizes)  # (S, 3)
    rots = jnp.asarray(anchor_rotations)  # (R,)
    s = sizes.shape[0]
    r = rots.shape[0]
    h, w = xg.shape
    anchors = jnp.zeros((h, w, s, r, 7))
    anchors = anchors.at[..., 0].set(xg[:, :, None, None])
    anchors = anchors.at[..., 1].set(yg[:, :, None, None])
    z = jnp.asarray(anchor_bottom_heights)[0] + sizes[:, 2] / 2
    anchors = anchors.at[..., 2].set(z[None, None, :, None])
    anchors = anchors.at[..., 3:6].set(sizes[None, None, :, None, :])
    anchors = anchors.at[..., 6].set(rots[None, None, None, :])
    return anchors.reshape(h, w, s * r, 7)


@partial(jax.jit, static_argnames=("match_height",))
def assign_anchor_targets(
    anchors_flat,  # (A, 7)
    anchor_class,  # (A,) int32 1-based class of each anchor
    gt_boxes,  # (G, 8) class in col 7
    gt_valid,  # (G,)
    matched_threshold,  # (A,) per-anchor pos threshold
    unmatched_threshold,  # (A,)
    match_height: bool = False,
):
    """Axis-aligned anchor-gt matching for ONE sample
    (axis_aligned_target_assigner.py:243 behavior, vectorized).

    Returns dict: labels (A,) in {-1 ignore, 0 bg, c fg-class}, gt_idx (A,),
    reg_weights implied by labels.
    """
    a = anchors_flat.shape[0]
    iou_fn = iou3d.boxes_iou3d if match_height else iou3d.boxes_aligned_iou_bev
    iou = iou_fn(anchors_flat[:, :7], gt_boxes[:, :7])  # (A, G)
    same_cls = anchor_class[:, None] == gt_boxes[None, :, 7].astype(jnp.int32)
    iou = jnp.where(same_cls & gt_valid[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    labels = jnp.full((a,), -1, jnp.int32)
    labels = jnp.where(best_iou < unmatched_threshold, 0, labels)
    fg = best_iou >= matched_threshold
    labels = jnp.where(fg, anchor_class, labels)
    # force-match: each gt claims its best anchor (of the right class)
    gt_best_anchor_iou = jnp.max(iou, axis=0)  # (G,)
    is_gt_best = (iou >= jnp.maximum(gt_best_anchor_iou[None, :], 1e-6)) & gt_valid[None, :]
    force = jnp.any(is_gt_best, axis=1)
    force_gt = jnp.argmax(is_gt_best, axis=1)
    labels = jnp.where(force, anchor_class, labels)
    best_gt = jnp.where(force, force_gt, best_gt)
    return {"labels": labels, "gt_idx": best_gt.astype(jnp.int32)}


class AnchorHeadSingle(nn.Module):
    """Single conv anchor head (anchor_head_single.py:194 parity)."""

    num_classes: int = 3
    point_cloud_range: Tuple[float, ...] = (-75.2, -75.2, -2.0, 75.2, 75.2, 4.0)
    anchor_sizes: Tuple = ((4.7, 2.1, 1.7), (0.91, 0.86, 1.73), (1.78, 0.84, 1.78))
    anchor_rotations: Tuple[float, ...] = (0.0, 1.5708)
    matched_thresholds: Tuple[float, ...] = (0.55, 0.5, 0.5)
    unmatched_thresholds: Tuple[float, ...] = (0.4, 0.35, 0.35)
    dir_offset: float = 0.78539
    dir_limit_offset: float = 0.0
    num_dir_bins: int = 2
    cls_weight: float = 1.0
    loc_weight: float = 2.0
    dir_weight: float = 0.2
    code_weights: Tuple[float, ...] = (1.0,) * 7

    def setup(self):
        self.coder = ResidualCoder(code_size=7)
        n_anchor = len(self.anchor_sizes) * len(self.anchor_rotations)
        self.conv_cls = nn.Conv(n_anchor * self.num_classes, (1, 1))
        self.conv_box = nn.Conv(n_anchor * self.coder.code_size, (1, 1))
        self.conv_dir = nn.Conv(n_anchor * self.num_dir_bins, (1, 1))

    def __call__(self, bev_features, train: bool = False):
        """(B, H, W, C) -> cls (B, H, W, A, K), box (B, H, W, A, 7), dir bins."""
        b, h, w, _ = bev_features.shape
        n_anchor = len(self.anchor_sizes) * len(self.anchor_rotations)
        cls = self.conv_cls(bev_features).reshape(b, h, w, n_anchor, self.num_classes)
        box = self.conv_box(bev_features).reshape(b, h, w, n_anchor, self.coder.code_size)
        dirp = self.conv_dir(bev_features).reshape(b, h, w, n_anchor, self.num_dir_bins)
        return {"cls_preds": cls, "box_preds": box, "dir_preds": dirp,
                "spatial_shape": (h, w)}

    # -- pure helpers -----------------------------------------------------
    def anchors(self, spatial_shape):
        h, w = spatial_shape
        anch = generate_anchors(
            (w, h), self.point_cloud_range, self.anchor_sizes, self.anchor_rotations
        )  # (H, W, A, 7)
        n_cls = len(self.anchor_sizes)
        n_rot = len(self.anchor_rotations)
        acls = jnp.repeat(jnp.arange(1, n_cls + 1, dtype=jnp.int32), n_rot)
        acls = jnp.broadcast_to(acls[None, None], (h, w, n_cls * n_rot))
        m_thr = jnp.repeat(jnp.asarray(self.matched_thresholds), n_rot)
        u_thr = jnp.repeat(jnp.asarray(self.unmatched_thresholds), n_rot)
        m_thr = jnp.broadcast_to(m_thr[None, None], acls.shape)
        u_thr = jnp.broadcast_to(u_thr[None, None], acls.shape)
        return anch, acls, m_thr, u_thr

    def get_loss(self, preds, gt_boxes, gt_valid):
        """Focal cls + sin-diff smooth-L1 reg + dir CE (anchor_head_template.py:219-297)."""
        h, w = preds["spatial_shape"]
        anch, acls, m_thr, u_thr = self.anchors((h, w))
        aflat = anch.reshape(-1, 7)
        acflat = acls.reshape(-1)

        def one(gt, gv):
            return assign_anchor_targets(aflat, acflat, gt, gv, m_thr.reshape(-1), u_thr.reshape(-1))

        tgt = jax.vmap(one)(gt_boxes, gt_valid)
        labels = tgt["labels"]  # (B, A)
        gt_idx = tgt["gt_idx"]
        if preds.get("anchor_mask") is not None:
            # V2 point-density mask: anchors away from any points are removed
            # from the anchor set in the reference (anchor_head_single.py:131);
            # static-shape equivalent = ignore label (-1) outside the mask
            n_anchor = labels.shape[1] // (h * w)
            mflat = jnp.repeat(preds["anchor_mask"].reshape(-1), n_anchor)
            labels = jnp.where(mflat[None, :], labels, -1)
        b = labels.shape[0]
        cls_preds = preds["cls_preds"].reshape(b, -1, self.num_classes)
        box_preds = preds["box_preds"].reshape(b, -1, self.coder.code_size)
        dir_preds = preds["dir_preds"].reshape(b, -1, self.num_dir_bins)

        cared = labels >= 0
        pos = labels > 0
        one_hot = jax.nn.one_hot(jnp.clip(labels - 1, 0), self.num_classes) * pos[..., None]
        cls_w = cared.astype(jnp.float32)
        cls_w = cls_w / jnp.clip(jnp.sum(pos, axis=1, keepdims=True), min=1.0)
        cls_loss = jnp.sum(loss_utils.sigmoid_focal_loss(cls_preds, one_hot, cls_w)) / b

        matched_gt = jnp.take_along_axis(gt_boxes, gt_idx[..., None], axis=1)  # (B, A, 8)
        targets = jax.vmap(lambda g, a: self.coder.encode(g[:, :7], a))(matched_gt, jnp.broadcast_to(aflat, (b,) + aflat.shape))
        # sin(a - b) trick on the heading channel
        sin_diff_pred = box_preds.at[..., 6].set(
            jnp.sin(box_preds[..., 6]) * jnp.cos(targets[..., 6]))
        sin_diff_tgt = targets.at[..., 6].set(
            jnp.cos(box_preds[..., 6]) * jnp.sin(targets[..., 6]))
        reg_w = pos.astype(jnp.float32)
        reg_w = reg_w / jnp.clip(jnp.sum(pos, axis=1, keepdims=True), min=1.0)
        reg_loss = jnp.sum(loss_utils.weighted_smooth_l1_loss(
            sin_diff_pred, sin_diff_tgt, reg_w, self.code_weights)) / b
        # direction bins
        rot_gt = matched_gt[..., 6] - self.dir_offset
        dir_tgt = jnp.clip(jnp.floor(limit_period(rot_gt, 0.0, 2 * jnp.pi) /
                                      (2 * jnp.pi / self.num_dir_bins)).astype(jnp.int32),
                           0, self.num_dir_bins - 1)
        dir_oh = jax.nn.one_hot(dir_tgt, self.num_dir_bins)
        dir_ce = -jnp.sum(dir_oh * jax.nn.log_softmax(dir_preds, -1), -1)
        dir_loss = jnp.sum(dir_ce * reg_w) / b
        total = (self.cls_weight * cls_loss + self.loc_weight * reg_loss
                 + self.dir_weight * dir_loss)
        return total, {"rpn_cls": cls_loss, "rpn_reg": reg_loss, "rpn_dir": dir_loss}

    def generate_predicted_boxes(self, preds):
        """Decode all anchors -> (B, A, 7) boxes + (B, A, K) scores
        (anchor_head_template.py:337 parity, incl. dir-bin yaw snap)."""
        h, w = preds["spatial_shape"]
        anch, _, _, _ = self.anchors((h, w))
        aflat = anch.reshape(-1, 7)
        b = preds["cls_preds"].shape[0]
        box_preds = preds["box_preds"].reshape(b, -1, self.coder.code_size)
        boxes = jax.vmap(lambda e: self.coder.decode(e, aflat))(box_preds)
        dir_labels = jnp.argmax(preds["dir_preds"].reshape(b, -1, self.num_dir_bins), -1)
        period = 2 * jnp.pi / self.num_dir_bins
        rot = limit_period(boxes[..., 6] - self.dir_offset, self.dir_limit_offset, period)
        boxes = boxes.at[..., 6].set(rot + self.dir_offset + period * dir_labels)
        scores = jax.nn.sigmoid(preds["cls_preds"].reshape(b, -1, self.num_classes))
        if preds.get("anchor_mask") is not None:
            n_anchor = scores.shape[1] // (h * w)
            mflat = jnp.repeat(preds["anchor_mask"].reshape(-1), n_anchor)
            scores = jnp.where(mflat[None, :, None], scores, 0.0)
        return boxes, scores


def point_density_anchor_mask(points, points_valid, spatial_shape,
                              point_cloud_range, grid_nx: int):
    """(H, W) bool anchor mask from point BEV density
    (anchor_head_single.py:88-125 ``get_anchor_mask`` semantics).

    The reference rasterizes ALL batch points into a 10x-coarse BEV occupancy
    grid (stride = round(voxel_size*8*10) meters, voxel_size = x_range/nx),
    then marks, for each occupied coarse cell c, the fine rows/cols
    [10c-10, 10c+10) -- i.e. block c and block c-1 fully, per axis. Kept
    batch-shared and static-shape here: one (H, W) mask, computed with a
    scatter + {0,+1} shift dilation + 10x upsample.

    points: (B, P, >=2) world xy in cols 0:2; points_valid: (B, P).
    """
    h, w = spatial_shape
    hl, wl = max(h // 10, 1), max(w // 10, 1)
    pcr = jnp.asarray(point_cloud_range, jnp.float32)
    voxel_size = (float(point_cloud_range[3]) - float(point_cloud_range[0])) / grid_nx
    stride = jnp.round(voxel_size * 8.0 * 10.0)
    ix = jnp.clip(((points[..., 0] - pcr[0]) / stride).astype(jnp.int32), 0, wl - 1)
    iy = jnp.clip(((points[..., 1] - pcr[1]) / stride).astype(jnp.int32), 0, hl - 1)
    flat = iy * wl + ix
    flat = jnp.where(points_valid, flat, hl * wl)  # dropped by mode="drop"
    occ = jnp.zeros((hl * wl,), jnp.bool_).at[flat.reshape(-1)].set(
        True, mode="drop").reshape(hl, wl)
    # dilation: fine block b is marked iff coarse cell b or b+1 occupied (per axis)
    occ_p = jnp.pad(occ, ((0, 1), (0, 1)))
    dil = occ_p[:-1, :-1] | occ_p[1:, :-1] | occ_p[:-1, 1:] | occ_p[1:, 1:]
    fine = jnp.repeat(jnp.repeat(dil, 10, axis=0), 10, axis=1)
    out = jnp.zeros((h, w), jnp.bool_)
    hh, ww = min(h, fine.shape[0]), min(w, fine.shape[1])
    return out.at[:hh, :ww].set(fine[:hh, :ww])


class _ConvBranch(nn.Module):
    """3x3 conv + BN + ReLU + 1x1 conv head (anchor_head_single.py get_layer)."""

    out_dim: int
    bias_init: Optional[float] = None
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        dim = x.shape[-1]
        x = nn.Conv(dim, (3, 3), use_bias=True)(x)
        x = BatchNorm2d(axis_name=self.bn_axis_name)(x, train)
        x = nn.relu(x)
        if self.bias_init is None:
            return nn.Conv(self.out_dim, (1, 1))(x)
        return nn.Conv(
            self.out_dim, (1, 1),
            bias_init=nn.initializers.constant(self.bias_init))(x)


class AnchorHeadSingleV2(AnchorHeadSingle):
    """Decomposed-branch anchor head with the point-density anchor mask
    (anchor_head_single.py:31-194 AnchorHeadSingleV2).

    A shared 3x3 conv (64ch) feeds five prediction branches -- cls (bias init
    -4.59), xy-reg, height, dims, angle -- whose box outputs are concatenated;
    the direction classifier reads the raw input features. The anchor mask
    rides in ``preds['anchor_mask']`` and is consumed by the template loss +
    decode (ignore labels / zero scores outside the mask)."""

    shared_channels: int = 64

    def setup(self):
        self.coder = ResidualCoder(code_size=7)
        n_anchor = len(self.anchor_sizes) * len(self.anchor_rotations)
        self.shared_conv = nn.Conv(self.shared_channels, (3, 3), use_bias=True)
        self.shared_bn = BatchNorm2d()
        self.branch_cls = _ConvBranch(n_anchor * self.num_classes, bias_init=-4.59,
                                      name="conv_cls")
        self.branch_reg = _ConvBranch(n_anchor * 2, name="conv_reg")
        self.branch_height = _ConvBranch(n_anchor * 1, name="conv_height")
        self.branch_dim = _ConvBranch(n_anchor * 3, name="conv_dim")
        self.branch_ang = _ConvBranch(n_anchor * 1, name="conv_ang")
        self.conv_dir = nn.Conv(n_anchor * self.num_dir_bins, (1, 1))

    def __call__(self, bev_features, train: bool = False, anchor_mask=None):
        b, h, w, _ = bev_features.shape
        n_anchor = len(self.anchor_sizes) * len(self.anchor_rotations)
        shard = nn.relu(self.shared_bn(self.shared_conv(bev_features), train))
        cls = self.branch_cls(shard, train).reshape(b, h, w, n_anchor, self.num_classes)
        box = jnp.concatenate([
            self.branch_reg(shard, train).reshape(b, h, w, n_anchor, 2),
            self.branch_height(shard, train).reshape(b, h, w, n_anchor, 1),
            self.branch_dim(shard, train).reshape(b, h, w, n_anchor, 3),
            self.branch_ang(shard, train).reshape(b, h, w, n_anchor, 1),
        ], axis=-1)
        dirp = self.conv_dir(bev_features).reshape(b, h, w, n_anchor, self.num_dir_bins)
        return {"cls_preds": cls, "box_preds": box, "dir_preds": dirp,
                "spatial_shape": (h, w), "anchor_mask": anchor_mask}
