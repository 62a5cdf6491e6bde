"""CenterHead RPN: shared conv + separate regression branches + heatmap decode.

Parity with the reference CenterHead (cpd/models/dense_heads/center_head.py):
shared 3x3 conv (64ch) feeding SeparateHead branches hm / center / center_z /
dim / rot (:11-94), gaussian target assignment (:103-219 -- here fully
vectorized on device via cpd_tpu.ops.gaussian, no ``.cpu()`` round trip),
FocalLossCenterNet + RegLossCenterNet (:225-250) and top-K decode + NMS
proposals for the RoI head (:252-321 ``reorder_rois_for_refining``).

Layout note: feature maps here are NHWC (TPU conv layout); the channel-first
views expected by the decode/reg helpers are created by cheap transposes that
XLA folds into the convolutions.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import gaussian, nms
from ..ops import sparse
from ..utils import loss as loss_utils
from .norm import BatchNorm2d


class SeparateHead(nn.Module):
    head_channels: int
    out_channels: int
    num_conv: int = 2
    init_bias: float = 0.0
    bn_axis_name: Optional[str] = None
    # hidden convs in bf16 (matches the BEV stack); the OUT conv stays
    # f32 for prediction-map precision (its FLOPs are negligible)
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        for i in range(self.num_conv - 1):
            x = nn.Conv(self.head_channels, (3, 3), padding="SAME", use_bias=True,
                        dtype=self.compute_dtype, name=f"conv{i}")(x)
            x = BatchNorm2d(axis_name=self.bn_axis_name, name=f"bn{i}")(x, train)
            x = nn.relu(x)
        x = nn.Conv(
            self.out_channels, (3, 3), padding="SAME", use_bias=True,
            bias_init=nn.initializers.constant(self.init_bias), name="out",
        )(x.astype(jnp.float32))
        return x


class CenterHead(nn.Module):
    num_classes: int
    shared_conv_channel: int = 64
    num_hm_conv: int = 2
    head_order: Tuple[str, ...] = ("center", "center_z", "dim", "rot")
    head_dims: Tuple[int, ...] = (2, 1, 3, 2)
    voxel_size: Tuple[float, float, float] = (0.1, 0.1, 0.15)
    point_cloud_range: Tuple[float, ...] = (-75.2, -75.2, -2.0, 75.2, 75.2, 4.0)
    feature_map_stride: int = 8
    num_max_objs: int = 500
    gaussian_overlap: float = 0.1
    min_radius: int = 2
    cls_weight: float = 1.0
    loc_weight: float = 2.0
    code_weights: Tuple[float, ...] = (1.0,) * 8
    bn_axis_name: Optional[str] = None
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, bev_features, train: bool):
        """bev_features: (B, H, W, C) -> dict of NHWC prediction maps."""
        x = nn.Conv(self.shared_conv_channel, (3, 3), padding="SAME", use_bias=True,
                    dtype=self.compute_dtype, name="shared_conv")(bev_features)
        x = BatchNorm2d(axis_name=self.bn_axis_name, name="shared_bn")(x, train)
        x = nn.relu(x)
        preds = {
            "hm": SeparateHead(
                self.shared_conv_channel, self.num_classes, self.num_hm_conv,
                init_bias=-2.19, bn_axis_name=self.bn_axis_name,
                compute_dtype=self.compute_dtype, name="head_hm",
            )(x, train)
        }
        for name, dim in zip(self.head_order, self.head_dims):
            preds[name] = SeparateHead(
                self.shared_conv_channel, dim, 2, bn_axis_name=self.bn_axis_name,
                compute_dtype=self.compute_dtype, name=f"head_{name}",
            )(x, train)
        return preds

    # ---- pure helpers (no params) -------------------------------------

    def assign_targets(self, gt_boxes, gt_valid, feature_map_size):
        """Batched target assignment. gt_boxes: (B, N, 8); returns dict of stacks."""
        fn = lambda b, v: gaussian.assign_center_targets(
            b, v, self.num_classes, feature_map_size,
            self.voxel_size, self.point_cloud_range, self.feature_map_stride,
            self.gaussian_overlap, self.min_radius,
        )
        return jax.vmap(fn)(gt_boxes, gt_valid)

    def get_loss(self, preds, targets):
        """Focal heatmap loss + L1 reg loss at peak pixels (center_head.py:225-250)."""
        hm_pred = jax.nn.sigmoid(jnp.transpose(preds["hm"], (0, 3, 1, 2)))
        hm_loss = loss_utils.focal_loss_centernet(hm_pred, targets["heatmap"])
        reg_maps = jnp.concatenate([preds[k] for k in self.head_order], axis=-1)
        reg_maps = jnp.transpose(reg_maps, (0, 3, 1, 2))  # (B, 8, H, W)
        reg_loss = loss_utils.reg_loss_centernet(
            reg_maps, targets["target_boxes"], targets["inds"], targets["mask"]
        )
        loc_loss = jnp.sum(reg_loss * jnp.asarray(self.code_weights))
        total = self.cls_weight * hm_loss + self.loc_weight * loc_loss
        return total, {"hm_loss": hm_loss, "loc_loss": loc_loss}

    def generate_predicted_boxes(self, preds, k=500, score_thresh=0.1,
                                 nms_cfg=None, post_max_size=500):
        """Decode top-K + class-agnostic NMS -> fixed-size rois per sample.

        Returns dict rois (B, post, 7), roi_scores (B, post), roi_labels
        (B, post) 1-based, roi_valid (B, post).
        """
        hm = jax.nn.sigmoid(jnp.transpose(preds["hm"], (0, 3, 1, 2)))
        center = jnp.transpose(preds["center"], (0, 3, 1, 2))
        center_z = jnp.transpose(preds["center_z"], (0, 3, 1, 2))
        dim = jnp.transpose(preds["dim"], (0, 3, 1, 2))
        rot = jnp.transpose(preds["rot"], (0, 3, 1, 2))

        def decode_one(args):
            h, c, cz, d, r = args
            boxes, scores, labels, valid = gaussian.decode_bbox_from_heatmap(
                h, c, cz, d, r, self.voxel_size, self.point_cloud_range,
                self.feature_map_stride, k=k, score_thresh=score_thresh,
                post_center_limit_range=jnp.asarray(self.point_cloud_range),
            )
            if nms_cfg is not None:
                idx, mask = nms.nms_bev(
                    boxes, scores,
                    thresh=nms_cfg["NMS_THRESH"],
                    pre_max_size=min(int(nms_cfg["NMS_PRE_MAXSIZE"]), k),
                    post_max_size=min(int(nms_cfg["NMS_POST_MAXSIZE"]), post_max_size),
                    valid=valid,
                    fast=bool(nms_cfg.get("USE_FAST_NMS", True)),
                )
                boxes, scores, labels, valid = boxes[idx], scores[idx], labels[idx], mask
            return boxes, scores, labels + 1, valid

        def decode_tuple(h, ce, cz, di, ro):
            return decode_one((h, ce, cz, di, ro))

        boxes, scores, labels, valid = sparse.vmap_squeeze1(
            decode_tuple, hm, center, center_z, dim, rot)
        return {
            "rois": boxes,
            "roi_scores": scores,
            "roi_labels": labels.astype(jnp.int32),
            "roi_valid": valid,
        }
