"""PartWraper: part-based confidence re-scoring head.

Parity with cpd/models/wrap_head/part_wraper.py:51-210: samples a grid of
part points per predicted box, bilinearly samples a confidence map at their
BEV positions, trains with focal loss against IoU>0.7 targets, and rescales
box scores at inference. Optional WRAP_HEAD module (not in shipped configs).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.geometry import rotate_points_along_z
from ..ops.iou3d import boxes_iou3d
from ..utils import loss as loss_utils


def box_part_points(boxes, nx: int = 7, ny: int = 4):
    """(N, 7) -> (N, ny*nx, 2) BEV part-point grid inside each box."""
    gx = (jnp.arange(nx) + 0.5) / nx - 0.5
    gy = (jnp.arange(ny) + 0.5) / ny - 0.5
    xx, yy = jnp.meshgrid(gx, gy)
    unit = jnp.stack([xx.ravel(), yy.ravel()], axis=-1)  # (P, 2)
    pts = unit[None] * boxes[:, None, 3:5]
    pts3 = jnp.concatenate([pts, jnp.zeros_like(pts[..., :1])], axis=-1)
    pts3 = rotate_points_along_z(pts3, boxes[:, 6])
    return pts3[..., :2] + boxes[:, None, :2]


def bilinear_sample_bev(feature_map, xy, point_cloud_range, stride_m):
    """feature_map: (H, W, C); xy: (..., 2) metric -> (..., C)."""
    h, w, c = feature_map.shape
    u = (xy[..., 0] - point_cloud_range[0]) / stride_m - 0.5
    v = (xy[..., 1] - point_cloud_range[1]) / stride_m - 0.5
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    du = u - u0
    dv = v - v0

    def at(vi, ui):
        vi = jnp.clip(vi, 0, h - 1)
        ui = jnp.clip(ui, 0, w - 1)
        return feature_map[vi, ui]

    out = (
        at(v0, u0) * ((1 - du) * (1 - dv))[..., None]
        + at(v0, u0 + 1) * (du * (1 - dv))[..., None]
        + at(v0 + 1, u0) * ((1 - du) * dv)[..., None]
        + at(v0 + 1, u0 + 1) * (du * dv)[..., None]
    )
    return out


class PartWraper(nn.Module):
    """Confidence-map head over the BEV features + part-pooled rescoring."""

    point_cloud_range: Tuple[float, ...] = (-75.2, -75.2, -2.0, 75.2, 75.2, 4.0)
    feature_map_stride: int = 8
    voxel_size: Tuple[float, float, float] = (0.1, 0.1, 0.15)
    iou_thresh: float = 0.7

    @nn.compact
    def __call__(self, bev_features, boxes, box_valid, train: bool = False):
        """bev_features (B, H, W, C); boxes (B, N, 7) -> part confidence (B, N)."""
        conf_map = nn.Conv(1, (3, 3), padding="SAME", name="conf_conv")(bev_features)
        conf_map = jax.nn.sigmoid(conf_map)
        stride_m = self.voxel_size[0] * self.feature_map_stride

        def per_sample(cmap, bxs):
            pts = box_part_points(bxs)  # (N, P, 2)
            vals = bilinear_sample_bev(cmap, pts, self.point_cloud_range, stride_m)
            return jnp.mean(vals[..., 0], axis=-1)  # (N,)

        part_conf = jax.vmap(per_sample)(conf_map, boxes)
        return jnp.where(box_valid, part_conf, 0.0), conf_map

    def get_loss(self, part_conf, boxes, box_valid, gt_boxes, gt_valid):
        """Focal loss vs IoU>thresh targets (part_wraper.py:89-150)."""

        def per_sample(bxs, bv, gt, gv):
            iou = boxes_iou3d(bxs[:, :7], gt[:, :7])
            iou = jnp.where(gv[None, :], iou, 0.0)
            best = jnp.max(iou, axis=1)
            return (best > self.iou_thresh).astype(jnp.float32), bv

        targets, valid = jax.vmap(per_sample)(boxes, box_valid, gt_boxes, gt_valid)
        p = jnp.clip(part_conf, 1e-4, 1 - 1e-4)
        focal = -(targets * (1 - p) ** 2 * jnp.log(p)
                  + (1 - targets) * p ** 2 * jnp.log(1 - p))
        m = valid.astype(jnp.float32)
        return jnp.sum(focal * m) / jnp.clip(jnp.sum(m), min=1.0)
