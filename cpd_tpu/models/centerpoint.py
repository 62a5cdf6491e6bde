"""CenterPoint single-stage detector (registered alternative).

Parity with cpd/models/detectors/centerpoint.py:4-50: same voxelize ->
sparse backbone -> BEV -> CenterHead stack as VoxelRCNN but no RoI head; the
decoded+NMS'd heatmap boxes ARE the final detections.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.sparse import GridSpec
from ..ops.voxelizer import VoxelizerSpec, voxelize_batch
from .backbone3d import VoxelResBackBone8x
from .bev import BaseBEVBackbone, height_compression
from .center_head import CenterHead
from .detector import keys_from_frame


class CenterPoint(nn.Module):
    num_classes: int = 3
    point_cloud_range: Tuple[float, ...] = (-75.2, -75.2, -2.0, 75.2, 75.2, 4.0)
    voxel_size: Tuple[float, float, float] = (0.1, 0.1, 0.15)
    max_voxels: int = 150000
    backbone_filters: Tuple[int, ...] = (16, 32, 64, 128)
    backbone_caps: Tuple[int, ...] = (80000, 60000, 40000, 40000)
    num_dets: int = 500
    post_nms: Any = None

    def setup(self):
        self.vox_spec = VoxelizerSpec.create(
            self.point_cloud_range, self.voxel_size, self.max_voxels
        )
        nx, ny, nz = self.vox_spec.grid_size
        self.grid = GridSpec(nx, ny, nz + 1)
        self.backbone = VoxelResBackBone8x(
            grid=self.grid, num_filters=self.backbone_filters, caps=self.backbone_caps,
            mm=False,
        )
        self.bev_backbone = BaseBEVBackbone()
        self.dense_head = CenterHead(
            num_classes=self.num_classes, voxel_size=self.voxel_size,
            point_cloud_range=self.point_cloud_range,
        )

    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False):
        frame = voxelize_batch(batch["points"], self.vox_spec, batch.get("points_valid"))
        keys = keys_from_frame(frame, self.grid)
        backbone_out = self.backbone(frame.features, keys, train)
        enc_feats, enc_keys, enc_grid = backbone_out["encoded"]
        bev = height_compression(enc_feats, enc_keys, enc_grid)
        st2d = self.bev_backbone(bev, train)
        head_preds = self.dense_head(st2d, train)
        out = {"head_preds": head_preds}
        if not train:
            nms_cfg = self.post_nms or {"NMS_THRESH": 0.7, "NMS_PRE_MAXSIZE": 4096,
                                        "NMS_POST_MAXSIZE": self.num_dets}
            dets = self.dense_head.generate_predicted_boxes(
                head_preds, k=500, score_thresh=0.1, nms_cfg=nms_cfg,
                post_max_size=self.num_dets,
            )
            out.update({
                "pred_boxes": dets["rois"], "pred_scores": dets["roi_scores"],
                "pred_labels": dets["roi_labels"], "pred_valid": dets["roi_valid"],
            })
        return out

    def loss_step(self, batch):
        out = self(batch, train=True)
        h, w = out["head_preds"]["hm"].shape[1:3]
        targets = self.dense_head.assign_targets(batch["gt_boxes"], batch["gt_valid"], (h, w))
        loss, tb = self.dense_head.get_loss(out["head_preds"], targets)
        tb["total_loss"] = loss
        return loss, tb

    def predict(self, batch):
        out = self(batch, train=False)
        return {k: out[k] for k in ("pred_boxes", "pred_scores", "pred_labels", "pred_valid")}
