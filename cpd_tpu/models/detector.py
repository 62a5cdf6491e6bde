"""Detector skeleton + registry: the TPU-native Detector3DTemplate.

Parity with the reference template (cpd/models/detectors/detector3d_template.py)
and VoxelRCNN assembly (detectors/voxel_rcnn.py): module topology
vfe -> backbone_3d -> map_to_bev -> backbone_2d -> dense_head -> roi_head,
built from the same YAML config keys (MODEL.VFE/BACKBONE_3D/...). Differences
by design:

* The VFE is fused into on-device dynamic voxelization (MeanVFE semantics:
  per-voxel mean; the reference additionally truncates voxels at 5 points --
  we average over ALL points in the voxel, which is strictly more accurate).
* The whole forward -- including voxelization and NMS -- is one jittable
  function of fixed-capacity arrays; train/eval steps wrap it with pjit.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import nms as nms_ops
from ..ops import sparse
from ..ops.sparse import GridSpec
from ..ops.voxelizer import VoxelizerSpec, voxelize_batch
from .anchor_head import (AnchorHeadSingle, AnchorHeadSingleV2,
                          point_density_anchor_mask)
from .backbone3d import VoxelBackBone8x, VoxelResBackBone8x, stage_grids
from .bev import BaseBEVBackbone, bev_align_params, height_compression
from .center_head import CenterHead
from .part_wraper import PartWraper
from .pfe import VoxelSetAbstraction
from .pillars import PillarVFE, pointpillar_scatter
from .roi_head import VoxelRCNNProtoHead
from .temporal import ConvGRU, ConvLSTM, TemporalConcatenation

_DENSE_HEADS = {
    "CenterHead": CenterHead,
    "AnchorHeadSingle": AnchorHeadSingle,
    "AnchorHeadSingleV2": AnchorHeadSingleV2,
}
_BACKBONES_3D = {
    "VoxelResBackBone8x": VoxelResBackBone8x,
    "VoxelBackBone8x": VoxelBackBone8x,
}
# VoxelRCNNHead is the ProtoHead with the MM/proto branch disabled
# (voxel_rcnn_head.py: same pooling/towers; CPD adds the second branch)
_ROI_HEADS = {"VoxelRCNNProtoHead": True, "VoxelRCNNHead": False}
# NAME-driven slots for the remaining module topology entries
# (detector3d_template.py:22-25,53-217). MeanVFE is the fused on-device
# voxelizer (mean over the voxel's points); PillarVFE is the PointPillars
# feature net. HeightCompression is the sparse->dense BEV projection;
# PointPillarScatter scatters pillar features straight to BEV (no 3D
# backbone -- the reference builds each module only when its cfg key
# exists, so a pillars config simply omits BACKBONE_3D).
_VFES = ("MeanVFE", "PillarVFE")
_MAP_TO_BEV = ("HeightCompression", "PointPillarScatter")
_TEMPORAL = {"TemporalConcatenation": TemporalConcatenation,
             "ConvGRU": ConvGRU, "ConvLSTM": ConvLSTM}
_PFES = {"VoxelSetAbstraction": VoxelSetAbstraction}
_WRAP_HEADS = {"PartWraper": PartWraper}


def keys_from_frame(frame, grid: GridSpec):
    """VoxelizedFrame coords -> sorted int32 keys with INVALID padding."""
    coords = frame.coords
    key = (coords[..., 0] * grid.ny + coords[..., 1]) * grid.nx + coords[..., 2]
    return jnp.where(frame.valid, key, sparse.INVALID_KEY).astype(jnp.int32)


class VoxelRCNN(nn.Module):
    """The CPD detector: VoxelResBackBone8x (+MM) -> BEV -> CenterHead -> ProtoHead."""

    num_classes: int = 3
    point_cloud_range: Tuple[float, ...] = (-75.2, -75.2, -2.0, 75.2, 75.2, 4.0)
    voxel_size: Tuple[float, float, float] = (0.1, 0.1, 0.15)
    max_voxels: int = 150000
    num_point_features: int = 5
    # spconv MeanVFE parity: 5 = first-5-points-per-voxel mean (reference
    # semantics, needed for imported cpd_pretrained checkpoints); None = mean
    # over ALL points in the voxel (TPU-native default)
    max_points_per_voxel: Any = None
    backbone_filters: Tuple[int, ...] = (16, 32, 64, 128)
    backbone_caps: Tuple[int, ...] = (80000, 60000, 40000, 40000)
    mm: bool = True
    remat: bool = True  # rematerialize backbone/pooling activations in training
    # selective override: None follows ``remat``; False stores the (bf16)
    # backbone activations and skips the backward replay -- fits batch-4 MM
    # on a 16G chip since the custom-VJP conv keeps no im2col residuals
    remat_backbone: Any = None
    remat_roi: Any = None
    with_roi_head: bool = True
    num_rois: int = 500          # proposals kept in training (reference TRAIN NMS_POST)
    num_rois_test: int = 200     # proposals refined at eval (reference TEST NMS_POST, yaml ROI_HEAD.NMS_CONFIG.TEST)
    roi_grid_size: int = 6
    roi_per_image: int = 130
    bn_axis_name: Optional[str] = None
    # NMS configs (RPN proposals / final post-processing)
    rpn_nms: Any = None  # dict like {'NMS_THRESH':0.8,...}; None = defaults
    post_nms: Any = None
    # NAME-driven module topology (detector3d_template.py:22-217): the module
    # of each slot is chosen by its config NAME
    backbone3d_name: str = "VoxelResBackBone8x"
    backbone_lut_max_cells: Any = None  # BACKBONE_3D.LUT_MAX_CELLS
    # BACKBONE_3D.DENSE_TAIL: run stage 4 + conv_out as dense MXU conv3d and
    # feed the BEV map straight from the dense grid (backbone3d.ResBranch.
    # _dense_tail); numerically equal to the sparse path, same param tree
    dense_tail: bool = False
    dense_head_name: str = "CenterHead"
    roi_head_name: str = "VoxelRCNNProtoHead"
    dense_head_cfg: Any = None  # extra kwargs for anchor heads (sizes, thresholds...)
    roi_head_cfg: Any = None    # extra kwargs (TARGET_CONFIG thresholds, proto weights)
    # X_TRAIN clone protocol (X_transform.py + height_compression.py ALIGN):
    # when >1 and the batch carries points{i} + transform_param, the extra
    # stages run through the SHARED-weight backbone and their BEV maps are
    # de-augmented into the stage-0 frame and fused by ``align_method``
    align_stages: int = 1
    align_method: str = "mean"  # first | max | mean
    # pack the S align-stage clones into the batch axis and run ONE backbone
    # pass at (S*B) rows -- the TPU equivalent of the reference's multi-stage
    # packing (spconv_backbone.py:241-260,332-393: stages share weights, so
    # their sparse tensors are folded into one batch and the rulebooks/GEMMs
    # dispatch once). False = S sequential backbone passes (lower peak HBM)
    pack_align_stages: bool = True
    # remaining NAME-driven topology slots (detector3d_template.py:22-25):
    # VFE / MAP_TO_BEV / TEMPORAL_MODEL / PFE / WRAP_HEAD. Defaults match the
    # shipped CPD configs (MeanVFE fused into the voxelizer, sparse-to-dense
    # HeightCompression, no temporal/pfe/wrap modules).
    vfe_name: str = "MeanVFE"
    vfe_filters: Tuple[int, ...] = (64,)
    map_to_bev_name: str = "HeightCompression"
    temporal_name: Any = None       # TemporalConcatenation | ConvGRU | ConvLSTM
    temporal_features: int = 256    # TEMPORAL_MODEL.NUM_TEMPORAL_FEATURES
    num_frames: int = 1             # history length T for the temporal model
    pfe_name: Any = None            # VoxelSetAbstraction
    pfe_cfg: Any = None             # extra kwargs (num_keypoints, nsample, ...)
    wrap_head_name: Any = None      # PartWraper
    # BACKBONE_2D schema (base_bev_backbone.py:6-150); defaults = CPD yamls
    bev_layer_nums: Tuple[int, ...] = (5, 5)
    bev_layer_strides: Tuple[int, ...] = (1, 2)
    bev_num_filters: Tuple[int, ...] = (128, 256)
    bev_upsample_strides: Tuple[int, ...] = (1, 2)
    bev_num_upsample_filters: Tuple[int, ...] = (256, 256)

    def setup(self):
        self.vox_spec = VoxelizerSpec.create(
            self.point_cloud_range, self.voxel_size, self.max_voxels,
            max_points_per_voxel=self.max_points_per_voxel,
        )
        nx, ny, nz = self.vox_spec.grid_size
        # spconv convention: +1 on z so the encoder bottoms out at depth 2
        self.grid = GridSpec(nx, ny, nz + 1)
        if self.vfe_name not in _VFES:
            raise KeyError(f"unknown VFE.NAME {self.vfe_name!r}; known: {_VFES}")
        if self.map_to_bev_name not in _MAP_TO_BEV:
            raise KeyError(f"unknown MAP_TO_BEV.NAME {self.map_to_bev_name!r}; "
                           f"known: {_MAP_TO_BEV}")
        if self.vfe_name == "PillarVFE":
            # PointPillars path: pillar feature net -> BEV scatter; there is
            # no 3D backbone (the reference omits BACKBONE_3D in such configs)
            if self.map_to_bev_name != "PointPillarScatter":
                raise ValueError("PillarVFE requires MAP_TO_BEV PointPillarScatter")
            if self.with_roi_head:
                raise ValueError("the RoI head pools multi-scale sparse voxel "
                                 "features; it needs a 3D backbone (not PillarVFE)")
            self.vfe = PillarVFE(num_filters=self.vfe_filters)
        elif self.backbone3d_name is None:
            raise ValueError("the HeightCompression path needs a BACKBONE_3D "
                             "(only PillarVFE+PointPillarScatter runs without one)")
        if self.backbone3d_name is not None and self.vfe_name != "PillarVFE":
            b3d_cls = _BACKBONES_3D[self.backbone3d_name]
            b3d_kwargs = dict(
                grid=self.grid,
                num_filters=self.backbone_filters,
                caps=self.backbone_caps,
                mm=self.mm,
                bn_axis_name=self.bn_axis_name,
                lut_max_cells=self.backbone_lut_max_cells,
            )
            if b3d_cls is VoxelResBackBone8x:
                b3d_kwargs["remat"] = (self.remat if self.remat_backbone is None
                                       else self.remat_backbone)
                b3d_kwargs["dense_tail"] = self.dense_tail
            self.backbone = b3d_cls(**b3d_kwargs)
        if self.temporal_name is not None:
            t_cls = _TEMPORAL[self.temporal_name]
            t_kw = ({"out_channels": self.temporal_features}
                    if t_cls is TemporalConcatenation
                    else {"hidden": self.temporal_features})
            self.temporal = t_cls(**t_kw)
        if self.pfe_name is not None:
            self.pfe = _PFES[self.pfe_name](
                voxel_size=self.voxel_size,
                point_cloud_range=self.point_cloud_range,
                **dict(self.pfe_cfg or {}),
            )
        if self.wrap_head_name is not None:
            self.wrap_head = _WRAP_HEADS[self.wrap_head_name](
                point_cloud_range=self.point_cloud_range,
                voxel_size=self.voxel_size,
            )
        self.bev_backbone = BaseBEVBackbone(
            layer_nums=tuple(self.bev_layer_nums),
            layer_strides=tuple(self.bev_layer_strides),
            num_filters=tuple(self.bev_num_filters),
            upsample_strides=tuple(self.bev_upsample_strides),
            num_upsample_filters=tuple(self.bev_num_upsample_filters),
            bn_axis_name=self.bn_axis_name)
        head_cls = _DENSE_HEADS[self.dense_head_name]
        if head_cls is CenterHead:
            self.dense_head = CenterHead(
                num_classes=self.num_classes,
                voxel_size=self.voxel_size,
                point_cloud_range=self.point_cloud_range,
                bn_axis_name=self.bn_axis_name,
            )
        else:
            self.dense_head = head_cls(
                num_classes=self.num_classes,
                point_cloud_range=self.point_cloud_range,
                **dict(self.dense_head_cfg or {}),
            )
        if self.with_roi_head:
            self.roi_head = VoxelRCNNProtoHead(
                num_rois=self.num_rois,
                roi_per_image=self.roi_per_image,
                grid_size=self.roi_grid_size,
                voxel_size=self.voxel_size,
                point_cloud_range=self.point_cloud_range,
                mm=self.mm and _ROI_HEADS[self.roi_head_name],
                remat=self.remat if self.remat_roi is None else self.remat_roi,
                scale_grids=stage_grids(self.grid),
                **dict(self.roi_head_cfg or {}),
            )

    @property
    def _anchor_head(self) -> bool:
        return self.dense_head_name != "CenterHead"

    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False):
        """batch: points (B, P, C), points_valid (B, P); train additionally
        points1/points1_valid (proto-completed view) when mm."""
        b = batch["points"].shape[0]
        if self.vfe_name == "PillarVFE":
            # PointPillars path: pillar feature net -> BEV scatter (no 3D
            # backbone, detector3d_template.py builds only configured slots)
            bev = self._pillar_bev(batch["points"], batch.get("points_valid"),
                                   train)
            backbone_out: Dict[str, Any] = {}
            return self._bev_to_heads(bev, backbone_out, batch, train)
        aligning = (self.align_stages > 1 and "transform_param" in batch
                    and "points_stage1" in batch)
        # pack at EVAL only, like the reference (spconv_backbone.py:241): in
        # training, per-stage BatchNorm batch statistics must match the
        # sequential formulation; at eval BN uses running stats so packing is
        # numerically identical
        packing = aligning and self.pack_align_stages and not train
        if packing:
            # X_TRAIN/X_TEST stage clones share the backbone weights: fold
            # them into the batch axis so the whole conv ladder (rulebooks +
            # GEMMs) dispatches ONCE at (S*B) rows instead of S times -- the
            # reference's multi-stage packing (spconv_backbone.py:241-260)
            pts = jnp.concatenate(
                [batch["points"]] + [batch[f"points_stage{i}"]
                                     for i in range(1, self.align_stages)], axis=0)
            ones = jnp.ones(batch["points"].shape[:2], bool)
            pv = jnp.concatenate(
                [batch.get("points_valid", ones)]
                + [batch.get(f"points_stage{i}_valid", ones)
                   for i in range(1, self.align_stages)], axis=0)
            frame = voxelize_batch(pts, self.vox_spec, pv)
        else:
            frame = voxelize_batch(batch["points"], self.vox_spec,
                                   batch.get("points_valid"))
        keys = keys_from_frame(frame, self.grid)
        feats_mm = keys_mm = None
        if self.mm and train:
            # proto-completed view; falls back to the raw points so the MM
            # branch parameters always exist (checkpoint tree stability)
            pts1 = batch.get("points1", batch["points"])
            pv1 = batch.get("points1_valid", batch.get("points_valid"))
            frame_mm = voxelize_batch(pts1, self.vox_spec, pv1)
            feats_mm = frame_mm.features
            keys_mm = keys_from_frame(frame_mm, self.grid)
        backbone_out = self.backbone(frame.features, keys, train, feats_mm, keys_mm)

        if "encoded_bev" in backbone_out:
            # dense-tail backbone already produced the BEV map (no sparse
            # round trip through height_compression)
            bev = backbone_out.pop("encoded_bev")
        else:
            enc_feats, enc_keys, enc_grid = backbone_out["encoded"]
            bev = height_compression(enc_feats, enc_keys, enc_grid)
        if packing:
            maps = [bev[i * b:(i + 1) * b] for i in range(self.align_stages)]
            bev = bev_align_params(
                maps, batch["transform_param"], self.point_cloud_range,
                self.voxel_size[0] * 8, fusion=self.align_method)
            # only the stage-0 rows feed the RoI head / downstream consumers
            backbone_out = {
                k: ({n: l[:b] for n, l in v.items()} if k == "stage_luts"
                    else (v[0][:b], v[1][:b], v[2]))
                for k, v in backbone_out.items()}
        elif aligning:
            # unpacked fallback: S sequential shared-weight backbone passes
            # (lower peak HBM; points_stage{i} naming -- "points1" is taken by
            # the MM proto-completed view in this batch protocol)
            maps = [bev]
            for i in range(1, self.align_stages):
                fr_i = voxelize_batch(batch[f"points_stage{i}"], self.vox_spec,
                                      batch.get(f"points_stage{i}_valid"))
                keys_i = keys_from_frame(fr_i, self.grid)
                bo_i = self.backbone(fr_i.features, keys_i, train)
                if "encoded_bev" in bo_i:
                    maps.append(bo_i["encoded_bev"])
                else:
                    ef, ek, eg = bo_i["encoded"]
                    maps.append(height_compression(ef, ek, eg))
            bev = bev_align_params(
                maps, batch["transform_param"], self.point_cloud_range,
                self.voxel_size[0] * 8, fusion=self.align_method)
        return self._bev_to_heads(bev, backbone_out, batch, train)

    def _bev_to_heads(self, bev, backbone_out, batch, train: bool):
        """Shared tail: (temporal fusion) -> 2D backbone -> dense head ->
        proposals -> (pfe) -> roi head -> (wrap head)."""
        b = batch["points"].shape[0]
        if self.temporal_name is not None:
            # BEV history fusion (temporal_cat.py / ConvGRU.py / ConvLSTM.py):
            # past frames ("points_prev{i}") run through the SHARED encoders;
            # missing history keys shorten the window (T=1 = fuse-only)
            maps = [bev]
            for i in range(1, self.num_frames):
                k = f"points_prev{i}"
                if k not in batch:
                    break
                maps.append(self._bev_single(batch[k], batch.get(k + "_valid"),
                                             train))
            bev = self.temporal(jnp.stack(maps, axis=1), train)
        st_features_2d = self.bev_backbone(bev, train)
        n_rois = self.num_rois if train else self.num_rois_test
        rpn_nms = dict(self.rpn_nms or {
            "NMS_THRESH": 0.8, "NMS_PRE_MAXSIZE": 4096,
        })
        rpn_nms["NMS_POST_MAXSIZE"] = n_rois
        if self._anchor_head:
            if self.dense_head_name == "AnchorHeadSingleV2":
                # only V2 consumes the point-density anchor mask
                # (anchor_head_single.py:31-194)
                h, w = st_features_2d.shape[1:3]
                amask = point_density_anchor_mask(
                    batch["points"], batch.get("points_valid"), (h, w),
                    self.point_cloud_range, self.grid.nx,
                )
                head_preds = self.dense_head(st_features_2d, train, amask)
            else:
                head_preds = self.dense_head(st_features_2d, train)
            proposals = self._anchor_proposals(head_preds, n_rois, rpn_nms)
        else:
            head_preds = self.dense_head(st_features_2d, train)
            proposals = self.dense_head.generate_predicted_boxes(
                head_preds, k=500, score_thresh=0.0 if train else 0.1,
                nms_cfg=rpn_nms, post_max_size=n_rois,
            )

        out = {
            "head_preds": head_preds,
            "backbone_out": backbone_out,
        }
        # proposals are constants to the second stage (reference proposal_layer
        # runs under no_grad, roi_head_template.py:52); RPN learns via its own loss
        proposals = jax.tree_util.tree_map(jax.lax.stop_gradient, proposals)
        out.update(proposals)
        if self.pfe_name is not None and backbone_out:
            # PV-RCNN-style keypoint features (voxel_set_abstraction.py);
            # exposed for point-head/roi consumers and downstream analysis
            ones = jnp.ones(batch["points"].shape[:2], bool)
            kp, kf, kv = self.pfe(batch["points"],
                                  batch.get("points_valid", ones),
                                  backbone_out, bev, train)
            out["point_coords"] = kp
            out["point_features"] = kf
            out["point_valid"] = kv
        if self.with_roi_head:
            roi_out = self.roi_head(
                proposals, backbone_out, batch, train,
            )
            out.update(roi_out)
        if self.wrap_head_name is not None:
            # part-based confidence re-scoring (part_wraper.py:151-210: the
            # wrap head's part confidences REPLACE the box cls scores)
            wboxes = out.get("batch_box_preds", out["rois"])[..., :7]
            wvalid = out["roi_valid"]
            part_conf, _ = self.wrap_head(st_features_2d, wboxes, wvalid, train)
            out["wrap_conf"] = part_conf
            out["wrap_boxes"] = wboxes
        return out

    def _pillar_bev(self, points, valid, train: bool):
        """PillarVFE over the dynamic-voxelizer output -> BEV scatter.

        The reference runs its pillar net on the stacked ragged batch
        (pillar_vfe.py); here the per-sample pillar tables are offset into
        one (B*V) table so the PointNet + BN + segment-max run once."""
        b, p, c = points.shape
        if valid is None:
            valid = jnp.ones((b, p), bool)
        frame = voxelize_batch(points, self.vox_spec, valid,
                               with_point_voxel_id=True)
        v = frame.features.shape[1]
        off = jnp.arange(b, dtype=jnp.int32)[:, None] * v
        pid = jnp.where(frame.point_voxel_id >= 0,
                        frame.point_voxel_id + off, -1)
        centers_xy = jnp.stack([
            (frame.coords[..., 2].astype(jnp.float32) + 0.5)
            * self.voxel_size[0] + self.point_cloud_range[0],
            (frame.coords[..., 1].astype(jnp.float32) + 0.5)
            * self.voxel_size[1] + self.point_cloud_range[1],
        ], axis=-1)
        pooled = self.vfe(points.reshape(b * p, c), pid.reshape(b * p),
                          frame.features[..., :3].reshape(b * v, 3),
                          centers_xy.reshape(b * v, 2), b * v, train)
        pooled = pooled.reshape(b, v, -1)
        keys = keys_from_frame(frame, self.grid)
        return jax.vmap(
            lambda f, k: pointpillar_scatter(f, k, self.grid))(pooled, keys)

    def _bev_single(self, points, valid, train: bool):
        """BEV map of ONE frame through the shared encoders (temporal history)."""
        if self.vfe_name == "PillarVFE":
            return self._pillar_bev(points, valid, train)
        frame = voxelize_batch(points, self.vox_spec, valid)
        keys = keys_from_frame(frame, self.grid)
        bo = self.backbone(frame.features, keys, train)
        if "encoded_bev" in bo:
            return bo["encoded_bev"]
        ef, ek, eg = bo["encoded"]
        return height_compression(ef, ek, eg)

    def _anchor_proposals(self, preds, n_rois, nms_cfg):
        """Anchor-head proposal layer: decode + class-agnostic NMS -> fixed-size
        roi set (roi_head_template.py proposal_layer semantics)."""
        boxes, scores = self.dense_head.generate_predicted_boxes(preds)
        best = jnp.max(scores, axis=-1)
        labels = (jnp.argmax(scores, axis=-1) + 1).astype(jnp.int32)
        pre = min(int(nms_cfg.get("NMS_PRE_MAXSIZE", 4096)), boxes.shape[1])

        def one(b, s, l):
            ts, ti = jax.lax.top_k(s, pre)
            bb, ll = b[ti], l[ti]
            idx, mask = nms_ops.nms_bev(
                bb, ts, thresh=nms_cfg["NMS_THRESH"],
                pre_max_size=pre, post_max_size=n_rois,
                valid=ts > 0.0,
                fast=bool(nms_cfg.get("USE_FAST_NMS", True)),
            )
            return bb[idx], ts[idx], ll[idx], mask

        rb, rs, rl, rv = sparse.vmap_squeeze1(one, boxes, best, labels)
        return {"rois": rb, "roi_scores": rs, "roi_labels": rl, "roi_valid": rv}

    # ---- losses ---------------------------------------------------------

    def compute_loss(self, out, batch):
        """Total training loss = dense-head loss + RoI-head loss (voxel_rcnn.py:29)."""
        if self._anchor_head:
            rpn_loss, tb = self.dense_head.get_loss(
                out["head_preds"], batch["gt_boxes"], batch["gt_valid"])
        else:
            h, w = out["head_preds"]["hm"].shape[1:3]
            targets = self.dense_head.assign_targets(
                batch["gt_boxes"], batch["gt_valid"], (h, w)
            )
            rpn_loss, tb = self.dense_head.get_loss(out["head_preds"], targets)
        total = rpn_loss
        if self.with_roi_head and "rcnn_cls" in out:
            rcnn_loss, tb2 = self.roi_head.get_loss(out, batch)
            total = total + rcnn_loss
            tb.update(tb2)
        if "wrap_conf" in out:
            wrap_loss = self.wrap_head.get_loss(
                out["wrap_conf"], out["wrap_boxes"], out["roi_valid"],
                batch["gt_boxes"], batch["gt_valid"])
            total = total + wrap_loss
            tb["wrap_loss"] = wrap_loss
        tb["rpn_loss"] = rpn_loss
        tb["total_loss"] = total
        return total, tb

    def loss_step(self, batch):
        """Forward + loss in one apply (the jitted train-step body)."""
        out = self(batch, train=True)
        return self.compute_loss(out, batch)

    def predict(self, batch):
        """Forward + final NMS in one apply (the jitted eval-step body)."""
        out = self(batch, train=False)
        return self.post_processing(out)

    # ---- post-processing --------------------------------------------------

    def post_processing(self, out, score_thresh=0.01, nms_cfg=None, post_max=500):
        """Final NMS over refined boxes (detector3d_template.py:222).

        Returns dict of fixed-size (B, post_max) boxes/scores/labels/valid.
        """
        nms_cfg = nms_cfg or {"NMS_THRESH": 0.3, "NMS_PRE_MAXSIZE": 4096,
                              "NMS_POST_MAXSIZE": post_max}
        if "wrap_conf" in out:
            # wrap head replaces the cls scores with its part confidences
            # (part_wraper.py:205-207 overwrites batch_cls_preds)
            boxes = out["wrap_boxes"]
            scores = out["wrap_conf"]
            labels = out["roi_labels"]
            valid = out["roi_valid"]
        elif "batch_box_preds" in out:  # two-stage refined
            boxes = out["batch_box_preds"]
            scores = jax.nn.sigmoid(out["batch_cls_preds"][..., 0])
            labels = out["roi_labels"]
            valid = out["roi_valid"]
        else:
            boxes = out["rois"]
            scores = out["roi_scores"]
            labels = out["roi_labels"]
            valid = out["roi_valid"]
        valid = valid & (scores > score_thresh)

        def one(b, s, l, v):
            idx, mask = nms_ops.nms_bev(
                b, s, thresh=nms_cfg["NMS_THRESH"],
                pre_max_size=min(int(nms_cfg["NMS_PRE_MAXSIZE"]), b.shape[0]),
                post_max_size=min(int(nms_cfg["NMS_POST_MAXSIZE"]), post_max),
                valid=v,
                fast=bool(nms_cfg.get("USE_FAST_NMS", True)),
            )
            return b[idx], s[idx], l[idx], mask

        fb, fs, fl, fv = sparse.vmap_squeeze1(one, boxes, scores, labels, valid)
        return {"pred_boxes": fb, "pred_scores": fs, "pred_labels": fl, "pred_valid": fv}


from .centerpoint import CenterPoint  # noqa: E402  (after VoxelRCNN to avoid cycle)

_DETECTORS = {"VoxelRCNN": VoxelRCNN, "CenterPoint": CenterPoint}


def _anchor_head_cfg(dh):
    """DENSE_HEAD yaml -> AnchorHeadSingle(/V2) kwargs
    (anchor_generator.py + anchor_head_template.py config schema)."""
    gen = dh.get("ANCHOR_GENERATOR_CONFIG", None)
    cfg = {}
    if gen:
        cfg["anchor_sizes"] = tuple(tuple(g["anchor_sizes"][0]) for g in gen)
        cfg["anchor_rotations"] = tuple(gen[0].get("anchor_rotations", (0, 1.57)))
        cfg["matched_thresholds"] = tuple(float(g["matched_threshold"]) for g in gen)
        cfg["unmatched_thresholds"] = tuple(float(g["unmatched_threshold"]) for g in gen)
    if "DIR_OFFSET" in dh:
        cfg["dir_offset"] = float(dh["DIR_OFFSET"])
    if "DIR_LIMIT_OFFSET" in dh:
        cfg["dir_limit_offset"] = float(dh["DIR_LIMIT_OFFSET"])
    if "NUM_DIR_BINS" in dh:
        cfg["num_dir_bins"] = int(dh["NUM_DIR_BINS"])
    lw = dh.get("LOSS_CONFIG", {}).get("LOSS_WEIGHTS", {})
    for yk, k in (("cls_weight", "cls_weight"), ("loc_weight", "loc_weight"),
                  ("dir_weight", "dir_weight")):
        if yk in lw:
            cfg[k] = float(lw[yk])
    if "code_weights" in lw:
        cfg["code_weights"] = tuple(float(x) for x in lw["code_weights"])
    return cfg


def _roi_head_cfg(roi):
    """ROI_HEAD yaml TARGET_CONFIG/LOSS_CONFIG -> VoxelRCNNProtoHead kwargs."""
    cfg = {}
    t = roi.get("TARGET_CONFIG", {})
    for yk, k in (("FG_RATIO", "fg_ratio"), ("REG_FG_THRESH", "reg_fg_thresh"),
                  ("CLS_FG_THRESH", "cls_fg_thresh"), ("CLS_BG_THRESH", "cls_bg_thresh"),
                  ("CLS_BG_THRESH_LO", "cls_bg_thresh_lo"),
                  ("HARD_BG_RATIO", "hard_bg_ratio"),
                  ("HARD_SAMPLING_THRESH", "hard_sampling_thresh"),
                  ("HARD_SAMPLING_RATIO", "hard_sampling_ratio"),
                  ("DIRECTION_MIN", "direction_min"),
                  ("DIRECTION_MAX", "direction_max")):
        if yk in t:
            v = t[yk]
            cfg[k] = tuple(float(x) for x in v) if isinstance(v, (list, tuple)) else float(v)
    if "CLS_SCORE_TYPE" in t:
        cfg["cls_score_type"] = str(t["CLS_SCORE_TYPE"])
    if "ENABLE_HARD_SAMPLING" in t:
        cfg["enable_hard_sampling"] = bool(t["ENABLE_HARD_SAMPLING"])
    lw = roi.get("LOSS_CONFIG", {}).get("LOSS_WEIGHTS", {})
    if "rcnn_proto_weight" in lw:
        cfg["rcnn_proto_weight"] = float(lw["rcnn_proto_weight"])
    gp = roi.get("ROI_GRID_POOL", {})
    if "USE_LUT" in gp:
        cfg["pool_use_lut"] = bool(gp["USE_LUT"])
    if "LUT_MAX_CELLS" in gp:
        cfg["pool_lut_max_cells"] = int(gp["LUT_MAX_CELLS"])
    if "DP_RATIO" in roi:
        cfg["dp_ratio"] = float(roi["DP_RATIO"])
    if "SHARED_FC" in roi:
        cfg["shared_fc"] = tuple(int(x) for x in roi["SHARED_FC"])
    return cfg


def build_network(model_cfg, num_class: int, data_cfg) -> nn.Module:
    """Config-driven detector factory (parity: cpd/models/__init__.py:9).

    NAME-driven module topology (detector3d_template.py:22-217): the
    BACKBONE_3D / DENSE_HEAD / ROI_HEAD modules are chosen by their yaml NAME
    (VFE is the fused on-device voxelizer; MAP_TO_BEV / BACKBONE_2D have one
    production implementation each, matching the shipped CPD configs).
    model_cfg/data_cfg: ConfigDicts with the reference YAML schema.
    """
    name = model_cfg.get("NAME", "VoxelRCNN")
    cls = _DETECTORS[name]
    pcr = tuple(data_cfg["POINT_CLOUD_RANGE"])
    vox_cfg = None
    for proc in data_cfg["DATA_PROCESSOR"]:
        if proc["NAME"] == "transform_points_to_voxels":
            vox_cfg = proc
    voxel_size = tuple(vox_cfg["VOXEL_SIZE"]) if vox_cfg else (0.1, 0.1, 0.15)
    max_voxels = int(vox_cfg["MAX_NUMBER_OF_VOXELS"]["train"]) if vox_cfg else 150000
    b3d = model_cfg.get("BACKBONE_3D", None)
    dh = model_cfg.get("DENSE_HEAD", {})
    roi = model_cfg.get("ROI_HEAD", None)
    dense_name = dh.get("NAME", "CenterHead")
    if dense_name not in _DENSE_HEADS:
        raise KeyError(f"unknown DENSE_HEAD.NAME {dense_name!r}; "
                       f"known: {sorted(_DENSE_HEADS)}")
    # BACKBONE_3D is optional (detector3d_template.py:68-69: only configured
    # slots are built -- a PointPillars config has no 3D backbone)
    b3d_name = b3d.get("NAME", "VoxelResBackBone8x") if b3d is not None else None
    if b3d_name is not None and b3d_name not in _BACKBONES_3D:
        raise KeyError(f"unknown BACKBONE_3D.NAME {b3d_name!r}; "
                       f"known: {sorted(_BACKBONES_3D)}")
    b3d = b3d or {}
    roi_name = roi.get("NAME", "VoxelRCNNProtoHead") if roi else "VoxelRCNNProtoHead"
    if roi is not None and roi_name not in _ROI_HEADS:
        raise KeyError(f"unknown ROI_HEAD.NAME {roi_name!r}; known: {sorted(_ROI_HEADS)}")
    dense_post = dh.get("POST_PROCESSING", {})
    default_caps = (max(max_voxels // 2, 1024),) + tuple(
        max(max_voxels // d, 512) for d in (4, 8, 8)
    )
    kwargs = dict(
        num_classes=num_class,
        point_cloud_range=pcr,
        voxel_size=voxel_size,
        max_voxels=max_voxels,
        backbone_filters=tuple(b3d.get("NUM_FILTERS", (16, 32, 64, 128))),
        backbone_caps=tuple(b3d.get("VOXEL_CAPS", default_caps)),
        mm=bool(b3d.get("MM", False)),
        # VFE.SPCONV_PARITY opts into the reference's first-5-points-per-voxel
        # mean (data_processor.py MAX_POINTS_PER_VOXEL + mean_vfe.py)
        max_points_per_voxel=(
            int(vox_cfg.get("MAX_POINTS_PER_VOXEL", 5))
            if vox_cfg and model_cfg.get("VFE", {}).get("SPCONV_PARITY", False)
            else None),
        backbone3d_name=b3d_name,
        backbone_lut_max_cells=(int(b3d["LUT_MAX_CELLS"])
                                if "LUT_MAX_CELLS" in b3d else None),
        dense_tail=bool(b3d.get("DENSE_TAIL", False)),
        dense_head_name=dense_name,
        dense_head_cfg=_anchor_head_cfg(dh) if dense_name != "CenterHead" else None,
        roi_head_name=roi_name,
        roi_head_cfg=_roi_head_cfg(roi) if roi else None,
        with_roi_head=roi is not None,
        num_rois=int(roi.get("NMS_CONFIG", {}).get("TRAIN", {}).get("NMS_POST_MAXSIZE", 500)) if roi else 500,
        num_rois_test=int(roi.get("NMS_CONFIG", {}).get("TEST", {}).get("NMS_POST_MAXSIZE", 200)) if roi else 200,
        roi_per_image=int(roi["TARGET_CONFIG"]["ROI_PER_IMAGE"]) if roi else 130,
        roi_grid_size=int(roi.get("ROI_GRID_POOL", {}).get("GRID_SIZE", 6)) if roi else 6,
        rpn_nms=dict(dense_post.get("NMS_CONFIG", {})) or None,
        post_nms=dict(model_cfg.get("POST_PROCESSING", {}).get("NMS_CONFIG", {})) or None,
    )
    # remaining NAME-driven slots (VFE / MAP_TO_BEV / TEMPORAL_MODEL / PFE /
    # WRAP_HEAD, detector3d_template.py:53-217)
    vfe = model_cfg.get("VFE", {}) or {}
    m2b = model_cfg.get("MAP_TO_BEV", {}) or {}
    tm = model_cfg.get("TEMPORAL_MODEL", None)
    pfe_c = model_cfg.get("PFE", None)
    wrap = model_cfg.get("WRAP_HEAD", None)
    pfe_kwargs = {}
    if pfe_c:
        if "NUM_KEYPOINTS" in pfe_c:
            pfe_kwargs["num_keypoints"] = int(pfe_c["NUM_KEYPOINTS"])
        if "NSAMPLE" in pfe_c:
            pfe_kwargs["nsample"] = int(pfe_c["NSAMPLE"])
    b2d = model_cfg.get("BACKBONE_2D", {}) or {}
    if "LAYER_NUMS" in b2d:
        kwargs.update(
            bev_layer_nums=tuple(b2d["LAYER_NUMS"]),
            bev_layer_strides=tuple(b2d.get("LAYER_STRIDES", (1, 2))),
            bev_num_filters=tuple(b2d.get("NUM_FILTERS", (128, 256))),
            bev_upsample_strides=tuple(b2d.get("UPSAMPLE_STRIDES", (1, 2))),
            bev_num_upsample_filters=tuple(
                b2d.get("NUM_UPSAMPLE_FILTERS", (256, 256))),
        )
    kwargs.update(
        vfe_name=vfe.get("NAME", "MeanVFE"),
        vfe_filters=tuple(vfe.get("NUM_FILTERS", (64,))),
        map_to_bev_name=m2b.get("NAME", "HeightCompression"),
        temporal_name=tm.get("NAME") if tm else None,
        temporal_features=int(tm.get("NUM_TEMPORAL_FEATURES", 256)) if tm else 256,
        num_frames=int(data_cfg.get("NUM_FRAMES", 1) or 1),
        pfe_name=pfe_c.get("NAME") if pfe_c else None,
        pfe_cfg=pfe_kwargs or None,
        wrap_head_name=wrap.get("NAME") if wrap else None,
    )
    # detectors expose different field subsets (e.g. CenterPoint has no roi
    # head); keep only the fields the chosen class declares
    import dataclasses

    known = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in kwargs.items() if k in known})
