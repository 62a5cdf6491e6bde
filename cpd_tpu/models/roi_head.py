"""VoxelRCNN RoI head + the CPD prototype-distillation ProtoHead.

Parity targets in the reference:
  - RoIHeadTemplate: proposal sampling, canonical-frame target assignment,
    reg/cls/corner losses (cpd/models/roi_heads/roi_head_template.py:15-301).
  - ProposalTargetLayer: fg/hard-bg/easy-bg sampling with per-class IoU
    matching and CSS plumbing (roi_heads/target_assigner/proposal_target_layer.py).
  - VoxelRCNNHead / VoxelRCNNProtoHead: 6^3 grid pooling over x_conv3/x_conv4
    via voxel query, dual raw/proto towers, CSS-weighted losses and the
    proto consistency loss (roi_heads/voxel_rcnn_head.py:16-917).

TPU re-design notes:
  * RoI sampling is static-shape: category ranks (fg / hard-bg / easy-bg) are
    computed with random priorities and dynamic quotas expressed as rank
    comparisons -- no boolean indexing, one top-k picks the 130 rois.
  * Voxel query uses the static-window binary-search form (cpd_tpu.ops.pool);
    both branches pool inside one jit so XLA overlaps their GEMMs.
  * Losses consume validity masks; padding rois contribute exactly zero.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import pool
from ..ops.box_coders import ResidualCoder
from ..ops.geometry import limit_period, rotate_points_along_z
from ..ops.iou3d import boxes_iou3d
from ..utils import loss as loss_utils
from .norm import MaskedBatchNorm


# ----------------------------------------------------------------------------
# proposal target sampling (pure, per-sample)
# ----------------------------------------------------------------------------

def _rank_by_random(mask, rng):
    """Rank elements of ``mask`` (True entries get ranks 0..n-1 in random order)."""
    n = mask.shape[0]
    r = jax.random.uniform(rng, (n,))
    key = jnp.where(mask, r, jnp.inf)
    order = jnp.argsort(key)
    ranks = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return jnp.where(mask, ranks, n)


def _ang_similarity(a, b):
    """1 - wrapped|a-b|/pi in [0, 1] (proposal_target_layer.py ang_weight)."""
    d = jnp.abs(a - b) % (2 * jnp.pi)
    d = jnp.minimum(d, 2 * jnp.pi - d)
    return 1.0 - d / jnp.pi


def _per_class(value, gt_cls):
    """Scalar or per-class tuple -> per-roi values keyed by gt class (1-based)."""
    if isinstance(value, (tuple, list)):
        return jnp.asarray(value)[jnp.clip(gt_cls - 1, 0, len(value) - 1)]
    return jnp.full(gt_cls.shape, float(value))


def sample_rois_for_rcnn(
    rng,
    rois,  # (R, 7)
    roi_scores,  # (R,)
    roi_labels,  # (R,) 1-based
    roi_valid,  # (R,)
    gt_boxes,  # (N, 8) with class in col 7
    gt_valid,  # (N,)
    css_score,  # (N,) per-gt CSS weight
    roi_per_image: int = 130,
    fg_ratio: float = 0.5,
    reg_fg_thresh=0.3,
    cls_fg_thresh=0.6,
    cls_bg_thresh=0.02,
    cls_bg_thresh_lo: float = 0.01,
    hard_bg_ratio: float = 0.1,
    cls_score_type: str = "roi_iou",
    direction_min: float = 0.4,
    direction_max: float = 0.8,
    enable_hard_sampling: bool = False,
    hard_sampling_thresh=0.3,
    hard_sampling_ratio=0.3,
):
    """Static-shape fg/bg RoI sampling with per-class IoU matching.

    ``cls_score_type`` implements every reference variant
    (proposal_target_layer.py:85-163): ``cls`` (hard labels, interval
    ignored as -1), ``roi_iou`` (soft IoU labels), ``roi_ioud`` (soft IoU x
    normalized heading similarity), and the per-class-threshold ``roi_iou_x``
    / ``roi_ioud_x`` (thresholds given as tuples). ``enable_hard_sampling``
    adds sub-REG_FG_THRESH rois above HARD_SAMPLING_THRESH to the regression
    pool at HARD_SAMPLING_RATIO (Bernoulli here; the reference picks a
    random-phase stride with the same marginal rate, :64-77).

    Returns dict of (roi_per_image,)-shaped arrays: rois, gt_of_rois (8),
    roi_ious, roi_labels, reg_valid_mask, cls_labels, css, valid.
    """
    iou = boxes_iou3d(rois[:, :7], gt_boxes[:, :7])  # (R, N)
    same_cls = roi_labels[:, None] == gt_boxes[None, :, 7].astype(jnp.int32)
    iou = jnp.where(same_cls & gt_valid[None, :] & roi_valid[:, None], iou, -1.0)
    max_iou = jnp.max(iou, axis=1)
    gt_idx = jnp.argmax(iou, axis=1)
    max_iou = jnp.clip(max_iou, min=0.0)

    def _minval(v):
        return min(v) if isinstance(v, (tuple, list)) else v

    fg_thresh = min(_minval(reg_fg_thresh), _minval(cls_fg_thresh))
    fg = roi_valid & (max_iou >= fg_thresh)
    easy_bg = roi_valid & (max_iou < cls_bg_thresh_lo)
    hard_bg = roi_valid & (max_iou >= cls_bg_thresh_lo) & (max_iou < fg_thresh)

    k_fg, k_hard, k_easy, k_fill, k_prio, k_hs = jax.random.split(rng, 6)
    fg_rank = _rank_by_random(fg, k_fg)
    hard_rank = _rank_by_random(hard_bg, k_hard)
    easy_rank = _rank_by_random(easy_bg, k_easy)

    fg_quota = int(round(roi_per_image * fg_ratio))
    n_fg = jnp.minimum(jnp.sum(fg.astype(jnp.int32)), fg_quota)
    sel_fg = fg & (fg_rank < fg_quota)
    bg_quota = roi_per_image - n_fg
    hard_quota = jnp.ceil(bg_quota * hard_bg_ratio).astype(jnp.int32)
    sel_hard = hard_bg & (hard_rank < hard_quota)
    n_hard = jnp.sum(sel_hard.astype(jnp.int32))
    sel_easy = easy_bg & (easy_rank < bg_quota - n_hard)
    n_easy = jnp.sum(sel_easy.astype(jnp.int32))
    # backfill: if not enough easy bg, take more hard bg; then any valid roi
    sel_hard2 = hard_bg & (hard_rank < bg_quota - n_easy)
    sel_hard = sel_hard | sel_hard2
    selected = sel_fg | sel_hard | sel_easy
    filler_rank = _rank_by_random(roi_valid & ~selected, k_fill)
    need = roi_per_image - jnp.sum(selected.astype(jnp.int32))
    filler = roi_valid & ~selected & (filler_rank < need)
    selected = selected | filler

    priority = (
        jnp.where(sel_fg, 3e6, 0.0)
        + jnp.where(sel_hard, 2e6, 0.0)
        + jnp.where(sel_easy, 1e6, 0.0)
        + jnp.where(filler, 5e5, 0.0)
        + jax.random.uniform(k_prio, max_iou.shape)
    )
    priority = jnp.where(selected, priority, -jnp.inf)
    _, sel_idx = jax.lax.top_k(priority, roi_per_image)
    sel_valid = jnp.isfinite(jnp.take(priority, sel_idx))

    s_rois = rois[sel_idx]
    s_iou = max_iou[sel_idx]
    s_gt_idx = gt_idx[sel_idx]
    s_gt = gt_boxes[s_gt_idx]
    s_labels = roi_labels[sel_idx]
    s_css = css_score[s_gt_idx]
    gt_cls = s_gt[:, 7].astype(jnp.int32)
    reg_thr = _per_class(reg_fg_thresh, gt_cls)
    reg_valid = (s_iou >= reg_thr) & sel_valid
    if enable_hard_sampling:
        hs_thr = _per_class(hard_sampling_thresh, gt_cls)
        hs_ratio = _per_class(hard_sampling_ratio, gt_cls)
        hard = (s_iou < reg_thr) & (s_iou > hs_thr)
        pick = jax.random.uniform(k_hs, s_iou.shape) < hs_ratio
        reg_valid = reg_valid | (hard & pick & sel_valid)
    # cls labels (proposal_target_layer.py:85-163 CLS_SCORE_TYPE variants)
    fg_t = _per_class(cls_fg_thresh, gt_cls)
    bg_t = _per_class(cls_bg_thresh, gt_cls)
    if cls_score_type == "cls":
        cls_labels = jnp.where(s_iou > fg_t, 1.0, 0.0)
        interval = (s_iou <= fg_t) & (s_iou > bg_t)
        cls_labels = jnp.where(interval, -1.0, cls_labels)
    else:
        soft = (s_iou - bg_t) / (fg_t - bg_t)
        cls_labels = jnp.where(s_iou > fg_t, 1.0,
                               jnp.where(s_iou < bg_t, 0.0, soft))
        if cls_score_type in ("roi_ioud", "roi_ioud_x"):
            ang = _ang_similarity(s_rois[:, 6], s_gt[:, 6])
            ang = (jnp.clip(ang, direction_min, direction_max)
                   - direction_min) / (direction_max - direction_min)
            cls_labels = cls_labels * ang
    cls_labels = jnp.where(sel_valid, cls_labels, 0.0)
    return {
        "rois": s_rois,
        "gt_of_rois": s_gt,
        "roi_ious": s_iou,
        "roi_labels": s_labels,
        "roi_scores": roi_scores[sel_idx],
        "reg_valid_mask": reg_valid,
        "cls_labels": cls_labels,
        "css": jnp.where(sel_valid, s_css, 0.0),
        "valid": sel_valid,
    }


def encode_roi_targets(rois, gt_of_rois, coder: ResidualCoder):
    """Canonical-frame regression targets (roi_head_template.py:116-147).

    Transforms gt into each roi's canonical frame (center subtract, -yaw
    rotate, heading difference wrapped with the flip rule), then encodes
    against the size-only local anchor.
    """
    roi_center = rois[:, 0:3]
    roi_yaw = rois[:, 6]
    gt_local = gt_of_rois[:, :7].at[:, 0:3].add(-roi_center)
    gt_local = gt_local.at[:, 6].add(-roi_yaw)
    xyz = rotate_points_along_z(gt_local[:, None, 0:3], -roi_yaw)[:, 0]
    gt_local = gt_local.at[:, 0:3].set(xyz)
    heading = limit_period(gt_local[:, 6], offset=0.5, period=jnp.pi * 2)
    # flip heading into (-pi/2, pi/2] so regression is well-conditioned
    flip = (heading > jnp.pi / 2) | (heading < -jnp.pi / 2)
    heading = jnp.where(flip, heading - jnp.sign(heading) * jnp.pi, heading)
    gt_local = gt_local.at[:, 6].set(heading)
    local_anchor = jnp.concatenate(
        [jnp.zeros_like(rois[:, 0:3]), rois[:, 3:6], jnp.zeros_like(rois[:, 6:7])],
        axis=-1,
    )
    return coder.encode(gt_local, local_anchor), gt_local


def decode_roi_boxes(rois, rcnn_reg, coder: ResidualCoder):
    """Inverse of encode_roi_targets (roi_head_template.py:269)."""
    local_anchor = jnp.concatenate(
        [jnp.zeros_like(rois[..., 0:3]), rois[..., 3:6], jnp.zeros_like(rois[..., 6:7])],
        axis=-1,
    )
    local = coder.decode(rcnn_reg, local_anchor)
    xyz = rotate_points_along_z(local[..., None, 0:3], rois[..., 6])[..., 0, :]
    out = local.at[..., 0:3].set(xyz + rois[..., 0:3])
    out = out.at[..., 6].add(rois[..., 6])
    return out


# ----------------------------------------------------------------------------
# grid pooling + towers
# ----------------------------------------------------------------------------

def compute_pool_queries(rois, scale_features, scale_grids, scale_specs,
                         voxel_size, point_cloud_range, grid_size, nsample,
                         suffix: str = "", use_lut=None, lut_max_cells=None,
                         stage_luts=None):
    """The gradient-free half of roi_grid_pool: grid points + voxel queries.

    Computed OUTSIDE the remat boundary (rois are stop-gradient constants and
    the joins are expensive to replay). Returns {(name, gi): (idx, valid, rel)}
    plus the flat queries (B, R*g^3, 3).

    ``stage_luts`` (optional {name(+suffix): bitmap LUT}) reuses the stage
    tables the backbone's rulebook builders already constructed for the same
    key sets instead of rebuilding them here.
    """
    b, r = rois.shape[:2]
    g3 = grid_size ** 3
    grid_pts = jax.vmap(lambda rb: pool.roi_grid_points(rb, grid_size))(rois)
    queries = grid_pts.reshape(b, r * g3, 3)
    out = {}
    for name, ds, *groups in scale_specs:
        _, keys = scale_features[name + suffix]
        grid = scale_grids[name]
        radii = tuple(float(rr) for _, rr in groups)
        qrange = tuple(max(g[0][d] for g in groups) for d in range(3))

        # LUT built OUTSIDE the vmapped query: an in-vmap dense scatter
        # trips a TPU compiler check (scatter_emitter operand_indices)
        eff_use = pool.QUERY_USE_LUT_DEFAULT if use_lut is None else use_lut
        eff_max = pool.QUERY_LUT_MAX_CELLS_DEFAULT if lut_max_cells is None else lut_max_cells
        luts = (stage_luts or {}).get(name + suffix) if eff_use else None
        if luts is None and eff_use and grid.num_cells <= eff_max:
            from ..ops import sparse as _sparse
            luts = _sparse.build_bitmap_lut_batched(keys, grid)
        if luts is not None:

            def q_multi(qxyz, k, l):
                return pool.voxel_query_multi(
                    qxyz, k, grid, tuple(voxel_size), point_cloud_range,
                    ds, qrange, radii, nsample, lut=l,
                )

            # per-sample unroll at batch > 1 (pool.unrolled_vmap): the
            # query joins are gather-bound and the batched lowering is ~2x
            # slower than per-sample issues
            group_results = pool.unrolled_vmap(q_multi, (queries, keys, luts))
        else:
            def q_multi(qxyz, k):
                return pool.voxel_query_multi(
                    qxyz, k, grid, tuple(voxel_size), point_cloud_range,
                    ds, qrange, radii, nsample, use_lut=False,
                )

            group_results = pool.unrolled_vmap(q_multi, (queries, keys))
        for gi, (idx, valid, centers) in enumerate(group_results):
            rel = centers - queries[:, :, None, :]
            out[f"{name}_{gi}"] = (idx, valid, rel)
    return out


class GridPoolBranch(nn.Module):
    """Pool multi-scale sparse features at roi grid points (roi_grid_pool).

    Two scales (x_conv3 ds=4, x_conv4 ds=8), two query groups per scale
    (config QUERY_RANGES/POOL_RADIUS), pre-MLP then grouped MLP + max-pool.
    The voxel queries come precomputed (compute_pool_queries); this module is
    the parameterized gather+MLP+pool half (the remat-able part).
    """

    voxel_size: Tuple[float, float, float]
    point_cloud_range: Tuple[float, ...]
    grid_size: int = 6
    nsample: int = 16
    mlp_channels: int = 32
    scale_specs: Tuple = (
        ("x_conv3", 4, ((2, 2, 2), 0.4), ((4, 4, 4), 0.8)),
        ("x_conv4", 8, ((2, 2, 2), 0.8), ((4, 4, 4), 1.6)),
    )
    scale_grids: Any = None  # {name: GridSpec}, static (required under remat)

    @nn.compact
    def __call__(self, rois, scale_features, query_results, suffix: str = ""):
        """rois: (B, R, 7); scale_features: {name: (feats, keys)};
        query_results from compute_pool_queries. Returns (B, R, grid^3 * C)."""
        b, r = rois.shape[:2]
        g3 = self.grid_size ** 3
        per_scale = []
        for name, ds, *groups in self.scale_specs:
            feats, _ = scale_features[name + suffix]
            # bf16 compute: halves the (Q, K) grouping-gather bytes and runs
            # the shared MLPs at full MXU rate (matches the backbone dtype)
            pre = nn.Dense(self.mlp_channels, dtype=jnp.bfloat16,
                           name=f"pre_{name}")(feats)
            pre = nn.relu(pre)
            for gi in range(len(groups)):
                idx, valid, rel = query_results[f"{name}_{gi}"]
                mlp = nn.Sequential([
                    nn.Dense(self.mlp_channels, dtype=jnp.bfloat16), nn.relu,
                    nn.Dense(self.mlp_channels, dtype=jnp.bfloat16), nn.relu,
                ], name=f"mlp_{name}_{gi}")
                # per-sample unroll of the (Q, nsample) grouping gathers at
                # batch > 1 (same batched-gather lowering penalty)
                pooled = pool.unrolled_vmap(
                    lambda p, i, v, r: pool.group_and_pool(p, i, v, r, mlp),
                    (pre, idx, valid, rel),
                )
                per_scale.append(pooled)  # (B, R*g3, mlp_channels)
        cat = jnp.concatenate(per_scale, axis=-1)  # (B, R*g3, C_total)
        return cat.reshape(b, r, g3 * cat.shape[-1])


class FCTower(nn.Module):
    """Reference FC tower block (voxel_rcnn_head.py:68-163): per hidden
    layer Linear(bias=False) + BatchNorm1d (torch defaults eps 1e-5,
    momentum 0.1) + ReLU, Dropout after every non-final hidden layer when
    DP_RATIO > 0, then an optional biased output Linear (cls/reg towers;
    ``out_dim=None`` is the shared tower, which stops after the last ReLU).
    BatchNorm runs MASKED over the valid roi rows (padding rois are a
    static-shape artifact the reference never sees)."""

    hidden: Tuple[int, ...] = (256, 256)
    out_dim: Optional[int] = 1
    dropout: float = 0.3
    # hidden layers in bf16; the OUT projection stays f32 for prediction
    # precision (its FLOPs are negligible). f32 in the torch-parity tests.
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, valid, train: bool):
        for i, h in enumerate(self.hidden):
            x = nn.Dense(h, use_bias=False, dtype=self.compute_dtype,
                         name=f"fc{i}")(x)
            x = MaskedBatchNorm(momentum=0.1, epsilon=1e-5,
                                name=f"bn{i}")(x, valid, train)
            x = nn.relu(x)
            if self.dropout > 0 and i < len(self.hidden) - 1:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        if self.out_dim is None:
            return x
        return nn.Dense(self.out_dim, name="out")(x.astype(jnp.float32))


class VoxelRCNNProtoHead(nn.Module):
    """Dual-branch RoI head with prototype distillation (voxel_rcnn_head.py:16-662)."""

    num_rois: int = 500
    roi_per_image: int = 130
    grid_size: int = 6
    voxel_size: Tuple[float, float, float] = (0.1, 0.1, 0.15)
    point_cloud_range: Tuple[float, ...] = (-75.2, -75.2, -2.0, 75.2, 75.2, 4.0)
    mm: bool = True
    remat: bool = True
    scale_grids: Any = None  # static {x_conv3: GridSpec, x_conv4: GridSpec}
    shared_fc: Tuple[int, ...] = (256, 256)
    dp_ratio: float = 0.3
    proto_ramp_steps: int = 5000
    proto_weight: float = 0.2          # ramp end value (voxel_rcnn_head.py:431-433)
    rcnn_proto_weight: float = 1.0     # LOSS_WEIGHTS['rcnn_proto_weight']
    # TARGET_CONFIG (proposal_target_layer.py; defaults = cproto_center yaml;
    # thresholds may be per-class tuples for the *_x CLS_SCORE_TYPEs)
    fg_ratio: float = 0.5
    reg_fg_thresh: Any = 0.3
    cls_fg_thresh: Any = 0.6
    cls_bg_thresh: Any = 0.02
    cls_bg_thresh_lo: float = 0.01
    hard_bg_ratio: float = 0.1
    cls_score_type: str = "roi_iou"
    direction_min: float = 0.4
    direction_max: float = 0.8
    enable_hard_sampling: bool = False
    hard_sampling_thresh: Any = 0.3
    hard_sampling_ratio: Any = 0.3
    # LUT tuning (ROI_GRID_POOL.{USE_LUT, LUT_MAX_CELLS}); None = pool defaults
    pool_use_lut: Any = None
    pool_lut_max_cells: Any = None
    # emit per-input non-finite counters from get_loss (debug only)
    debug_forensics: bool = False

    def setup(self):
        self.coder = ResidualCoder(code_size=7)
        # remat: the grid-pool gathers are cheap to recompute and huge to store
        pool_cls = (nn.remat(GridPoolBranch, static_argnums=(4,))
                    if self.remat else GridPoolBranch)
        self.pool_branch = pool_cls(
            self.voxel_size, self.point_cloud_range, self.grid_size,
            scale_grids=self.scale_grids,
        )
        self.shared0 = FCTower(hidden=tuple(self.shared_fc), out_dim=None,
                               dropout=self.dp_ratio)
        self.cls_tower0 = FCTower(out_dim=1, dropout=self.dp_ratio)
        self.reg_tower0 = FCTower(out_dim=7, dropout=self.dp_ratio)
        if self.mm:
            self.pool_branch_mm = pool_cls(
                self.voxel_size, self.point_cloud_range, self.grid_size,
                scale_grids=self.scale_grids,
            )
            self.shared1 = FCTower(hidden=tuple(self.shared_fc), out_dim=None,
                                   dropout=self.dp_ratio)
            self.cls_tower1 = FCTower(out_dim=1, dropout=self.dp_ratio)
            self.reg_tower1 = FCTower(out_dim=7, dropout=self.dp_ratio)

    def __call__(self, proposals, backbone_out, batch, train: bool):
        if train:
            rng = self.make_rng("sampling")
            rngs = jax.random.split(rng, proposals["rois"].shape[0])
            targets = jax.vmap(
                lambda r, ro, sc, lb, v, gt, gv, css: sample_rois_for_rcnn(
                    r, ro, sc, lb, v, gt, gv, css,
                    roi_per_image=self.roi_per_image,
                    fg_ratio=self.fg_ratio,
                    reg_fg_thresh=self.reg_fg_thresh,
                    cls_fg_thresh=self.cls_fg_thresh,
                    cls_bg_thresh=self.cls_bg_thresh,
                    cls_bg_thresh_lo=self.cls_bg_thresh_lo,
                    hard_bg_ratio=self.hard_bg_ratio,
                    cls_score_type=self.cls_score_type,
                    direction_min=self.direction_min,
                    direction_max=self.direction_max,
                    enable_hard_sampling=self.enable_hard_sampling,
                    hard_sampling_thresh=self.hard_sampling_thresh,
                    hard_sampling_ratio=self.hard_sampling_ratio,
                )
            )(
                rngs,
                proposals["rois"], proposals["roi_scores"], proposals["roi_labels"],
                proposals["roi_valid"], batch["gt_boxes"], batch["gt_valid"],
                batch.get("css_score", jnp.ones(batch["gt_boxes"].shape[:2])),
            )
            rois = targets["rois"]
            roi_labels = targets["roi_labels"]
            roi_valid = targets["valid"]
        else:
            targets = None
            rois = proposals["rois"]
            roi_labels = proposals["roi_labels"]
            roi_valid = proposals["roi_valid"]

        scale_features = {
            k: (v[0], v[1]) for k, v in backbone_out.items()
            if k.startswith(("x_conv3", "x_conv4"))
        }
        stage_luts = backbone_out.get("stage_luts")
        q0 = compute_pool_queries(rois, scale_features, self.scale_grids,
                                  self.pool_branch.scale_specs, self.voxel_size,
                                  self.point_cloud_range, self.grid_size,
                                  self.pool_branch.nsample, "",
                                  use_lut=self.pool_use_lut,
                                  lut_max_cells=self.pool_lut_max_cells,
                                  stage_luts=stage_luts)
        pooled0 = self.pool_branch(rois, scale_features, q0, "")
        shared0 = self.shared0(pooled0, roi_valid, train)
        rcnn_cls = self.cls_tower0(shared0, roi_valid, train)[..., 0]
        rcnn_reg = self.reg_tower0(shared0, roi_valid, train)
        out = {
            "rcnn_cls": rcnn_cls,
            "rcnn_reg": rcnn_reg,
            "shared_features0": shared0,
            "rois": rois,
            "roi_labels": roi_labels,
            "roi_valid": roi_valid,
        }
        if train:
            out["roi_targets"] = targets
        if train and self.mm and ("x_conv3_mm" in backbone_out):
            q1 = compute_pool_queries(rois, scale_features, self.scale_grids,
                                      self.pool_branch_mm.scale_specs, self.voxel_size,
                                      self.point_cloud_range, self.grid_size,
                                      self.pool_branch_mm.nsample, "_mm",
                                      use_lut=self.pool_use_lut,
                                      lut_max_cells=self.pool_lut_max_cells,
                                      stage_luts=stage_luts)
            pooled1 = self.pool_branch_mm(rois, scale_features, q1, "_mm")
            shared1 = self.shared1(pooled1, roi_valid, train)
            out["rcnn_cls_proto"] = self.cls_tower1(shared1, roi_valid, train)[..., 0]
            out["rcnn_reg_proto"] = self.reg_tower1(shared1, roi_valid, train)
            out["shared_features1"] = shared1
        if not train:
            out["batch_box_preds"] = decode_roi_boxes(rois, rcnn_reg, self.coder)
            out["batch_cls_preds"] = rcnn_cls[..., None]
        return out

    # ---- losses -----------------------------------------------------------

    def get_loss(self, out, batch):
        """CSS-weighted rcnn losses + proto consistency (voxel_rcnn_head.py:388-579)."""
        t = out["roi_targets"]
        rois = out["rois"]
        b, r = rois.shape[:2]
        flat = lambda x: x.reshape((b * r,) + x.shape[2:])
        reg_targets, gt_local = jax.vmap(
            lambda rb, gb: encode_roi_targets(rb, gb, self.coder)
        )(rois, t["gt_of_rois"])

        css = t["css"]
        valid = t["valid"]
        reg_mask = t["reg_valid_mask"].astype(jnp.float32) * css  # outline_reg_mask

        # cls: BCE on soft IoU labels, CSS-weighted for positives; -1 labels
        # (the 'cls' CLS_SCORE_TYPE's interval band) are ignored
        cls_w = jnp.where(t["reg_valid_mask"], css, 1.0) * valid.astype(jnp.float32)
        cls_w = cls_w * (t["cls_labels"] >= 0.0).astype(jnp.float32)
        cls_tgt = jnp.clip(t["cls_labels"], 0.0, 1.0)
        def cls_loss_fn(logits):
            bce = loss_utils.binary_cross_entropy_with_logits(logits, cls_tgt)
            return jnp.sum(bce * cls_w) / jnp.clip(jnp.sum(cls_w), min=1.0)

        def reg_loss_fn(reg_pred):
            l = loss_utils.weighted_smooth_l1_loss(reg_pred, reg_targets, reg_mask)
            loss = jnp.sum(l) / jnp.clip(jnp.sum(reg_mask), min=1.0)
            decoded = decode_roi_boxes(rois, reg_pred, self.coder)
            corner = jax.vmap(loss_utils.corner_loss_lidar)(
                decoded, t["gt_of_rois"][..., :7], reg_mask
            )
            return loss + jnp.sum(corner) / jnp.clip(jnp.sum(reg_mask), min=1.0)

        cls0 = cls_loss_fn(out["rcnn_cls"])
        reg0 = reg_loss_fn(out["rcnn_reg"])
        total = cls0 + reg0
        tb = {"rcnn_cls0": cls0, "rcnn_reg0": reg0}
        if self.debug_forensics:
            # NaN forensics (debug scaffolding, off by default): locate which
            # input of the reg loss went non-finite so the trainer's OWN
            # NaN-skip guard (trainer.py -- the reference has no such guard,
            # train_utils.py:41-45 never checks) can be attributed. Used by
            # scripts/exp_r4_nan.py / exp_r5_nan.py.
            mrow = reg_mask > 0
            tb["nonfinite_reg_targets"] = jnp.sum(
                ~jnp.isfinite(reg_targets) & mrow[..., None])
            tb["nonfinite_reg_pred"] = jnp.sum(
                ~jnp.isfinite(out["rcnn_reg"]) & mrow[..., None])
            tb["nonfinite_rois"] = jnp.sum(~jnp.isfinite(rois))
            tb["nonfinite_gt_of_rois"] = jnp.sum(~jnp.isfinite(t["gt_of_rois"]))
            tb["nonfinite_css"] = jnp.sum(~jnp.isfinite(css))
            tb["nonfinite_reg_mask"] = jnp.sum(~jnp.isfinite(reg_mask))
            tb["nonfinite_reg_targets_any"] = jnp.sum(~jnp.isfinite(reg_targets))
            tb["nonfinite_smoothl1"] = jnp.sum(~jnp.isfinite(
                loss_utils.weighted_smooth_l1_loss(out["rcnn_reg"], reg_targets,
                                                   reg_mask)))
            _dec = decode_roi_boxes(rois, out["rcnn_reg"], self.coder)
            tb["nonfinite_decoded"] = jnp.sum(~jnp.isfinite(_dec))
            tb["nonfinite_corner"] = jnp.sum(~jnp.isfinite(jax.vmap(
                loss_utils.corner_loss_lidar)(_dec, t["gt_of_rois"][..., :7],
                                              reg_mask)))

        if "rcnn_cls_proto" in out:
            cls1 = cls_loss_fn(out["rcnn_cls_proto"])
            reg1 = reg_loss_fn(out["rcnn_reg_proto"])
            tb.update({"rcnn_cls1": cls1, "rcnn_reg1": reg1})
            # proto block, reference formula (voxel_rcnn_head.py:556-579):
            #   rcnn_loss = cls0 + reg0
            #             + rcnn_proto_weight * (0.5*(cls1 + reg1) + proto_loss)
            # proto_loss (voxel_rcnn_head.py:388-459): boxes are decoded in
            # the CANONICAL roi frame (rois zeroed at origin and yaw);
            #   b_loss0 = sum(bb(pred0_ct, gt_ct) * css * fg) / (fg.sum()+1)
            #             -- UNRAMPED;
            #   b_loss1 = same vs stop_grad(pred1_ct), ramped TWICE
            #             (`b_loss1 *= w` appears twice in the reference);
            #   cosine consistency masked by (cls_label >= 0) * css, ramped
            #             once; w ramps 1e-5 -> 0.2 over 5000 iters.
            local_anchor = jnp.concatenate(
                [jnp.zeros_like(rois[..., 0:3]), rois[..., 3:6],
                 jnp.zeros_like(rois[..., 6:7])], axis=-1)
            pred0_ct = self.coder.decode(out["rcnn_reg"], local_anchor)
            pred1_ct = self.coder.decode(out["rcnn_reg_proto"], local_anchor)
            fgf = t["reg_valid_mask"].astype(jnp.float32) * valid.astype(jnp.float32)
            denom = jnp.sum(fgf) + 1.0
            # double-where (see loss.sanitize_boxes): masked rows' decoded
            # dims can exp-overflow to inf; sanitize the INPUTS so both the
            # forward sum and the VJP stay finite, then mask the output
            p0 = loss_utils.sanitize_boxes(pred0_ct, fgf)
            g0 = loss_utils.sanitize_boxes(gt_local, fgf)
            p1 = loss_utils.sanitize_boxes(pred1_ct, fgf)
            b_loss0 = jnp.sum(jnp.where(
                fgf > 0,
                loss_utils.bb_loss(p0, g0) * css * fgf, 0.0)) / denom
            b_loss1 = jnp.sum(jnp.where(
                fgf > 0,
                loss_utils.bb_loss(p0, jax.lax.stop_gradient(p1))
                * css * fgf, 0.0)) / denom
            # cosine mask = (cls_labels >= 0) * css (voxel_rcnn_head.py:448-451)
            # -- for the shipped 'roi_iou' label type labels are never < 0 so
            # this equals valid*css; 'cls'-type interval-band rois (-1) differ
            feat_cons = loss_utils.cosine_consistency_loss(
                out["shared_features0"], out["shared_features1"],
                mask=(valid.astype(jnp.float32)
                      * (t["cls_labels"] >= 0.0).astype(jnp.float32) * css),
            )
            it = batch.get("cur_it", jnp.asarray(self.proto_ramp_steps, jnp.float32))
            ramp = jnp.clip(it / self.proto_ramp_steps, min=0.0, max=1.0)
            w = 1e-5 + ramp * (self.proto_weight - 1e-5)
            proto = b_loss0 + w * w * b_loss1 + w * feat_cons
            total = total + self.rcnn_proto_weight * (0.5 * (cls1 + reg1) + proto)
            tb["proto_loss"] = proto
        return total, tb
