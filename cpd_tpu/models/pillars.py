"""PointPillars-style components: PillarVFE + PointPillarScatter.

Parity with cpd/models/backbones_3d/vfe/pillar_vfe.py and
backbones_2d/map_to_bev/pointpillar_scatter.py: per-pillar PointNet (linear +
BN + ReLU + max-pool over the pillar's points) with center/offset feature
augmentation, then scatter into a dense BEV image. TPU version works on the
dynamic-voxelization output: per-point features are augmented with
(cluster-center offset, pillar-center offset) and segment-max-pooled by the
point->voxel id -- static shapes, no (V, 32, C) buffer.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.sparse import GridSpec, INVALID_KEY
from .norm import MaskedBatchNorm


class PillarVFE(nn.Module):
    """Pillar feature net over dynamic-voxelized points.

    Inputs are per-POINT: points (P, C), point_voxel_id (P,) into the pillar
    table, pillar mean xyz (V, 3), pillar centers xy (V, 2). Output (V, D).
    """

    num_filters: Tuple[int, ...] = (64,)
    use_norm: bool = True

    @nn.compact
    def __call__(self, points, point_voxel_id, pillar_mean, pillar_center, num_pillars,
                 train: bool = False):
        p = points.shape[0]
        ok = point_voxel_id >= 0
        pid = jnp.where(ok, point_voxel_id, num_pillars)
        mean_of_point = pillar_mean[jnp.clip(pid, 0, num_pillars - 1)]
        center_of_point = pillar_center[jnp.clip(pid, 0, num_pillars - 1)]
        feats = jnp.concatenate([
            points,
            points[:, :3] - mean_of_point,
            points[:, :2] - center_of_point,
        ], axis=-1)
        x = feats
        for i, f in enumerate(self.num_filters):
            x = nn.Dense(f, use_bias=not self.use_norm, name=f"pfn{i}")(x)
            if self.use_norm:
                x = MaskedBatchNorm(momentum=0.1, epsilon=1e-3)(x, ok, train)
            x = nn.relu(x)
        x = jnp.where(ok[:, None], x, -1e9)
        pooled = jax.ops.segment_max(x, pid, num_segments=num_pillars + 1)[:num_pillars]
        any_pt = jax.ops.segment_sum(ok.astype(jnp.int32), pid, num_segments=num_pillars + 1)[:num_pillars] > 0
        return jnp.where(any_pt[:, None], pooled, 0.0)


def pointpillar_scatter(pillar_features, keys, grid: GridSpec):
    """(V, D) + keys -> (ny, nx, D) BEV image (pointpillar_scatter.py parity;
    pillar grids have nz == 1 so keys are already BEV-linear)."""
    d = pillar_features.shape[-1]
    valid = keys != INVALID_KEY
    flat_keys = jnp.where(valid, keys % (grid.nx * grid.ny), 0)
    canvas = jnp.zeros((grid.nx * grid.ny, d), pillar_features.dtype)
    canvas = canvas.at[flat_keys].add(jnp.where(valid[:, None], pillar_features, 0.0))
    return canvas.reshape(grid.ny, grid.nx, d)
