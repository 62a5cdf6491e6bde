"""Point feature extraction: VoxelSetAbstraction (PV-RCNN style keypoints).

Parity with cpd/models/backbones_3d/pfe/voxel_set_abstraction.py:124-415 and
bev_features_interpolation.py: FPS keypoint sampling from the raw cloud,
multi-scale set abstraction over the sparse voxel features (voxel query +
grouped MLP + max-pool, the ops/pool primitives), and bilinear BEV feature
interpolation at the keypoints. Optional PFE registry module.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import pool
from .part_wraper import bilinear_sample_bev


class VoxelSetAbstraction(nn.Module):
    num_keypoints: int = 2048
    voxel_size: Tuple[float, float, float] = (0.1, 0.1, 0.15)
    point_cloud_range: Tuple[float, ...] = (-75.2, -75.2, -2.0, 75.2, 75.2, 4.0)
    feature_map_stride: int = 8
    mlp_channels: int = 32
    nsample: int = 16
    scale_specs: Tuple = (
        ("x_conv3", 4, (2, 2, 2), 1.2),
        ("x_conv4", 8, (2, 2, 2), 2.4),
    )
    use_bev: bool = True

    @nn.compact
    def __call__(self, points, points_valid, backbone_out, bev_features=None,
                 train: bool = False):
        """points (B, P, C) -> keypoints (B, K, 3), features (B, K, D)."""
        b = points.shape[0]

        def sample_one(pts, valid):
            sel = pool.farthest_point_sample(pts[:, :3], valid, self.num_keypoints)
            return pts[sel, :3], valid[sel]

        keypoints, kp_valid = jax.vmap(sample_one)(points, points_valid)

        feats = []
        for name, ds, qrange, radius in self.scale_specs:
            v_feats, v_keys, v_grid = backbone_out[name]
            pre = nn.relu(nn.Dense(self.mlp_channels, name=f"pre_{name}")(v_feats))

            def q_one(kp, keys):
                return pool.voxel_query(
                    kp, keys, v_grid, self.voxel_size, self.point_cloud_range,
                    ds, tuple(qrange), radius, self.nsample,
                )

            idx, valid, centers = jax.vmap(q_one)(keypoints, v_keys)
            rel = centers - keypoints[:, :, None, :]
            mlp = nn.Sequential([nn.Dense(self.mlp_channels), nn.relu,
                                 nn.Dense(self.mlp_channels), nn.relu],
                                name=f"mlp_{name}")
            pooled = jax.vmap(pool.group_and_pool, in_axes=(0, 0, 0, 0, None))(
                pre, idx, valid, rel, mlp)
            feats.append(pooled)
        if self.use_bev and bev_features is not None:
            stride_m = self.voxel_size[0] * self.feature_map_stride

            def bev_one(bev, kp):
                return bilinear_sample_bev(bev, kp[:, :2], self.point_cloud_range, stride_m)

            feats.append(jax.vmap(bev_one)(bev_features, keypoints))
        out = jnp.concatenate(feats, axis=-1)
        out = jnp.where(kp_valid[..., None], out, 0.0)
        return keypoints, out, kp_valid
