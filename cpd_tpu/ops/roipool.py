"""RoI-aware / RoI-point pooling (parity with the reference CUDA ops).

TPU-native replacements for:
  - ``roiaware_pool3d`` (cpd/ops/roiaware_pool3d/src/roiaware_pool3d_kernel.cu
    :173-176 forward max/avg): per-RoI voxel-grid pooling of point features.
  - ``roipoint_pool3d`` (cpd/ops/roipoint_pool3d/src/roipoint_pool3d_kernel.cu):
    first-k points inside each RoI, with an empty flag.

Both are off the CPD model path (the RoI head pools sparse conv features via
voxel queries instead) but complete the reference op surface. Design: static
shapes; membership via the affine points-in-box test; cell pooling as one
segment reduction per box (vmapped); first-k via a stable argsort on the
membership mask (preserves point order, the CUDA scan order).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .geometry import points_in_box, rotate_points_along_z


def _local_coords(points, box):
    """(N, 3) world -> (N, 3) box-local coords (x fwd, y left, z up)."""
    shifted = points[:, :3] - box[None, 0:3]
    c, s = jnp.cos(-box[6]), jnp.sin(-box[6])
    lx = shifted[:, 0] * c - shifted[:, 1] * s
    ly = shifted[:, 0] * s + shifted[:, 1] * c
    return jnp.stack([lx, ly, shifted[:, 2]], axis=1)


@partial(jax.jit, static_argnames=("out_size", "pool_method"))
def roiaware_pool3d(points, point_features, boxes, out_size: int = 6,
                    pool_method: str = "max", points_valid=None,
                    boxes_valid=None):
    """Per-RoI voxel-grid pooling (roiaware_pool3d_kernel.cu:173 semantics).

    points (N, 3+); point_features (N, C); boxes (M, 7) -> (M, G, G, G, C)
    pooled features (``max``: 0 for empty cells, like the CUDA op's
    zero-init; ``avg``: mean over the cell's points).
    """
    g = out_size
    n = points.shape[0]
    c = point_features.shape[-1]

    def one_box(box, ok):
        local = _local_coords(points, box)
        inside = points_in_box(points, box)
        if points_valid is not None:
            inside = inside & points_valid
        inside = inside & ok
        # cell index per point (CUDA: floor((local + dim/2) / (dim/g)))
        dims = box[3:6]
        cell = jnp.floor((local + dims / 2.0) / (dims / g)).astype(jnp.int32)
        cell = jnp.clip(cell, 0, g - 1)
        flat = (cell[:, 0] * g + cell[:, 1]) * g + cell[:, 2]
        flat = jnp.where(inside, flat, g ** 3)  # drop slot
        if pool_method == "avg":
            sums = jax.ops.segment_sum(
                jnp.where(inside[:, None], point_features, 0.0), flat,
                num_segments=g ** 3 + 1)[: g ** 3]
            cnt = jax.ops.segment_sum(inside.astype(jnp.float32), flat,
                                      num_segments=g ** 3 + 1)[: g ** 3]
            pooled = sums / jnp.maximum(cnt[:, None], 1.0)
        else:
            pooled = jax.ops.segment_max(
                jnp.where(inside[:, None], point_features, -jnp.inf), flat,
                num_segments=g ** 3 + 1)[: g ** 3]
            pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
        return pooled.reshape(g, g, g, c)

    ok = boxes_valid if boxes_valid is not None else jnp.ones(boxes.shape[0], bool)
    return jax.vmap(one_box)(boxes, ok)


@partial(jax.jit, static_argnames=("num_sampled",))
def roipoint_pool3d(points, point_features, boxes, num_sampled: int = 512,
                    points_valid=None, boxes_valid=None):
    """First-``num_sampled`` points inside each RoI, in point order
    (roipoint_pool3d_kernel.cu scan semantics).

    Returns (pooled (M, K, 3 + C), pooled_valid (M, K), empty (M,)).
    """
    feats = jnp.concatenate([points[:, :3], point_features], axis=-1)

    def one_box(box, ok):
        inside = points_in_box(points, box)
        if points_valid is not None:
            inside = inside & points_valid
        inside = inside & ok
        # stable argsort on ~inside keeps inside-points first in point order
        sel = jnp.argsort(~inside, stable=True)[:num_sampled]
        valid = inside[sel]
        pooled = jnp.where(valid[:, None], feats[sel], 0.0)
        return pooled, valid, ~jnp.any(inside)

    ok = boxes_valid if boxes_valid is not None else jnp.ones(boxes.shape[0], bool)
    return jax.vmap(one_box)(boxes, ok)
