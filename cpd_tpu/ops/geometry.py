"""Core box/point geometry in pure JAX (static shapes, fully vmappable).

TPU-native equivalents of the reference's geometry utilities:
  - limit_period / rotate_points_along_z (cpd/utils/common_utils.py:17,35)
  - boxes_to_corners_3d / enlarge boxes (cpd/utils/box_utils.py:27)
  - points-in-rotated-box tests (cpd/ops/roiaware_pool3d: points_in_boxes_cpu/gpu,
    ~536 LoC of CUDA) -> a single vmapped affine test here; XLA fuses it.
  - get_voxel_centers (cpd/utils/common_utils.py:66)

Boxes follow the reference convention: (x, y, z, dx, dy, dz, heading) with
(x, y, z) the box center, heading the rotation around +z.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def limit_period(val, offset: float = 0.5, period: float = jnp.pi):
    """Wrap ``val`` into [-offset*period, (1-offset)*period)."""
    return val - jnp.floor(val / period + offset) * period


def rotation_matrix_z(angle):
    """(...,) angles -> (..., 3, 3) rotation matrices around +z."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    zeros = jnp.zeros_like(c)
    ones = jnp.ones_like(c)
    rot = jnp.stack(
        [c, s, zeros, -s, c, zeros, zeros, zeros, ones], axis=-1
    ).reshape(angle.shape + (3, 3))
    return rot


def rotate_points_along_z(points, angle):
    """Rotate points around the z axis.

    points: (..., N, 3 + C); angle: (...,) in radians (counter-clockwise).
    Returns rotated points with extra channels untouched.
    """
    rot = rotation_matrix_z(angle)  # (..., 3, 3)
    xyz = points[..., :3]
    rotated = jnp.einsum("...nj,...jk->...nk", xyz, rot)
    return jnp.concatenate([rotated, points[..., 3:]], axis=-1)


def boxes_to_corners_3d(boxes):
    """(N, 7[+]) boxes -> (N, 8, 3) corners.

        7 -------- 4
       /|         /|
      6 -------- 5 .
      | |        | |
      . 3 -------- 0
      |/         |/
      2 -------- 1
    """
    template = jnp.array(
        [
            [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
            [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1],
        ],
        dtype=boxes.dtype,
    ) / 2.0  # (8, 3)
    corners = boxes[:, None, 3:6] * template[None]  # (N, 8, 3)
    corners = rotate_points_along_z(corners, boxes[:, 6])
    return corners + boxes[:, None, 0:3]


def boxes_to_corners_bev(boxes):
    """(N, 7[+]) boxes -> (N, 4, 2) BEV corners, counter-clockwise order."""
    half_dx = boxes[:, 3] / 2.0
    half_dy = boxes[:, 4] / 2.0
    # ccw order: (+,+), (-,+), (-,-), (+,-) in the box frame
    local = jnp.stack(
        [
            jnp.stack([half_dx, half_dy], axis=-1),
            jnp.stack([-half_dx, half_dy], axis=-1),
            jnp.stack([-half_dx, -half_dy], axis=-1),
            jnp.stack([half_dx, -half_dy], axis=-1),
        ],
        axis=1,
    )  # (N, 4, 2)
    c, s = jnp.cos(boxes[:, 6]), jnp.sin(boxes[:, 6])
    rot = jnp.stack([c, s, -s, c], axis=-1).reshape(-1, 2, 2)
    corners = jnp.einsum("nij,njk->nik", local, rot)
    return corners + boxes[:, None, 0:2]


def points_in_box(points, box):
    """(N, 3) points, (7,) box -> (N,) bool mask (strictly inside or on boundary)."""
    shifted = points[:, :3] - box[None, 0:3]
    c, s = jnp.cos(-box[6]), jnp.sin(-box[6])
    local_x = shifted[:, 0] * c - shifted[:, 1] * s
    local_y = shifted[:, 0] * s + shifted[:, 1] * c
    local_z = shifted[:, 2]
    return (
        (jnp.abs(local_x) <= box[3] / 2.0)
        & (jnp.abs(local_y) <= box[4] / 2.0)
        & (jnp.abs(local_z) <= box[5] / 2.0)
    )


def points_in_boxes_mask(points, boxes):
    """(N, 3+) points, (M, 7+) boxes -> (M, N) bool membership masks.

    Replaces the reference CUDA op ``points_in_boxes_cpu/gpu``
    (cpd/ops/roiaware_pool3d/src/roiaware_pool3d_kernel.cu) with a vmapped
    affine test; on TPU this lowers to fused VPU elementwise work.
    """
    return jax.vmap(points_in_box, in_axes=(None, 0))(points[:, :3], boxes)


def points_in_boxes_index(points, boxes, valid_boxes=None):
    """(N, 3+) points, (M, 7+) boxes -> (N,) int32 index of first containing box, -1 if none."""
    mask = points_in_boxes_mask(points, boxes)  # (M, N)
    if valid_boxes is not None:
        mask = mask & valid_boxes[:, None]
    any_hit = jnp.any(mask, axis=0)
    idx = jnp.argmax(mask, axis=0).astype(jnp.int32)
    return jnp.where(any_hit, idx, -1)


def enlarge_box3d(boxes, extra_width=(0.0, 0.0, 0.0)):
    """Grow boxes by ``extra_width`` (dx, dy, dz) on each full dimension."""
    extra = jnp.asarray(extra_width, dtype=boxes.dtype)
    out = boxes.at[..., 3:6].add(extra)
    return out


def get_voxel_centers(voxel_coords, downsample_times, voxel_size, point_cloud_range):
    """(N, 3) integer zyx voxel coords -> (N, 3) xyz metric centers."""
    coords_xyz = voxel_coords[:, [2, 1, 0]].astype(jnp.float32)
    voxel_size = jnp.asarray(voxel_size, dtype=jnp.float32) * downsample_times
    pc_min = jnp.asarray(point_cloud_range[0:3], dtype=jnp.float32)
    return (coords_xyz + 0.5) * voxel_size + pc_min


def mask_points_outside_range(points, point_cloud_range):
    """(N, 3+) -> (N,) bool mask of points inside the xyzxyz range (BEV check on x/y/z)."""
    r = jnp.asarray(point_cloud_range)
    return (
        (points[:, 0] >= r[0]) & (points[:, 0] <= r[3])
        & (points[:, 1] >= r[1]) & (points[:, 1] <= r[4])
        & (points[:, 2] >= r[2]) & (points[:, 2] <= r[5])
    )


def mask_boxes_outside_range(boxes, point_cloud_range, min_num_corners: int = 1):
    """(N, 7+) -> (N,) keep mask: at least ``min_num_corners`` BEV corners in range."""
    corners = boxes_to_corners_bev(boxes)  # (N, 4, 2)
    r = jnp.asarray(point_cloud_range)
    inside = (
        (corners[..., 0] >= r[0]) & (corners[..., 0] <= r[3])
        & (corners[..., 1] >= r[1]) & (corners[..., 1] <= r[4])
    )
    return jnp.sum(inside.astype(jnp.int32), axis=1) >= min_num_corners
