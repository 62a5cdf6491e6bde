"""On-device dynamic voxelization with fixed capacities (TPU-native).

Replaces the reference's CPU voxelizer (spconv ``Point2VoxelCPU3d`` wrapped in
cpd/datasets/processor/data_processor.py:14-59) and MeanVFE
(cpd/models/backbones_3d/vfe/mean_vfe.py) in one fused step: because CPD's
VFE is a mean, we never materialize the (V, 5, C) point buffer at all --
"dynamic voxelization": sort points by voxel key, segment-mean the features,
emit (V_cap, C) features + (V_cap, 3) integer zyx coords + validity mask.
Static shapes throughout: P_cap points in, V_cap voxels out.

All heavy steps (sort, segment sum) are single XLA ops that TPU executes
efficiently; there is no Python loop and no host round-trip, so voxelization
runs inside the jitted train step (the reference does this on CPU workers).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp


class VoxelizerSpec(NamedTuple):
    point_cloud_range: tuple  # (xmin, ymin, zmin, xmax, ymax, zmax)
    voxel_size: tuple  # (vx, vy, vz)
    grid_size: tuple  # (nx, ny, nz) -- derived, static
    max_voxels: int
    # spconv-parity switch: when set (the reference uses 5,
    # data_processor.py:128 MAX_POINTS_PER_VOXEL), the mean runs over only the
    # FIRST n points of each voxel in point order -- bit-faithful to
    # Point2VoxelCPU3d + MeanVFE (mean_vfe.py:16) for checkpoint parity.
    # None (default) = TPU-native all-points mean (strictly more accurate).
    max_points_per_voxel: int = None

    @staticmethod
    def create(point_cloud_range: Sequence[float], voxel_size: Sequence[float],
               max_voxels: int, max_points_per_voxel: int = None):
        pcr = tuple(float(x) for x in point_cloud_range)
        vs = tuple(float(x) for x in voxel_size)
        grid = tuple(
            int(round((pcr[i + 3] - pcr[i]) / vs[i])) for i in range(3)
        )
        return VoxelizerSpec(
            pcr, vs, grid, int(max_voxels),
            None if max_points_per_voxel is None else int(max_points_per_voxel))


class VoxelizedFrame(NamedTuple):
    features: jnp.ndarray  # (V_cap, C) mean point features per voxel
    coords: jnp.ndarray  # (V_cap, 3) int32 zyx coords, -1 padded
    num_points: jnp.ndarray  # (V_cap,) int32 points per voxel
    valid: jnp.ndarray  # (V_cap,) bool
    point_voxel_id: jnp.ndarray  # (P_cap,) int32 row in the voxel table, -1 if dropped


def compute_voxel_keys(points, spec: VoxelizerSpec, valid=None):
    """(P, 3+) points -> (P,) int32 linearized voxel key; -1 for out-of-range/invalid.

    Key layout: ((z * ny) + y) * nx + x, matching the zyx coord convention.
    """
    pcr = jnp.asarray(spec.point_cloud_range, dtype=points.dtype)
    vs = jnp.asarray(spec.voxel_size, dtype=points.dtype)
    nx, ny, nz = spec.grid_size
    rel = (points[:, :3] - pcr[:3]) / vs
    ijk = jnp.floor(rel).astype(jnp.int32)  # xyz order
    in_range = (
        (ijk[:, 0] >= 0) & (ijk[:, 0] < nx)
        & (ijk[:, 1] >= 0) & (ijk[:, 1] < ny)
        & (ijk[:, 2] >= 0) & (ijk[:, 2] < nz)
    )
    if valid is not None:
        in_range = in_range & valid
    key = (ijk[:, 2] * ny + ijk[:, 1]) * nx + ijk[:, 0]
    return jnp.where(in_range, key, -1)


def key_to_coords(key, spec: VoxelizerSpec):
    """(V,) int32 keys -> (V, 3) int32 zyx coords (-1 rows preserved)."""
    nx, ny, _ = spec.grid_size
    x = key % nx
    y = (key // nx) % ny
    z = key // (nx * ny)
    coords = jnp.stack([z, y, x], axis=-1)
    return jnp.where(key[:, None] >= 0, coords, -1)


@partial(jax.jit, static_argnames=("spec", "with_point_voxel_id"))
def voxelize(points, spec: VoxelizerSpec, valid=None,
             with_point_voxel_id: bool = False) -> VoxelizedFrame:
    """Dynamic voxelization + mean VFE for one frame.

    points: (P_cap, C) with xyz in the first 3 channels; ``valid`` masks
    padded points. Voxel order in the output table is ascending key order
    (deterministic), padded rows at the end.

    ``with_point_voxel_id``: the per-point voxel-row map costs a (P,)
    scatter that only PillarVFE consumes -- skipped by default (the field is
    then all -1).
    """
    p_cap, c = points.shape
    v_cap = spec.max_voxels
    key = compute_voxel_keys(points, spec, valid)  # (P,)
    big = jnp.iinfo(jnp.int32).max
    sort_key = jnp.where(key >= 0, key, big)
    # ONE multi-operand lax.sort carries the point channels through the sort
    # instead of argsort + row gather (measured 3.2 vs 9.2 ms at 200k points,
    # scripts/exp_r3_vox.py: jnp.argsort lowers to the ~2.5x slower STABLE
    # sort). The iota second key makes the order total -> deterministic and
    # stable-equivalent (max_points_per_voxel truncation parity).
    iota = jnp.arange(p_cap, dtype=jnp.int32)
    sorted_ops = jax.lax.sort(
        (sort_key, iota) + tuple(points[:, i] for i in range(c)), num_keys=2)
    skey = sorted_ops[0]
    order = sorted_ops[1]
    # unique flags over the sorted keys
    first = jnp.concatenate([jnp.array([True]), skey[1:] != skey[:-1]])
    first = first & (skey < big)
    # voxel slot for each sorted point: cumsum of first-flags - 1
    slot = jnp.cumsum(first.astype(jnp.int32)) - 1  # (P,)
    point_ok = skey < big
    if spec.max_points_per_voxel is not None:
        # spconv truncation parity: keep only the first n points of each
        # voxel in point order (argsort is stable, so sorted order preserves
        # the original order within a voxel)
        idx = jnp.arange(p_cap, dtype=jnp.int32)
        seg_start = jax.lax.associative_scan(jnp.maximum, jnp.where(first, idx, 0))
        rank = idx - seg_start
        point_ok = point_ok & (rank < spec.max_points_per_voxel)
    slot_clipped = jnp.where(point_ok & (slot < v_cap), slot, v_cap)  # overflow bucket
    # segment-mean features; the count rides as an extra ones-column so the
    # sums and counts cost ONE (P,)-row scatter-add instead of two
    sorted_pts = jnp.stack(sorted_ops[2:], axis=-1)
    aug = jnp.concatenate([sorted_pts, jnp.ones((p_cap, 1), points.dtype)], axis=1)
    # indices_are_sorted: with no per-voxel truncation, ``slot_clipped`` is
    # monotone by construction (slot is a cumsum over sorted keys; the clip
    # to the overflow bucket only ever moves it UP, and invalid points sort
    # to the tail) -- the hint saves 0.5 ms of the 2.2 ms scatter-add on v5e
    # (scripts/exp_r5_vox2.py). With max_points_per_voxel set, truncated
    # points get the overflow bucket MID-sequence, the order breaks, and the
    # hint would be unsound.
    sums = jax.ops.segment_sum(
        jnp.where(point_ok[:, None], aug, 0.0), slot_clipped,
        num_segments=v_cap + 1,
        indices_are_sorted=spec.max_points_per_voxel is None,
    )[:v_cap]
    counts = sums[:, -1].astype(jnp.int32)
    feats = sums[:, :-1] / jnp.maximum(counts[:, None], 1).astype(points.dtype)
    # voxel keys per slot: plain scatter-SET (each kept slot is written by
    # exactly one first-row; measured ~1.4x segment_max, exp_r2m)
    key_slot = jnp.where(first & (slot < v_cap), slot, v_cap)
    voxel_keys = jnp.full((v_cap + 1,), -1, jnp.int32).at[key_slot].set(
        skey, mode="drop")[:v_cap]
    valid_voxels = counts > 0
    voxel_keys = jnp.where(valid_voxels, voxel_keys, -1)
    coords = key_to_coords(voxel_keys, spec)
    # map each original point to its voxel row
    if with_point_voxel_id:
        pv = jnp.where(point_ok & (slot < v_cap), slot, -1)
        point_voxel_id = jnp.zeros((p_cap,), jnp.int32).at[order].set(pv)
    else:
        point_voxel_id = jnp.full((p_cap,), -1, jnp.int32)
    return VoxelizedFrame(
        features=jnp.where(valid_voxels[:, None], feats, 0.0),
        coords=coords,
        num_points=counts,
        valid=valid_voxels,
        point_voxel_id=point_voxel_id,
    )


@partial(jax.jit, static_argnames=("spec", "with_point_voxel_id"))
def voxelize_batch(points, spec: VoxelizerSpec, valid=None,
                   with_point_voxel_id: bool = False) -> VoxelizedFrame:
    """Batched voxelization: points (B, P_cap, C) -> VoxelizedFrame with leading B axis."""
    if valid is None:
        valid = jnp.ones(points.shape[:2], dtype=bool)
    if points.shape[0] == 1:
        # squeezed: a leading batch dim of ONE alone slows the gather/sort
        # lowerings (scripts/exp_r4_squeeze.py)
        out = voxelize(points[0], spec, valid[0], with_point_voxel_id)
        return jax.tree_util.tree_map(lambda x: x[None], out)
    return jax.vmap(lambda p, v: voxelize(p, spec, v, with_point_voxel_id))(
        points, valid)
