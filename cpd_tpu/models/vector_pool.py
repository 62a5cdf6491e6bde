"""VectorPool aggregation (PV-RCNN++ local vector representation).

TPU-native re-design of the reference's pointnet2_stack VectorPool stack
(cpd/ops/pointnet2/pointnet2_stack/pointnet2_modules.py:160-478 and the
vector_pool CUDA ops in src/vector_pool_gpu.cu): each query point owns a
dense local kxkxk grid spanning [-R, R]^3; every grid cell aggregates
support features (3-NN inverse-distance interpolation, average pooling, or
first-found choice), and a per-cell SEPARATE linear layer (the reference's
grouped 1x1 conv) mixes channels before shared post-MLPs.

Static-shape formulation: all-pairs masked distances + top-k / one-hot
contractions instead of the reference's two-step CUDA neighbor hash -- the
module is off the CPD path (used by PV-RCNN++-style PFE configs) and sized
for keypoint scales (M ~ 2-4k, N ~ 16-65k); chunk M upstream if needed.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .norm import MaskedBatchNorm


def local_grid_offsets(num_voxels: Tuple[int, int, int], radius: float) -> np.ndarray:
    """Static (G, 3) cell-center offsets of the kxkxk local grid in [-R, R]^3
    (pointnet2_modules.py:337-360 get_dense_voxels_by_center; x fastest? the
    reference meshgrids x,y,z then flattens x-major -- replicated here)."""
    r = radius
    nx, ny, nz = num_voxels
    xs = np.linspace(-r + r / nx, r - r / nx, nx)
    ys = np.linspace(-r + r / ny, r - r / ny, ny)
    zs = np.linspace(-r + r / nz, r - r / nz, nz)
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    return np.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=1).astype(np.float32)


def three_nn_vector_pool(centers, centers_valid, support_xyz, support_valid,
                         support_feats, max_dist: float,
                         neighbor_type: int = 0):
    """3-NN inverse-distance interpolation at each local-grid center with a
    distance cutoff (three_nn_for_vector_pool_by_two_step semantics).

    centers: (M, G, 3); support: (N, 3)/(N,)/(N, C).
    Returns (feats (M, G, C), local_xyz (M, G, 9), empty (M, G) bool).
    neighbor_type 1 = ball (L2 cutoff), else cube (L-inf cutoff).
    """
    m, g, _ = centers.shape
    flat = centers.reshape(m * g, 3)
    diff = flat[:, None, :] - support_xyz[None, :, :]  # (MG, N, 3)
    d = jnp.linalg.norm(diff, axis=-1)
    if neighbor_type == 1:
        in_range = d <= max_dist
    else:
        in_range = jnp.max(jnp.abs(diff), axis=-1) <= max_dist
    ok = in_range & support_valid[None, :]
    dm = jnp.where(ok, d, jnp.inf)
    nd, ni = jax.lax.top_k(-dm, 3)  # (MG, 3)
    found = jnp.isfinite(nd)
    w = jnp.where(found, 1.0 / (jnp.clip(-nd, min=0.0) + 1e-8), 0.0)
    w = w / jnp.clip(jnp.sum(w, axis=1, keepdims=True), min=1e-8)
    feats = jnp.einsum("qk,qkc->qc", w, support_feats[ni])
    local = flat[:, None, :] - support_xyz[ni]  # grid_center - neighbor_xyz
    local = jnp.where(found[..., None], local, 0.0).reshape(m * g, 9)
    empty = ~jnp.any(found, axis=1) | ~jnp.repeat(centers_valid, g)
    feats = jnp.where(empty[:, None], 0.0, feats)
    local = jnp.where(empty[:, None], 0.0, local)
    return (feats.reshape(m, g, -1), local.reshape(m, g, 9),
            empty.reshape(m, g))


def voxel_pool(centers_xyz, centers_valid, support_xyz, support_valid,
               support_feats, num_voxels: Tuple[int, int, int], radius: float,
               mode: str = "avg"):
    """Per-local-voxel pooling (vector_pool_with_voxel_query semantics).

    Each support point within the [-R, R]^3 cube of a query lands in one of
    the G local cells; ``avg`` averages features + local xyz per cell,
    ``choice`` takes the first point (scan order) per cell.
    Returns (feats (M, G, C), local_xyz (M, G, 3), cnt (M, G)).
    """
    g = int(np.prod(num_voxels))
    nx, ny, nz = num_voxels
    m = centers_xyz.shape[0]
    rel = centers_xyz[:, None, :] - support_xyz[None, :, :]  # (M, N, 3) center - p
    loc = -rel  # p - center
    in_cube = jnp.max(jnp.abs(loc), axis=-1) < radius
    ok = in_cube & support_valid[None, :] & centers_valid[:, None]
    cell = jnp.floor((loc + radius) / (2 * radius) * jnp.asarray(
        [nx, ny, nz], jnp.float32))
    cell = jnp.clip(cell, 0, jnp.asarray([nx - 1, ny - 1, nz - 1], jnp.float32))
    cid = (cell[..., 0] * ny + cell[..., 1]) * nz + cell[..., 2]  # x-major like the grid
    onehot = (cid[..., None] == jnp.arange(g)[None, None, :]) & ok[..., None]
    oh = onehot.astype(support_feats.dtype)  # (M, N, G)
    cnt = jnp.sum(oh, axis=1)  # (M, G)
    if mode == "avg":
        fsum = jnp.einsum("mng,nc->mgc", oh, support_feats)
        xsum = jnp.einsum("mng,mnc->mgc", oh, loc)
        denom = jnp.clip(cnt, min=1.0)[..., None]
        return fsum / denom, xsum / denom, cnt
    # first-found choice per cell (the reference's random_choice uses the
    # first-write winner of its scatter -- scan order here, deterministic)
    rank = jnp.cumsum(onehot, axis=1) * onehot  # 1 at first point of each cell
    first = (rank == 1).astype(support_feats.dtype)
    feats = jnp.einsum("mng,nc->mgc", first, support_feats)
    local = jnp.einsum("mng,mnc->mgc", first, loc)
    return feats, local, cnt


class VectorPoolAggregation(nn.Module):
    """pointnet2_modules.py:247 VectorPoolAggregationModule, batched."""

    input_channels: int
    num_local_voxel: Tuple[int, int, int] = (3, 3, 3)
    local_aggregation_type: str = "local_interpolation"
    num_reduced_channels: int = 30
    num_channels_of_local_aggregation: int = 32
    post_mlps: Sequence[int] = (128,)
    max_neighbor_distance: float = 1.6
    neighbor_nsample: int = -1
    neighbor_type: int = 0
    neighbor_distance_multiplier: float = 2.0

    @nn.compact
    def __call__(self, xyz, xyz_valid, features, new_xyz, new_valid, train: bool):
        """xyz (B, N, 3), features (B, N, C) -> (B, M, post_mlps[-1])."""
        assert self.local_aggregation_type in (
            "local_interpolation", "voxel_avg_pool", "voxel_random_choice")
        g = int(np.prod(self.num_local_voxel))
        red = self.num_reduced_channels
        c = features.shape[-1]
        assert c % red == 0, (c, red)
        feats = features.reshape(*features.shape[:-1], -1, red).sum(axis=-2)

        offsets = jnp.asarray(local_grid_offsets(
            self.num_local_voxel, self.max_neighbor_distance))

        if self.local_aggregation_type == "local_interpolation":
            def per_sample(cx, cv, sx, sv, sf):
                centers = cx[:, None, :] + offsets[None, :, :]
                f, lx, _ = three_nn_vector_pool(
                    centers, cv, sx, sv, sf,
                    self.max_neighbor_distance * self.neighbor_distance_multiplier,
                    self.neighbor_type)
                return jnp.concatenate([f, lx], axis=-1)  # (M, G, red+9)
            vec = jax.vmap(per_sample)(new_xyz, new_valid, xyz, xyz_valid, feats)
        else:
            mode = "avg" if self.local_aggregation_type == "voxel_avg_pool" else "choice"
            def per_sample(cx, cv, sx, sv, sf):
                f, lx, _ = voxel_pool(cx, cv, sx, sv, sf,
                                      self.num_local_voxel,
                                      self.max_neighbor_distance, mode)
                return jnp.concatenate([lx, f], axis=-1)  # (M, G, 3+red)
            vec = jax.vmap(per_sample)(new_xyz, new_valid, xyz, xyz_valid, feats)

        # separate per-cell linear (grouped 1x1 conv, groups=G) + BN + ReLU
        cin_g = vec.shape[-1]
        w = self.param("sep_kernel", nn.initializers.kaiming_normal(),
                       (g, cin_g, self.num_channels_of_local_aggregation))
        out = jnp.einsum("bmgc,gcd->bmgd", vec, w)
        b, m = out.shape[0], out.shape[1]
        out = out.reshape(b, m, g * self.num_channels_of_local_aggregation)
        out = MaskedBatchNorm(name="sep_bn")(out, new_valid, train)
        out = nn.relu(out)

        for i, ch in enumerate(self.post_mlps):
            out = nn.Dense(ch, use_bias=False, name=f"post_{i}")(out)
            out = MaskedBatchNorm(name=f"post_bn_{i}")(out, new_valid, train)
            out = nn.relu(out)
        return jnp.where(new_valid[..., None], out, 0.0)


class VectorPoolAggregationMSG(nn.Module):
    """pointnet2_modules.py:423: multi-group VectorPool + xyz concat + MLPs.

    ``groups``: sequence of dicts with keys num_local_voxel, post_mlps,
    max_neighbor_distance, neighbor_nsample (the reference's GROUP_CFG_k).
    """

    input_channels: int
    groups: Sequence[dict] = ()
    local_aggregation_type: str = "local_interpolation"
    num_reduced_channels: Optional[int] = None
    num_channels_of_local_aggregation: int = 32
    msg_post_mlps: Sequence[int] = (128,)

    @nn.compact
    def __call__(self, xyz, xyz_valid, features, new_xyz, new_valid, train: bool):
        red = (self.input_channels if self.num_reduced_channels is None
               else self.num_reduced_channels)
        outs = []
        for k, cfg in enumerate(self.groups):
            outs.append(VectorPoolAggregation(
                input_channels=self.input_channels,
                num_local_voxel=tuple(cfg["num_local_voxel"]),
                post_mlps=tuple(cfg["post_mlps"]),
                max_neighbor_distance=cfg["max_neighbor_distance"],
                neighbor_nsample=cfg.get("neighbor_nsample", -1),
                local_aggregation_type=self.local_aggregation_type,
                num_reduced_channels=red,
                num_channels_of_local_aggregation=self.num_channels_of_local_aggregation,
                name=f"layer_{k}")(xyz, xyz_valid, features, new_xyz, new_valid, train))
        out = jnp.concatenate([new_xyz] + outs, axis=-1)
        for i, ch in enumerate(self.msg_post_mlps):
            out = nn.Dense(ch, use_bias=False, name=f"msg_post_{i}")(out)
            out = MaskedBatchNorm(name=f"msg_post_bn_{i}")(out, new_valid, train)
            out = nn.relu(out)
        return jnp.where(new_valid[..., None], out, 0.0)
