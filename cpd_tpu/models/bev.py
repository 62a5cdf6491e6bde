"""BEV stack: sparse->dense height compression + 2D conv pyramid.

Parity with the reference HeightCompression
(cpd/models/backbones_2d/map_to_bev/height_compression.py:107: sparse.dense()
then (N, C, D, H, W) -> (N, C*D, H, W)) and BaseBEVBackbone
(cpd/models/backbones_2d/base_bev_backbone.py: conv pyramid with deconv
upsample concat). We use NHWC layout -- the natural TPU conv layout -- so the
compressed map is (B, H, W, D*C).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import sparse
from ..ops.sparse import GridSpec
from .norm import BatchNorm2d
from .part_wraper import bilinear_sample_bev  # noqa: F401  (bev_align)


def height_compression(features, keys, grid: GridSpec):
    """(B, V, C) sparse encoded tensor -> (B, ny, nx, nz*C) dense BEV map."""
    b, v, c = features.shape
    dense = sparse.vmap_squeeze1(
        lambda f, k: sparse.to_dense(f, k, grid, c), features, keys)
    # (B, nz, ny, nx, C) -> (B, ny, nx, nz*C)
    dense = jnp.transpose(dense, (0, 2, 3, 1, 4))
    return dense.reshape(b, grid.ny, grid.nx, grid.nz * c)


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    bn_axis_name: Optional[str] = None
    use_bias: bool = False
    # bf16 compute matches the 3D backbone's activation dtype and runs the
    # 188x188 dense convs ~2x faster on the MXU; BN statistics stay f32
    compute_dtype: Optional[jnp.dtype] = jnp.bfloat16
    # the reference BEV BNs are BatchNorm2d(eps=1e-3, momentum=0.01)
    # (base_bev_backbone.py:38,44), NOT torch defaults
    bn_momentum: float = 0.01
    bn_eps: float = 1e-3

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME" if self.stride == 1 else [(1, 1), (1, 1)],
            use_bias=self.use_bias,
            dtype=self.compute_dtype,
        )(x)
        x = BatchNorm2d(momentum=self.bn_momentum, epsilon=self.bn_eps,
                        axis_name=self.bn_axis_name)(x, train)
        return nn.relu(x)


class BaseBEVBackbone(nn.Module):
    """Conv pyramid + deconv upsample concat (base_bev_backbone.py:6-150).

    CPD config: LAYER_NUMS [5, 5], strides [1, 2], filters [128, 256],
    upsample strides [1, 2] to [256, 256] -> concat 512 channels.
    """

    layer_nums: Tuple[int, ...] = (5, 5)
    layer_strides: Tuple[int, ...] = (1, 2)
    num_filters: Tuple[int, ...] = (128, 256)
    upsample_strides: Tuple[int, ...] = (1, 2)
    num_upsample_filters: Tuple[int, ...] = (256, 256)
    bn_axis_name: Optional[str] = None
    compute_dtype: Optional[jnp.dtype] = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        ups = []
        for i, (n, s, f) in enumerate(zip(self.layer_nums, self.layer_strides, self.num_filters)):
            x = ConvBNReLU(f, 3, s, self.bn_axis_name,
                           compute_dtype=self.compute_dtype,
                           name=f"block{i}_in")(x, train)
            for j in range(n):
                x = ConvBNReLU(f, 3, 1, self.bn_axis_name,
                               compute_dtype=self.compute_dtype,
                               name=f"block{i}_conv{j}")(x, train)
            us = self.upsample_strides[i]
            uf = self.num_upsample_filters[i]
            if us > 1:
                u = nn.ConvTranspose(uf, (us, us), strides=(us, us), use_bias=False,
                                     dtype=self.compute_dtype, name=f"deblock{i}")(x)
            else:
                u = nn.Conv(uf, (1, 1), use_bias=False, dtype=self.compute_dtype,
                            name=f"deblock{i}")(x)
            u = BatchNorm2d(momentum=0.01, epsilon=1e-3,
                            axis_name=self.bn_axis_name,
                            name=f"deblock{i}_bn")(u, train)
            ups.append(nn.relu(u))
        if len(ups) > 1:
            return jnp.concatenate(ups, axis=-1)
        return ups[0]


def bev_pool(features, keys, grid: GridSpec, pool: str = "max"):
    """BEVPool variant of the BEV projection (height_compression.py:179):
    instead of stacking depth slices into channels, reduce over z per BEV cell
    (max or mean) -- useful when the encoder keeps more depth."""
    b, v, c = features.shape
    bev_cells = grid.nx * grid.ny
    valid = keys != sparse.INVALID_KEY
    bev_key = jnp.where(valid, keys % bev_cells, bev_cells)

    def one(f, k, m):
        if pool == "max":
            canvas = jax.ops.segment_max(
                jnp.where(m[:, None], f, -jnp.inf), k, num_segments=bev_cells + 1
            )[:bev_cells]
            canvas = jnp.where(jnp.isfinite(canvas), canvas, 0.0)
        else:
            s = jax.ops.segment_sum(jnp.where(m[:, None], f, 0.0), k,
                                    num_segments=bev_cells + 1)[:bev_cells]
            n = jax.ops.segment_sum(m.astype(f.dtype), k, num_segments=bev_cells + 1)[:bev_cells]
            canvas = s / jnp.clip(n[:, None], min=1.0)
        return canvas.reshape(grid.ny, grid.nx, c)

    return sparse.vmap_squeeze1(one, features, bev_key, valid)


def bev_align(bev_maps, transform_params, point_cloud_range, stride_m,
              fusion: str = "mean"):
    """Multi-stage BEV de-augmentation + fusion (height_compression.bev_align,
    :67-167): each stage's map was produced from differently world-transformed
    inputs; sample every map at the INVERSE-transformed pseudo-grid so they
    align in the common frame, then fuse (first/max/mean).

    bev_maps: list of (B, H, W, C); transform_params: list of per-stage
    WorldTransformParam-like objects with .rot/.scale/.flip_x/.flip_y.
    """
    import numpy as np

    from .part_wraper import bilinear_sample_bev

    b, h, w, c = bev_maps[0].shape
    ys = jnp.asarray(point_cloud_range[1]) + (jnp.arange(h) + 0.5) * stride_m
    xs = jnp.asarray(point_cloud_range[0]) + (jnp.arange(w) + 0.5) * stride_m
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    grid_xy = jnp.stack([gx, gy], axis=-1)  # (H, W, 2) common-frame centers
    aligned = []
    for bev, p in zip(bev_maps, transform_params):
        xy = grid_xy
        if p is not None:
            # forward-transform the pseudo-grid into the stage's frame
            xy = xy * p.scale
            cth, sth = np.cos(p.rot), np.sin(p.rot)
            xy = jnp.stack([xy[..., 0] * cth - xy[..., 1] * sth,
                            xy[..., 0] * sth + xy[..., 1] * cth], axis=-1)
            if p.flip_x:
                xy = xy.at[..., 1].multiply(-1)
            if p.flip_y:
                xy = xy.at[..., 0].multiply(-1)
        sample = jax.vmap(lambda m: bilinear_sample_bev(m, xy, point_cloud_range, stride_m))(bev)
        aligned.append(sample)
    stack = jnp.stack(aligned)
    if fusion == "first":
        return aligned[0]
    if fusion == "max":
        return jnp.max(stack, axis=0)
    return jnp.mean(stack, axis=0)


def bev_align_params(bev_maps, transform_param, point_cloud_range, stride_m,
                     names=("world_rotation", "world_flip", "world_scaling"),
                     fusion: str = "mean"):
    """Traced multi-stage BEV de-augmentation for the X_TRAIN clone protocol
    (height_compression.py:81-167): stage i's map is sampled at the
    pseudo-grid pushed FORWARD through stage i's params then BACKWARD through
    stage 0's (the reference's exact composition), and the stack is fused.

    bev_maps: list of S (B, H, W, C) maps (stage 0 first, used as-is);
    transform_param: (B, S, n_cfg) numeric rows in config-list column order.
    """
    s = len(bev_maps)
    b, h, w, c = bev_maps[0].shape
    ys = jnp.asarray(point_cloud_range[1]) + (jnp.arange(h) + 0.5) * stride_m
    xs = jnp.asarray(point_cloud_range[0]) + (jnp.arange(w) + 0.5) * stride_m
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    grid_xy = jnp.stack([gx, gy], axis=-1)  # (H, W, 2)

    def fwd(xy, row):
        for i, name in enumerate(names):
            v = row[i]
            if name == "world_rotation":
                cth, sth = jnp.cos(v), jnp.sin(v)
                xy = jnp.stack([xy[..., 0] * cth - xy[..., 1] * sth,
                                xy[..., 0] * sth + xy[..., 1] * cth], axis=-1)
            elif name == "world_flip":
                sign = 1.0 - 2.0 * (v > 0.5)
                xy = jnp.stack([xy[..., 0], xy[..., 1] * sign], axis=-1)
            elif name == "world_scaling":
                xy = xy * v
        return xy

    def bwd(xy, row):
        for i, name in reversed(list(enumerate(names))):
            v = row[i]
            if name == "world_rotation":
                cth, sth = jnp.cos(-v), jnp.sin(-v)
                xy = jnp.stack([xy[..., 0] * cth - xy[..., 1] * sth,
                                xy[..., 0] * sth + xy[..., 1] * cth], axis=-1)
            elif name == "world_flip":
                sign = 1.0 - 2.0 * (v > 0.5)
                xy = jnp.stack([xy[..., 0], xy[..., 1] * sign], axis=-1)
            elif name == "world_scaling":
                xy = xy / v
        return xy

    from .part_wraper import bilinear_sample_bev

    aligned = [bev_maps[0]]
    for i in range(1, s):
        def one(bev_map, rows):
            xy = bwd(fwd(grid_xy, rows[i]), rows[0])
            return bilinear_sample_bev(bev_map, xy, point_cloud_range, stride_m)
        aligned.append(jax.vmap(one)(bev_maps[i], transform_param))
    if fusion == "first":
        return aligned[0]
    stack = jnp.stack(aligned)
    if fusion == "max":
        return jnp.max(stack, axis=0)
    return jnp.mean(stack, axis=0)
