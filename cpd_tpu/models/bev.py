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


def height_compression(features, keys, grid: GridSpec):
    """(B, V, C) sparse encoded tensor -> (B, ny, nx, nz*C) dense BEV map."""
    b, v, c = features.shape
    dense = jax.vmap(lambda f, k: sparse.to_dense(f, k, grid, c))(features, keys)
    # (B, nz, ny, nx, C) -> (B, ny, nx, nz*C)
    dense = jnp.transpose(dense, (0, 2, 3, 1, 4))
    return dense.reshape(b, grid.ny, grid.nx, grid.nz * c)


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    bn_axis_name: Optional[str] = None
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME" if self.stride == 1 else [(1, 1), (1, 1)],
            use_bias=self.use_bias,
        )(x)
        x = BatchNorm2d(axis_name=self.bn_axis_name)(x, train)
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

    @nn.compact
    def __call__(self, x, train: bool):
        ups = []
        for i, (n, s, f) in enumerate(zip(self.layer_nums, self.layer_strides, self.num_filters)):
            x = ConvBNReLU(f, 3, s, self.bn_axis_name, name=f"block{i}_in")(x, train)
            for j in range(n):
                x = ConvBNReLU(f, 3, 1, self.bn_axis_name, name=f"block{i}_conv{j}")(x, train)
            us = self.upsample_strides[i]
            uf = self.num_upsample_filters[i]
            if us > 1:
                u = nn.ConvTranspose(uf, (us, us), strides=(us, us), use_bias=False,
                                     name=f"deblock{i}")(x)
            else:
                u = nn.Conv(uf, (1, 1), use_bias=False, name=f"deblock{i}")(x)
            u = BatchNorm2d(axis_name=self.bn_axis_name, name=f"deblock{i}_bn")(u, train)
            ups.append(nn.relu(u))
        if len(ups) > 1:
            return jnp.concatenate(ups, axis=-1)
        return ups[0]
