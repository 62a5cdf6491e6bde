"""Deformable convolution v1/v2 in pure JAX (optional op).

Parity with cpd/ops/dcn (~2.5k LoC CUDA: DeformConv / ModulatedDeformConv /
DeformRoIPooling, deform_conv.py:192,258). The reference never uses these on
the CPD path (SURVEY.md 2.1) -- shipped for API completeness. Implementation:
offset-shifted bilinear sampling of the input at every kernel tap (vectorized
gather, VPU) followed by one im2col GEMM (MXU); autodiff provides backward.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _bilinear_gather(img, ys, xs):
    """img: (H, W, C); ys/xs: (...,) float coords -> (..., C)."""
    h, w, _ = img.shape
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    dy = ys - y0
    dx = xs - x0

    def at(yi, xi):
        ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(ok[..., None], v, 0.0)

    return (
        at(y0, x0) * ((1 - dy) * (1 - dx))[..., None]
        + at(y0, x0 + 1) * ((1 - dy) * dx)[..., None]
        + at(y0 + 1, x0) * (dy * (1 - dx))[..., None]
        + at(y0 + 1, x0 + 1) * (dy * dx)[..., None]
    )


def deform_conv2d(x, offsets, weights, mask=None, stride: int = 1):
    """Deformable conv for ONE image.

    x: (H, W, Cin); offsets: (Ho, Wo, K*2) per-tap (dy, dx); weights:
    (K, Cin, Cout) with K = kh*kw (3x3); mask: optional (Ho, Wo, K)
    modulation (DCNv2). Returns (Ho, Wo, Cout).
    """
    h, w, cin = x.shape
    ho, wo, _ = offsets.shape
    k = weights.shape[0]
    kh = kw = int(round(k ** 0.5))
    base_y = jnp.arange(ho) * stride
    base_x = jnp.arange(wo) * stride
    yy, xx = jnp.meshgrid(base_y, base_x, indexing="ij")  # (Ho, Wo)
    taps = [(i - kh // 2, j - kw // 2) for i in range(kh) for j in range(kw)]
    off = offsets.reshape(ho, wo, k, 2)
    cols = []
    for t, (ti, tj) in enumerate(taps):
        ys = yy + ti + off[:, :, t, 0]
        xs = xx + tj + off[:, :, t, 1]
        v = _bilinear_gather(x, ys, xs)  # (Ho, Wo, Cin)
        if mask is not None:
            v = v * mask[:, :, t][..., None]
        cols.append(v)
    col = jnp.stack(cols, axis=2).reshape(ho, wo, k * cin)
    return jax.lax.dot_general(
        col.reshape(-1, k * cin), weights.reshape(k * cin, -1),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(ho, wo, -1)


class DeformConv2d(nn.Module):
    """DCNv1/v2 layer: learned offsets (+ modulation) then deform_conv2d."""

    features: int
    kernel: int = 3
    modulated: bool = True  # DCNv2 (ModulatedDeformConvPack parity)

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C) -> (B, H, W, features)."""
        k = self.kernel * self.kernel
        off_ch = k * (3 if self.modulated else 2)
        off = nn.Conv(off_ch, (self.kernel, self.kernel), padding="SAME",
                      kernel_init=nn.initializers.zeros, name="offset_conv")(x)
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, x.shape[-1], self.features))

        def one(img, o):
            offs = o[..., : 2 * k]
            mask = jax.nn.sigmoid(o[..., 2 * k :]) * 2.0 if self.modulated else None
            return deform_conv2d(img, offs, w, mask)

        return jax.vmap(one)(x, off)
