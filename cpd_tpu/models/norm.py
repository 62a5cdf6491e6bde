"""Normalization layers aware of validity masks and device meshes.

The reference uses torch BatchNorm1d(eps=1e-3, momentum=0.01) on ragged voxel
tensors (spconv_backbone.py) and optional SyncBatchNorm across GPUs
(tools/train.py:117). Here padding slots must not pollute the statistics, so
we compute masked moments; cross-device sync is a ``psum`` over the mesh data
axis when ``axis_name`` is set (the pjit equivalent of SyncBN).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    """BatchNorm over the valid entries of (..., C) features.

    torch-style momentum: ``running = (1 - momentum) * running + momentum * batch``.
    """

    momentum: float = 0.01
    epsilon: float = 1e-3
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, valid, train: bool):
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if train:
            mask = valid[..., None].astype(jnp.float32)
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            s = jnp.sum(xf * mask, axis=axes)
            sq = jnp.sum(xf * xf * mask, axis=axes)
            cnt = jnp.sum(mask)
            if self.axis_name is not None:
                s = jax.lax.psum(s, self.axis_name)
                sq = jax.lax.psum(sq, self.axis_name)
                cnt = jax.lax.psum(cnt, self.axis_name)
            cnt = jnp.clip(cnt, min=1.0)
            mean = s / cnt
            var = jnp.clip(sq / cnt - mean * mean, min=0.0)
            if not self.is_initializing():
                ra_mean.value = (1.0 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1.0 - self.momentum) * ra_var.value + self.momentum * var
        else:
            mean = ra_mean.value
            var = ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return jnp.where(valid[..., None], y, 0.0).astype(x.dtype)


class BatchNorm2d(nn.Module):
    """Dense-map BatchNorm over (B, H, W, C), torch defaults (eps 1e-5, mom 0.1)."""

    momentum: float = 0.1
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if train:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            var = jnp.var(xf, axis=axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                # E[x^2] - E[x]^2 with pmean'd moments
                ex2 = jax.lax.pmean(jnp.mean(xf * xf, axis=axes), self.axis_name)
                var = jnp.clip(ex2 - mean * mean, min=0.0)
            if not self.is_initializing():
                ra_mean.value = (1.0 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1.0 - self.momentum) * ra_var.value + self.momentum * var
        else:
            mean = ra_mean.value
            var = ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y.astype(x.dtype)
