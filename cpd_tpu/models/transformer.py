"""Transformer encoder/decoder toolbox (parity: cpd/models/model_utils/ctrans.py).

The reference ships a 506-LoC DETR-style transformer toolbox (unused by the
shipped configs); this is the flax equivalent for feature-interaction heads:
multi-head attention blocks with pre-norm, an encoder over BEV/point tokens
and a decoder with learned queries.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn


class TransformerBlock(nn.Module):
    dim: int
    heads: int = 4
    mlp_ratio: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, context=None, mask=None, train: bool = False):
        h = nn.LayerNorm()(x)
        kv = h if context is None else nn.LayerNorm(name="ctx_norm")(context)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dropout_rate=self.dropout, deterministic=not train,
        )(h, kv, mask=mask)
        x = x + attn
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.dim * self.mlp_ratio)(h)
        h = nn.gelu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.dim)(h)
        return x + h


class TransformerEncoder(nn.Module):
    dim: int = 256
    depth: int = 3
    heads: int = 4

    @nn.compact
    def __call__(self, tokens, mask=None, train: bool = False):
        x = nn.Dense(self.dim)(tokens) if tokens.shape[-1] != self.dim else tokens
        for i in range(self.depth):
            x = TransformerBlock(self.dim, self.heads, name=f"enc{i}")(x, mask=mask, train=train)
        return nn.LayerNorm()(x)


class TransformerDecoder(nn.Module):
    dim: int = 256
    depth: int = 3
    heads: int = 4
    num_queries: int = 100

    @nn.compact
    def __call__(self, memory, mask=None, train: bool = False):
        b = memory.shape[0]
        q = self.param("queries", nn.initializers.normal(0.02), (self.num_queries, self.dim))
        x = jnp.broadcast_to(q[None], (b, self.num_queries, self.dim))
        for i in range(self.depth):
            x = TransformerBlock(self.dim, self.heads, name=f"self{i}")(x, train=train)
            x = TransformerBlock(self.dim, self.heads, name=f"cross{i}")(
                x, context=memory, mask=mask, train=train)
        return nn.LayerNorm()(x)
