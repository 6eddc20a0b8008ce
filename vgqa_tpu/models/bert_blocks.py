"""BERT-style cross-attention blocks used by the classifier heads.

Functional parity with /root/reference/vgqa/core/language/bert_module.py:
``BertLayer_Cross`` (:177-193) = cross-attention + post-LN residual +
GELU FFN with LN(eps=1e-12); ``BertLMPredictionHead`` (:212-225) =
dense+gelu+LN transform followed by a bias-carrying vocab projection.

The reference's blocks also instantiate a ``memory_intermediate`` module
whose output is never used (bert_module.py:151,185) — dead parameters that
are intentionally not recreated here.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .layers import MultiHeadAttention


class BertCrossLayer(nn.Module):
    """Cross-attention block: q attends kv; returns (output, attn probs)."""

    num_heads: int = 8
    dropout: float = 0.1
    eps: float = 1e-12

    @nn.compact
    def __call__(
        self,
        q: jnp.ndarray,
        kv: jnp.ndarray,
        kv_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        d = q.shape[-1]
        attn_out, probs = MultiHeadAttention(
            num_heads=self.num_heads, dropout=self.dropout, name="attention"
        )(q, kv, kv, key_mask=kv_mask, deterministic=deterministic, return_probs=True)
        attn_out = nn.Dropout(self.dropout)(attn_out, deterministic=deterministic)
        attn_out = nn.LayerNorm(epsilon=self.eps, name="attention_ln")(q + attn_out)

        inter = nn.gelu(nn.Dense(d, name="intermediate")(attn_out), approximate=False)
        out = nn.Dense(d, name="output")(inter)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        out = nn.LayerNorm(epsilon=self.eps, name="output_ln")(out + attn_out)
        return out, probs


class PredictionHead(nn.Module):
    """dense+gelu+LN transform, then vocab projection with separate bias."""

    vocab_size: int
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        h = nn.gelu(nn.Dense(d, name="transform")(x), approximate=False)
        h = nn.LayerNorm(epsilon=self.eps, name="transform_ln")(h)
        h = nn.Dense(self.vocab_size, use_bias=False, name="decoder")(h)
        bias = self.param("bias", nn.initializers.zeros, (self.vocab_size,))
        return h + bias
