"""RoBERTa text encoder (flax, from scratch) + grounding text tower.

Re-implements the encoder the reference obtains from HF ``RobertaModel``
(/root/reference/vgqa/core/language/bert.py:44-75): 12-layer post-LN
transformer, learned positions with a pad-offset of 2, tanh pooler, and a
``FeatureResizer`` projecting 768 -> d_model with LayerNorm(1e-12).

Differences by design (TPU-first):
* Tokenization happens on the host *outside* jit (the reference tokenizes
  inside ``forward`` every step, bert.py:65) — the jitted graph sees only
  static [V, L] int32 ids + masks.
* Masks are True=valid (the reference carries inverted masks).
* Weights load from a converted HF checkpoint via tools/convert_weights.py
  when available; otherwise initialization is from scratch.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import FeatureResizer, MultiHeadAttention


@dataclass(frozen=True)
class RobertaConfig:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    pad_token_id: int = 1
    layer_norm_eps: float = 1e-5
    dropout: float = 0.1

    @classmethod
    def tiny(cls) -> "RobertaConfig":
        """Small config for tests."""
        return cls(vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
                   intermediate_size=64, max_position_embeddings=66)


class RobertaLayer(nn.Module):
    cfg: RobertaConfig

    @nn.compact
    def __call__(self, h, mask, deterministic=True):
        c = self.cfg
        attn_out = MultiHeadAttention(
            num_heads=c.num_heads, dropout=c.dropout, name="attention"
        )(h, h, h, key_mask=mask, deterministic=deterministic)
        attn_out = nn.Dropout(c.dropout)(attn_out, deterministic=deterministic)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="attention_ln")(h + attn_out)
        inter = nn.gelu(nn.Dense(c.intermediate_size, name="intermediate")(h), approximate=False)
        out = nn.Dense(c.hidden_size, name="output")(inter)
        out = nn.Dropout(c.dropout)(out, deterministic=deterministic)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="output_ln")(h + out)


class RobertaModel(nn.Module):
    cfg: RobertaConfig

    @nn.compact
    def __call__(self, token_ids, mask, deterministic=True):
        """token_ids [V, L] int32, mask [V, L] bool (True=valid).

        Returns (hidden [V, L, H], pooled [V, H])."""
        c = self.cfg
        # out-of-range ids produce backend-dependent garbage (NaN on CPU);
        # clamp so a vocab/tokenizer mismatch degrades instead of poisoning
        token_ids = jnp.clip(token_ids, 0, c.vocab_size - 1)
        word = nn.Embed(c.vocab_size, c.hidden_size, name="word_embeddings")(token_ids)
        # RoBERTa position ids: pad positions keep pad_token_id; real tokens
        # count up from pad_token_id + 1 (HF create_position_ids_from_input_ids)
        incremental = jnp.cumsum(mask.astype(jnp.int32), axis=-1) * mask
        position_ids = incremental + c.pad_token_id
        pos = nn.Embed(
            c.max_position_embeddings, c.hidden_size, name="position_embeddings"
        )(position_ids)
        tok_type = nn.Embed(
            c.type_vocab_size, c.hidden_size, name="token_type_embeddings"
        )(jnp.zeros_like(token_ids))
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="embeddings_ln")(
            word + pos + tok_type
        )
        h = nn.Dropout(c.dropout)(h, deterministic=deterministic)
        for i in range(c.num_layers):
            h = RobertaLayer(c, name=f"layer_{i}")(h, mask, deterministic)
        pooled = nn.tanh(nn.Dense(c.hidden_size, name="pooler")(h[:, 0]))
        return h, pooled


class TextEncoder(nn.Module):
    """RoBERTa + FeatureResizer; the grounding model's text tower.

    Parity with ``Roberta`` (/root/reference/vgqa/core/language/bert.py:44-75):
    returns resized token features, resized CLS, and the validity mask.
    """

    cfg: RobertaConfig
    out_dim: int = 256
    freeze: bool = False

    @nn.compact
    def __call__(self, token_ids, mask, deterministic=True):
        hidden, pooled = RobertaModel(self.cfg, name="body")(
            token_ids, mask, deterministic
        )
        if self.freeze:
            hidden = jax.lax.stop_gradient(hidden)
            pooled = jax.lax.stop_gradient(pooled)
        resizer = FeatureResizer(self.out_dim, dropout=0.1, name="resizer")
        text_tokens = resizer(hidden, deterministic)
        text_cls = resizer(pooled, deterministic)
        return text_tokens, text_cls
