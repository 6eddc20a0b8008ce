"""Shared flax building blocks for the grounding model family."""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import dot_product_attention


class MLP(nn.Module):
    """ReLU MLP head; parity with /root/reference/vgqa/core/model_utils.py:43-58
    (ReLU between layers, optional inter-layer dropout, linear output)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        for i in range(self.num_layers):
            is_last = i == self.num_layers - 1
            dim = self.output_dim if is_last else self.hidden_dim
            x = nn.Dense(dim, name=f"layers_{i}")(x)
            if not is_last:
                x = nn.relu(x)
                if self.dropout > 0:
                    x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class FeatureResizer(nn.Module):
    """Linear projection + LayerNorm(eps=1e-12) + dropout.

    Parity with /root/reference/vgqa/core/language/bert.py:78-95."""

    output_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Dense(self.output_dim, name="fc")(x)
        x = nn.LayerNorm(epsilon=1e-12, name="layer_norm")(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class LearnedPosition2D(nn.Module):
    """Learnable 2D position embeddings from row/col tables.

    Parity with PositionEmbeddingLearned (/root/reference/vgqa/core/vision/
    position_encoding.py:94-128): 50-entry uniform-initialized row and col
    embeddings; output channel order is x-embed then y-embed (the learned
    variant orders x first, unlike the sine variants)."""

    num_pos_feats: int = 128
    table_size: int = 50

    @nn.compact
    def __call__(self, h: int, w: int) -> jnp.ndarray:
        """Returns [h, w, 2*num_pos_feats]."""
        row = self.param(
            "row_embed", nn.initializers.uniform(scale=1.0),
            (self.table_size, self.num_pos_feats),
        )
        col = self.param(
            "col_embed", nn.initializers.uniform(scale=1.0),
            (self.table_size, self.num_pos_feats),
        )
        x_emb = jnp.broadcast_to(col[None, :w], (h, w, self.num_pos_feats))
        y_emb = jnp.broadcast_to(row[:h, None], (h, w, self.num_pos_feats))
        return jnp.concatenate([x_emb, y_emb], axis=-1)


class MultiHeadAttention(nn.Module):
    """Projected multi-head attention (torch nn.MultiheadAttention shape).

    Optionally takes a separate value dim and output dim. The decoders'
    "from scratch" cross-attention variant (2*d_model q/k vs d_model v —
    /root/reference/vgqa/core/decoder/attention.py:13-113) is expressed by
    calling the attention core directly with pre-projected tensors; this
    module covers the standard projected case.
    """

    num_heads: int
    dropout: float = 0.0
    out_dim: Optional[int] = None
    use_flash: bool = False  # fused Pallas kernel (inference path)

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        key_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        return_probs: bool = False,
    ):
        d_model = query.shape[-1]
        out_dim = self.out_dim or d_model
        q = nn.Dense(d_model, name="q_proj")(query)
        k = nn.Dense(d_model, name="k_proj")(key)
        v = nn.Dense(d_model, name="v_proj")(value)
        import os as _os

        interpret = _os.environ.get("VGQA_PALLAS_INTERPRET") == "1"
        if (
            self.use_flash
            and deterministic
            and not return_probs
            and (jax.default_backend() == "tpu" or interpret)
        ):
            # fused per-batch-row attention: heads stay packed in the
            # channel dim, key padding handled as an in-kernel column mask
            from ..ops.pallas.window_attention import window_attention

            lead = q.shape[:-2]
            n = q.shape[-2]
            w = 1
            for s in lead:
                w *= s
            kv = None
            if key_mask is not None:
                kv = jnp.broadcast_to(
                    key_mask, (*lead, key_mask.shape[-1])
                ).reshape(w, -1)
            out = window_attention(
                q.reshape(w, n, d_model),
                k.reshape(w, n, d_model),
                v.reshape(w, n, d_model),
                key_valid=kv,
                num_heads=self.num_heads,
                interpret=interpret,
            ).reshape(*lead, n, d_model)
            return nn.Dense(out_dim, name="out_proj")(out)
        if (
            self.use_flash
            and not deterministic
            and not return_probs
            and (jax.default_backend() == "tpu" or interpret)
            and _os.environ.get("VGQA_FLASH_TRAIN", "1") == "1"
        ):
            # differentiable flash path: backward recomputes probabilities
            # instead of storing the [.., H, Lq, Lk] tensor; attention-prob
            # dropout runs in-kernel from a per-step seed
            from ..ops.pallas.flash_train import flash_mha_train, supported_seq

            if supported_seq(q.shape[-2], k.shape[-2]):
                if self.dropout > 0:
                    bits = jax.random.bits(
                        self.make_rng("dropout"), (), jnp.uint32
                    )
                    seed = jax.lax.bitcast_convert_type(bits, jnp.int32)
                else:
                    seed = jnp.int32(0)
                out = flash_mha_train(
                    q, k, v, self.num_heads, key_mask=key_mask,
                    dropout_rate=self.dropout, seed=seed,
                    interpret=interpret,
                )
                return nn.Dense(out_dim, name="out_proj")(out)
        drop: Optional[Callable] = None
        if self.dropout > 0 and not deterministic:
            dropout_mod = nn.Dropout(self.dropout)
            drop = lambda p: dropout_mod(p, deterministic=False)  # noqa: E731
        out = dot_product_attention(
            q, k, v, self.num_heads, key_mask=key_mask, dropout_fn=drop,
            return_probs=return_probs,
        )
        if return_probs:
            out, probs = out
        out = nn.Dense(out_dim, name="out_proj")(out)
        if return_probs:
            return out, probs
        return out


class TransformerFFN(nn.Module):
    """linear -> act -> dropout -> linear, residual+LN applied by caller."""

    ffn_dim: int
    d_model: int
    dropout: float = 0.1
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = nn.Dense(self.ffn_dim, name="linear1")(x)
        h = self.activation(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.d_model, name="linear2")(h)
