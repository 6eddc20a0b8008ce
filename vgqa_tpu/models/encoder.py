"""Cross-modal encoder: fuse per-frame ResNet tokens, text tokens, and Video
Swin tokens with a stack of per-frame self-attention layers.

TPU-native re-design of ``CrossModalEncoder``/``SpatialTemporalEncoder``
(/root/reference/vgqa/core/decoder/modal_encoder.py:12-178):

* The reference builds a [S, sumT, d] sequence with Python-side concatenation
  and runs torch MHA treating frames as the batch axis. Here the layout is an
  explicit static [V, T, S, d] with S = hw + L + hw (ResNet | text | Swin —
  the token order of modal_encoder.py:64), and each layer is one batched
  einsum attention over (V, T) on the MXU.
* Masks are True=valid and *correct per segment* — the reference guarantees a
  non-empty mask by force-unmasking one pixel (modal_encoder.py:46); the
  static layout keeps a guaranteed-valid token instead.
* The reference clones ``temporal_layers`` that never run
  (modal_encoder.py:93,125-132 — dead parameters); they are not recreated.
* ``frames_cls`` is the plain mean over all S tokens after the final
  LayerNorm and ``videos_cls`` the mean over frames, matching
  modal_encoder.py:135-140 (with a time-mask-aware mean over frames, which
  is identical in the reference's regime of exact-length clips).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import MultiHeadAttention, TransformerFFN


class EncoderLayer(nn.Module):
    """Post-LN transformer encoder layer; q/k carry additive positions
    (parity with TransformerEncoderLayer, modal_encoder.py:143-178)."""

    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    use_flash: bool = False

    @nn.compact
    def __call__(self, src, pos, mask, deterministic=True):
        q = src + pos
        attn = MultiHeadAttention(
            self.num_heads, self.dropout, use_flash=self.use_flash,
            name="self_attn",
        )(q, q, src, key_mask=mask, deterministic=deterministic)
        src = src + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        src = nn.LayerNorm(epsilon=1e-5, name="norm1")(src)
        ffn = TransformerFFN(self.ffn_dim, src.shape[-1], self.dropout, name="ffn")(
            src, deterministic
        )
        src = src + nn.Dropout(self.dropout)(ffn, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(src)


class CrossModalEncoder(nn.Module):
    num_layers: int = 6
    num_heads: int = 8
    ffn_dim: int = 2048
    dropout: float = 0.1
    use_flash: bool = False
    remat: bool = False  # per-layer gradient checkpointing

    @nn.compact
    def __call__(
        self,
        vis_tokens: jnp.ndarray,    # [V, T, hw, d]  ResNet tokens (projected)
        swin_tokens: jnp.ndarray,   # [V, T, hw, d]  Video Swin tokens (projected)
        text_tokens: jnp.ndarray,   # [V, L, d]
        vis_pos: jnp.ndarray,       # [V, hw, d]     2D sine positions
        vis_mask: jnp.ndarray,      # [V, hw] bool   feature-level validity
        text_mask: jnp.ndarray,     # [V, L] bool
        time_mask: jnp.ndarray,     # [V, T] bool
        deterministic: bool = True,
    ):
        V, T, hw, d = vis_tokens.shape
        L = text_tokens.shape[1]

        text_b = jnp.broadcast_to(text_tokens[:, None], (V, T, L, d))
        src = jnp.concatenate([vis_tokens, text_b, swin_tokens], axis=2)

        zeros_L = jnp.zeros((V, L, d), src.dtype)
        pos = jnp.concatenate([vis_pos, zeros_L, vis_pos], axis=1)  # [V, S, d]
        pos = jnp.broadcast_to(pos[:, None], src.shape)

        # guarantee one valid key per frame (reference unmasks pixel (0,0),
        # modal_encoder.py:46)
        vis_mask = vis_mask.at[:, 0].set(True)
        mask = jnp.concatenate([vis_mask, text_mask, vis_mask], axis=1)  # [V, S]
        mask = jnp.broadcast_to(mask[:, None], (V, T, hw + L + hw))

        h = src
        layer_cls = (
            nn.remat(EncoderLayer, static_argnums=(4,))
            if self.remat else EncoderLayer
        )
        for i in range(self.num_layers):
            h = layer_cls(
                self.num_heads, self.ffn_dim, self.dropout, self.use_flash,
                name=f"layer_{i}",
            )(h, pos, mask, deterministic)
        h = nn.LayerNorm(epsilon=1e-5, name="norm")(h)

        frames_cls = h.mean(axis=2)  # [V, T, d]
        tm = time_mask.astype(h.dtype)[..., None]
        videos_cls = (frames_cls * tm).sum(1) / jnp.maximum(tm.sum(1), 1.0)  # [V, d]
        return {
            "encoded": h,            # [V, T, S, d]
            "frames_cls": frames_cls,
            "videos_cls": videos_cls,
            "vis_pos": vis_pos,
            "vis_mask": vis_mask,
            "text_mask": text_mask,
            "hw": hw,
            "text_len": L,
        }


class TemporalSampling(nn.Module):
    """Per-frame relevance classifier.

    Parity with /root/reference/vgqa/core/decoder/classifier.py:9-37:
    spatially pooled frame features cross-attend into the text CLS tokens
    through 2 BERT cross layers; a vocab-1 prediction head yields one logit
    per frame. Text padding is masked here (the reference runs with batch=1
    and longest-padding, i.e. no pad tokens — masking is the static-shape
    equivalent).
    """

    num_layers: int = 2

    @nn.compact
    def __call__(
        self,
        frame_feats: jnp.ndarray,  # [V, T, hw, d] (already detached by caller)
        text_ctx: jnp.ndarray,     # [V, L, d]
        text_mask: Optional[jnp.ndarray] = None,  # [V, L]
        deterministic: bool = True,
    ) -> jnp.ndarray:
        from .bert_blocks import BertCrossLayer, PredictionHead

        x = frame_feats.mean(axis=2)  # [V, T, d] global average pool over hw
        for i in range(self.num_layers):
            x, _ = BertCrossLayer(name=f"layer_ca_{i}")(
                x, text_ctx, kv_mask=text_mask, deterministic=deterministic
            )
        logits = PredictionHead(1, name="head")(x)  # [V, T, 1]
        return logits[..., 0]


class SpatialActivation(nn.Module):
    """Attribute/verb classifier + per-frame spatial attention map.

    Parity with /root/reference/vgqa/core/decoder/classifier.py:40-81. The
    reference gathers a dynamic subset of frames (grounding_net.py:131-132);
    here activation runs on *all* frames and the caller reduces with a frame
    mask — the static-shape equivalent of gather-then-mean.
    """

    vocab_size: int
    num_layers: int = 2

    @nn.compact
    def __call__(
        self,
        frame_tokens: jnp.ndarray,  # [V, T, hw, d]
        init_q: jnp.ndarray,        # [V, 1, d]  (text CLS)
        frame_mask: jnp.ndarray,    # [V, T] bool — frames to include in logits
        deterministic: bool = True,
    ):
        from .bert_blocks import BertCrossLayer, PredictionHead

        V, T, hw, d = frame_tokens.shape
        query = jnp.broadcast_to(init_q[:, None], (V, T, 1, d))
        probs = None
        for i in range(self.num_layers):
            query, probs = BertCrossLayer(name=f"layer_ca_{i}")(
                query, frame_tokens, deterministic=deterministic
            )
        # probs: [V, T, heads, 1, hw] -> head-summed sigmoid map, min-max
        # normalized per frame (classifier.py:75-78)
        att = jax.nn.sigmoid(probs.sum(axis=2)[..., 0, :])  # [V, T, hw]
        att_min = att.min(axis=-1, keepdims=True)
        att_max = att.max(axis=-1, keepdims=True)
        att = (att - att_min) / (att_max - att_min + 1e-6)

        logits_all = PredictionHead(self.vocab_size, name="head")(query[..., 0, :])
        fm = frame_mask.astype(logits_all.dtype)[..., None]
        logits = (logits_all * fm).sum(1) / jnp.maximum(fm.sum(1), 1.0)  # [V, vocab]
        return logits, att
