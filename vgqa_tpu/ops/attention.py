"""Masked multi-head attention core (pure einsum form).

One attention primitive backs every attention in the framework (encoder
self-attention, decoder self/cross attention, BERT-style cross blocks, Swin
window attention). The reference implements four separate variants
(torch nn.MultiheadAttention; a hand-rolled no-input-projection variant at
/root/reference/vgqa/core/decoder/attention.py:13-260; BertSelfAttention at
/root/reference/vgqa/core/language/bert_module.py:34-80; WindowAttention3D at
/root/reference/vgqa/core/vision/video_swin_transformer.py:70-155). Here the
q/k/v projections live in the calling flax modules and the core is a single
batched einsum chain that XLA maps onto the MXU; differences between the
variants reduce to head count, bias terms, and masks.

Mask convention: True = attend (valid); False positions get -inf before the
softmax. This is inverse to torch's key_padding_mask.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

NEG_INF = -1e30


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """[..., L, H*D] -> [..., H, L, D]"""
    *lead, L, dim = x.shape
    head_dim = dim // num_heads
    x = x.reshape(*lead, L, num_heads, head_dim)
    return jnp.moveaxis(x, -2, -3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[..., H, L, D] -> [..., L, H*D]"""
    x = jnp.moveaxis(x, -3, -2)
    *lead, L, h, d = x.shape
    return x.reshape(*lead, L, h * d)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    key_mask: Optional[jnp.ndarray] = None,
    attn_bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    dropout_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    return_probs: bool = False,
):
    """Scaled dot-product attention over pre-projected q/k/v.

    q: [..., Lq, Dqk], k: [..., Lk, Dqk], v: [..., Lk, Dv]
    key_mask: [..., Lk] bool (True = valid) or [..., Lq, Lk]
    attn_bias: broadcastable to [..., H, Lq, Lk] (e.g. Swin relative bias)
    dropout_fn: applied to the post-softmax probabilities (train only)

    Returns out [..., Lq, Dv] (and probs [..., H, Lq, Lk] if requested —
    probs are pre-dropout, matching the reference's att_map clone at
    bert_module.py:73).
    """
    qh = split_heads(q, num_heads)
    kh = split_heads(k, num_heads)
    vh = split_heads(v, num_heads)
    if scale is None:
        scale = qh.shape[-1] ** -0.5
    logits = jnp.einsum(
        "...hqd,...hkd->...hqk", qh, kh, preferred_element_type=jnp.float32
    ) * scale
    if attn_bias is not None:
        logits = logits + attn_bias
    if key_mask is not None:
        if key_mask.ndim == logits.ndim - 2:  # [..., Lk]
            m = key_mask[..., None, None, :]
        else:  # [..., Lq, Lk]
            m = key_mask[..., None, :, :]
        logits = jnp.where(m, logits, NEG_INF)
    probs = jnp.astype(jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True)), jnp.float32)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    probs = probs.astype(q.dtype)
    weights = dropout_fn(probs) if dropout_fn is not None else probs
    out = jnp.einsum(
        "...hqk,...hkd->...hqd", weights, vh, preferred_element_type=jnp.float32
    ).astype(q.dtype)
    out = merge_heads(out)
    if return_probs:
        return out, probs
    return out
