"""Sinusoidal / learned position encodings (pure functions).

Functional equivalents of:
* 2D image sine embedding — /root/reference/vgqa/core/vision/position_encoding.py:50-91
* 1D sequence sine embedding — /root/reference/vgqa/core/decoder/position_encoding.py:25-41
* box-anchor sine embedding — /root/reference/vgqa/core/model_utils.py:15-40

All are computed from masks/static lengths at trace time — no embedding
tables to carry except the learned variants (implemented as flax modules in
the model files that use them).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def _interleave_sin_cos(x: jnp.ndarray) -> jnp.ndarray:
    """stack(sin(x[..., 0::2]), cos(x[..., 1::2])) pairwise-interleaved,
    matching the torch ``stack(...).flatten(-2)`` idiom."""
    sin = jnp.sin(x[..., 0::2])
    cos = jnp.cos(x[..., 1::2])
    return jnp.stack([sin, cos], axis=-1).reshape(*x.shape[:-1], -1)


def sine_position_2d(
    pixel_mask: jnp.ndarray,
    num_pos_feats: int = 128,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float | None = None,
) -> jnp.ndarray:
    """2D sine embedding over a spatial validity mask.

    pixel_mask: [..., H, W] bool, True = valid pixel.
    Returns [..., H, W, 2*num_pos_feats] (y-embed then x-embed, matching the
    reference's channel order at position_encoding.py:90).
    """
    if scale is None:
        scale = 2 * math.pi
    not_mask = pixel_mask.astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=-2)
    x_embed = jnp.cumsum(not_mask, axis=-1)
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[..., -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[..., :, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)
    pos_x = _interleave_sin_cos(x_embed[..., None] / dim_t)
    pos_y = _interleave_sin_cos(y_embed[..., None] / dim_t)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


def sine_position_hw_2d(
    pixel_mask: jnp.ndarray,
    num_pos_feats: int = 128,
    temperature_h: float = 20.0,
    temperature_w: float = 20.0,
    normalize: bool = True,
    scale: float | None = None,
) -> jnp.ndarray:
    """2D sine embedding with separate H/W temperatures.

    Parity with PositionEmbeddingSineHW (/root/reference/vgqa/core/vision/
    position_encoding.py:7-47); the builder instantiates it with
    temperatures (20, 20) (position_encoding.py:138). Same y-then-x channel
    order as :func:`sine_position_2d`.
    """
    if scale is None:
        scale = 2 * math.pi
    not_mask = pixel_mask.astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=-2)
    x_embed = jnp.cumsum(not_mask, axis=-1)
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[..., -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[..., :, -1:] + eps) * scale

    idx = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_tx = temperature_w ** (2 * jnp.floor(idx / 2) / num_pos_feats)
    dim_ty = temperature_h ** (2 * jnp.floor(idx / 2) / num_pos_feats)
    pos_x = _interleave_sin_cos(x_embed[..., None] / dim_tx)
    pos_y = _interleave_sin_cos(y_embed[..., None] / dim_ty)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


def sine_position_1d(length: int, d_model: int) -> jnp.ndarray:
    """1D sequence sine embedding [length, d_model].

    Matches SeqEmbeddingSine (/root/reference/vgqa/core/decoder/
    position_encoding.py:25-41): even channels sin, odd channels cos with a
    shared log-spaced frequency ladder.
    """
    position = jnp.arange(length, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-math.log(10000.0) / d_model)
    )
    te = jnp.zeros((length, d_model), dtype=jnp.float32)
    te = te.at[:, 0::2].set(jnp.sin(position * div_term))
    te = te.at[:, 1::2].set(jnp.cos(position * div_term))
    return te


def box_sine_embedding(pos: jnp.ndarray, num_feats: int = 128) -> jnp.ndarray:
    """Sine embedding of box anchors.

    pos: [..., 2] (cx, cy) or [..., 4] (cx, cy, w, h) in [0, 1].
    Returns [..., num_feats * pos.shape[-1]] ordered (y, x[, w, h]) to match
    gen_sineembed_for_position (/root/reference/vgqa/core/model_utils.py:15-40).
    """
    scale = 2 * math.pi
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = 10000.0 ** (2 * jnp.floor(dim_t / 2) / num_feats)

    def embed(coord):
        return _interleave_sin_cos(coord[..., None] * scale / dim_t)

    parts = [embed(pos[..., 1]), embed(pos[..., 0])]  # y then x
    if pos.shape[-1] == 4:
        parts += [embed(pos[..., 2]), embed(pos[..., 3])]  # w, h
    elif pos.shape[-1] != 2:
        raise ValueError(f"Unknown anchor dim {pos.shape[-1]}")
    return jnp.concatenate(parts, axis=-1)


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """Stable logit; parity with /root/reference/vgqa/core/model_utils.py:8-12."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)
