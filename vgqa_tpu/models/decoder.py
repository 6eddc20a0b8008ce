"""Dual query decoders: temporal span decoder + conditional-DETR-style
spatial box decoder with iterative anchor refinement.

TPU-native re-design of /root/reference/vgqa/core/decoder/query_decoder.py:

* The reference's "time-aligned cross attention" reshapes the t frame queries
  into the batch axis and attends each single-token query into its own
  frame's tokens (query_decoder.py:339-366, 472-479). Here that is written
  directly as a batched [V, T, 1, S] attention — one einsum on the MXU, no
  zero-padding round-trips.
* The custom no-input-projection attention with 2*d_model q/k and d_model v
  (/root/reference/vgqa/core/decoder/attention.py:13-260, scaling
  (2c/heads)^-0.5, out_proj d_model->d_model) is expressed by calling the
  shared attention core on pre-projected tensors with explicit scale.
* Per-head concatenation layout of [content | sine] halves
  (query_decoder.py:319-333) is reproduced exactly: each head of the 2c
  query is [content_head_i, sine_head_i].
* The reference passes no key mask in the spatial cross-attention and a
  mis-sliced mask in the temporal one (query_decoder.py:100 slices
  [vis|text] for [text|swin] keys) — with batch=1 and longest-padding both
  are no-ops there; here the semantically correct masks are applied, which
  is behavior-identical in the reference's regime and correct under static
  padding.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import dot_product_attention
from ..ops.position_encoding import box_sine_embedding, sine_position_1d
from .layers import MLP, MultiHeadAttention, TransformerFFN


class TimeDecoderLayer(nn.Module):
    """Self-attention over frame queries + per-frame cross-attention into
    [text | swin] tokens (parity with query_decoder.py:425-486)."""

    num_heads: int
    ffn_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,          # [V, T, d]
        query_time: jnp.ndarray,   # [V, T, d]
        memory: jnp.ndarray,       # [V, T, S, d]
        memory_pos: jnp.ndarray,   # [V, T, S, d]
        memory_mask: jnp.ndarray,  # [V, T, S]
        time_mask: jnp.ndarray,    # [V, T]
        deterministic: bool = True,
    ) -> jnp.ndarray:
        q = k = tgt + query_time
        attn = MultiHeadAttention(self.num_heads, self.dropout, name="self_attn")(
            q, k, tgt, key_mask=time_mask, deterministic=deterministic
        )
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm1")(
            tgt + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        )

        # one query token per frame attends into that frame's memory tokens
        cross = MultiHeadAttention(self.num_heads, self.dropout, name="cross_attn")(
            tgt[:, :, None],                 # [V, T, 1, d]
            memory + memory_pos,
            memory,
            key_mask=memory_mask,
            deterministic=deterministic,
        )[:, :, 0]
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm3")(
            tgt + nn.Dropout(self.dropout)(cross, deterministic=deterministic)
        )

        ffn = TransformerFFN(self.ffn_dim, tgt.shape[-1], self.dropout, name="ffn")(
            tgt, deterministic
        )
        tgt = tgt + nn.Dropout(self.dropout)(ffn, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm4")(tgt)


class TimeDecoder(nn.Module):
    """Stack of TimeDecoderLayers returning per-layer normalized states
    (parity with query_decoder.py:379-423)."""

    num_layers: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self, tgt, query_time, memory, memory_pos, memory_mask, time_mask,
        deterministic=True,
    ) -> jnp.ndarray:
        norm = nn.LayerNorm(epsilon=1e-5, name="norm")
        intermediate = []
        for i in range(self.num_layers):
            tgt = TimeDecoderLayer(
                self.num_heads, self.ffn_dim, self.dropout, name=f"layer_{i}"
            )(tgt, query_time, memory, memory_pos, memory_mask, time_mask,
              deterministic)
            intermediate.append(norm(tgt))
        return jnp.stack(intermediate)  # [n_layers, V, T, d]


class PosDecoderLayer(nn.Module):
    """Conditional-DETR decoder layer with concat-style cross attention
    (parity with query_decoder.py:208-375)."""

    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    is_first: bool = False

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,              # [V, T, d]
        query_pos: jnp.ndarray,        # [V, T, d]
        query_time: jnp.ndarray,       # [V, T, d]
        query_sine: jnp.ndarray,       # [V, T, d] (scaled sine embed)
        memory: jnp.ndarray,           # [V, T, S, d]
        memory_pos: jnp.ndarray,       # [V, T, S, d]
        memory_mask: jnp.ndarray,      # [V, T, S]
        time_mask: jnp.ndarray,        # [V, T]
        deterministic: bool = True,
    ) -> jnp.ndarray:
        d = tgt.shape[-1]
        H = self.num_heads

        # -- self attention over frame queries (query_decoder.py:282-297) --
        q = (
            nn.Dense(d, name="sa_qcontent")(tgt)
            + nn.Dense(d, name="sa_qtime")(query_time)
            + nn.Dense(d, name="sa_qpos")(query_pos)
        )
        k = (
            nn.Dense(d, name="sa_kcontent")(tgt)
            + nn.Dense(d, name="sa_ktime")(query_time)
            + nn.Dense(d, name="sa_kpos")(query_pos)
        )
        v = nn.Dense(d, name="sa_v")(tgt)
        attn = MultiHeadAttention(H, self.dropout, name="self_attn")(
            q, k, v, key_mask=time_mask, deterministic=deterministic
        )
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm1")(
            tgt + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        )

        # -- time-aligned concat cross attention (query_decoder.py:299-369) --
        q_content = nn.Dense(d, name="ca_qcontent")(tgt)
        k_content = nn.Dense(d, name="ca_kcontent")(memory)
        v = nn.Dense(d, name="ca_v")(memory)
        k_pos = nn.Dense(d, name="ca_kpos")(memory_pos)
        sine = nn.Dense(d, name="ca_qpos_sine")(query_sine)

        if self.is_first:
            # first layer folds the anchor position into content q/k
            # (query_decoder.py:311-314); later layers share no ca_qpos
            # (query_decoder.py:147-148)
            q_content = q_content + nn.Dense(d, name="ca_qpos")(query_pos)
            k_content = k_content + k_pos

        def headwise_concat(a, b):
            *lead, dim = a.shape
            a = a.reshape(*lead, H, dim // H)
            b = b.reshape(*lead, H, dim // H)
            return jnp.concatenate([a, b], axis=-1).reshape(*lead, 2 * dim)

        q2 = headwise_concat(q_content, sine)[:, :, None]     # [V, T, 1, 2d]
        k2 = headwise_concat(k_content, k_pos)                # [V, T, S, 2d]
        head_dim2 = 2 * d // H
        cross = dot_product_attention(
            q2, k2, v, H,
            key_mask=memory_mask[:, :, None],
            scale=float(head_dim2) ** -0.5,
        )[:, :, 0]                                            # [V, T, d]
        cross = nn.Dense(d, name="cross_out")(cross)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm3")(
            tgt + nn.Dropout(self.dropout)(cross, deterministic=deterministic)
        )

        ffn = TransformerFFN(self.ffn_dim, d, self.dropout, name="ffn")(
            tgt, deterministic
        )
        tgt = tgt + nn.Dropout(self.dropout)(ffn, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm4")(tgt)


class PosDecoder(nn.Module):
    """Iterative-anchor spatial decoder (parity with query_decoder.py:129-205).

    Returns per-layer anchor boxes [n_layers, V, T, 4] (sigmoid space).
    """

    num_layers: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,          # [V, T, d]
        init_boxes: jnp.ndarray,   # [V, T, 4] sigmoid-space anchors
        query_time: jnp.ndarray,   # [V, T, d]
        memory: jnp.ndarray,       # [V, T, S, d]
        memory_pos: jnp.ndarray,   # [V, T, S, d]
        memory_mask: jnp.ndarray,  # [V, T, S]
        time_mask: jnp.ndarray,    # [V, T]
        deterministic: bool = True,
    ) -> jnp.ndarray:
        d = tgt.shape[-1]
        query_scale = MLP(d, d, 2, name="query_scale")
        ref_point_head = MLP(d, d, 2, name="ref_point_head")
        bbox_embed = MLP(d, 4, 3, name="bbox_embed")

        pred_boxes = init_boxes
        anchors = []
        for i in range(self.num_layers):
            sine_full = box_sine_embedding(pred_boxes)        # [V, T, 2d]
            query_pos = ref_point_head(sine_full, deterministic)
            transform = 1.0 if i == 0 else query_scale(tgt, deterministic)
            query_sine = sine_full[..., :d] * transform

            tgt = PosDecoderLayer(
                self.num_heads, self.ffn_dim, self.dropout,
                is_first=(i == 0), name=f"layer_{i}",
            )(tgt, query_pos, query_time, query_sine, memory, memory_pos,
              memory_mask, time_mask, deterministic)

            new_boxes = jax.nn.sigmoid(bbox_embed(tgt, deterministic))
            anchors.append(new_boxes)
            pred_boxes = jax.lax.stop_gradient(new_boxes)
        return jnp.stack(anchors)  # [n_layers, V, T, 4]


class QueryDecoder(nn.Module):
    """Joint wrapper generating dynamic queries and running both decoders
    (parity with query_decoder.py:15-126)."""

    num_layers: int = 6
    num_heads: int = 8
    ffn_dim: int = 2048
    dropout: float = 0.1
    video_max_len: int = 200
    use_learned_time_embed: bool = False

    @nn.compact
    def __call__(
        self,
        encoded: dict,
        init_spatial_query: jnp.ndarray,   # [V, d]
        init_temporal_query: jnp.ndarray,  # [V, d]
        time_mask: jnp.ndarray,            # [V, T]
        deterministic: bool = True,
    ):
        h = encoded["encoded"]            # [V, T, S, d]
        V, T, S, d = h.shape
        hw = encoded["hw"]
        L = encoded["text_len"]
        vis_pos = encoded["vis_pos"]      # [V, hw, d]
        vis_mask = encoded["vis_mask"]    # [V, hw]
        text_mask = encoded["text_mask"]  # [V, L]

        # dynamic anchors (LN -> dropout -> linear -> relu -> LN,
        # query_decoder.py:53-59,92-94)
        x = nn.LayerNorm(epsilon=1e-12, name="pos_fc_ln1")(encoded["frames_cls"])
        x = nn.Dropout(0.1)(x, deterministic=deterministic)
        x = nn.relu(nn.Dense(4, name="pos_fc_linear")(x))
        x = nn.LayerNorm(epsilon=1e-12, name="pos_fc_ln2")(x)
        init_boxes = jax.nn.sigmoid(x)  # [V, T, 4]

        # time_fc exists for parameter parity; its output is accepted but
        # unused by the reference TimeDecoderLayer (query_decoder.py:61-67,
        # 459-466)
        y = nn.LayerNorm(epsilon=1e-12, name="time_fc_ln1")(encoded["videos_cls"])
        y = nn.Dropout(0.1)(y, deterministic=deterministic)
        y = nn.relu(nn.Dense(d, name="time_fc_linear")(y))
        _ = nn.LayerNorm(epsilon=1e-12, name="time_fc_ln2")(y)

        if self.use_learned_time_embed:
            table = self.param(
                "time_embed", nn.initializers.normal(1.0),
                (self.video_max_len + 1, d),
            )
            query_time = table[:T]
        else:
            query_time = sine_position_1d(T, d)
        query_time = jnp.broadcast_to(query_time[None], (V, T, d)).astype(h.dtype)

        zeros_L = jnp.zeros((V, L, d), h.dtype)
        pos_b = jnp.broadcast_to(vis_pos[:, None], (V, T, hw, d))

        # temporal decoder memory: [text | swin] tokens per frame
        mem_t = h[:, :, hw:]
        pos_t = jnp.concatenate(
            [jnp.broadcast_to(zeros_L[:, None], (V, T, L, d)), pos_b], axis=2
        )
        mask_t = jnp.concatenate([text_mask, vis_mask], axis=1)
        mask_t = jnp.broadcast_to(mask_t[:, None], (V, T, L + hw))

        # spatial decoder memory: [resnet | text] tokens per frame
        mem_s = h[:, :, : hw + L]
        pos_s = jnp.concatenate(
            [pos_b, jnp.broadcast_to(zeros_L[:, None], (V, T, L, d))], axis=2
        )
        mask_s = jnp.concatenate([vis_mask, text_mask], axis=1)
        mask_s = jnp.broadcast_to(mask_s[:, None], (V, T, hw + L))

        tgt_t = jnp.broadcast_to(init_temporal_query[:, None], (V, T, d))
        outputs_time = TimeDecoder(
            self.num_layers, self.num_heads, self.ffn_dim, self.dropout,
            name="time_decoder",
        )(tgt_t, query_time, mem_t, pos_t, mask_t, time_mask, deterministic)

        tgt_s = jnp.broadcast_to(init_spatial_query[:, None], (V, T, d))
        outputs_pos = PosDecoder(
            self.num_layers, self.num_heads, self.ffn_dim, self.dropout,
            name="decoder",
        )(tgt_s, init_boxes, query_time, mem_s, pos_s, mask_s, time_mask,
          deterministic)

        return outputs_pos, outputs_time
