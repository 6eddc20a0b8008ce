"""Fused (flash) attention kernel for TPU (Pallas).

Streaming-softmax attention over pre-projected q/k/v, replacing the
materialized [Lq, Lk] probability matrix of the einsum path
(vgqa_tpu/ops/attention.py) for the hot per-frame encoder attention —
at 420px the cross-modal encoder attends 418 tokens per frame across 64
frames x 8 heads (the reference's hottest block, SURVEY.md §3 "hot loops").

Layout: q [B, Lq, D], k/v [B, Lk, D] with B = (videos x frames x heads)
folded into the grid's batch axis; one program computes one (batch, q-tile)
pair, looping over k-tiles with running max/denominator in VMEM scratch.
The head dim is padded to the 128-lane width on entry.

Numerics match dot_product_attention to ~1e-5 (see tests/test_pallas.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale, blk_k, lk):
    """One (batch, q-tile): stream over k tiles with online softmax.

    Matmul inputs stay in the input dtype (bf16 on TPU) with f32
    accumulation — an f32 MXU matmul runs at a fraction of the bf16 rate,
    and the XLA einsum path this kernel replaces also contracts bf16
    operands (including bf16 post-softmax probabilities,
    ops/attention.py:82-86), so bf16 dots match its numerics, not just
    its speed. Softmax statistics remain f32."""
    q = q_ref[0]                                       # [blk_q, D]
    blk_q = q.shape[0]
    d = q.shape[1]

    num_k = pl.cdiv(lk, blk_k)

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * blk_k, blk_k), :]
        v = v_ref[0, pl.ds(i * blk_k, blk_k), :]
        mask = mask_ref[0, 0, pl.ds(i * blk_k, blk_k)]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                      # [blk_q, blk_k] f32
        s = jnp.where(mask[None, :], s, NEG_INF)

        m_cur = jnp.max(s, axis=-1)                    # [blk_q]
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, None])                # [blk_q, blk_k]
        l_new = l_prev * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((blk_q, d), jnp.float32)
    m0 = jnp.full((blk_q,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((blk_q,), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, num_k, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)[:, None]).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    blk_q: int = 128,
    blk_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """q [B, Lq, D], k/v [B, Lk, D], key_mask [B, Lk] True=attend.

    Returns [B, Lq, D] in q.dtype."""
    B, Lq, D = q.shape
    Lk = k.shape[1]
    if scale is None:
        scale = D**-0.5

    d_pad = _round_up(D, 128)
    lq_pad = _round_up(Lq, blk_q)
    lk_pad = _round_up(Lk, blk_k)

    qp = jnp.pad(q, ((0, 0), (0, lq_pad - Lq), (0, d_pad - D)))
    kp = jnp.pad(k, ((0, 0), (0, lk_pad - Lk), (0, d_pad - D)))
    vp = jnp.pad(v, ((0, 0), (0, lk_pad - Lk), (0, d_pad - D)))
    if key_mask is None:
        key_mask = jnp.ones((B, Lk), bool)
    # carry an explicit singleton sublane dim: TPU lowering requires the
    # block's trailing two dims be (8k, 128k) or match the array dims
    maskp = jnp.pad(key_mask, ((0, 0), (0, lk_pad - Lk)))[:, None, :]

    grid = (B, lq_pad // blk_q)
    kernel = functools.partial(
        _flash_kernel, scale=scale, blk_k=blk_k, lk=lk_pad
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, blk_q, d_pad), lambda b, i: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, lk_pad, d_pad), lambda b, i: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, lk_pad, d_pad), lambda b, i: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, lk_pad), lambda b, i: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, blk_q, d_pad), lambda b, i: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, lq_pad, d_pad), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, maskp)
    return out[:, :Lq, :D]


def flash_mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    key_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    blk_q: int = 128,
    blk_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for ops.attention.dot_product_attention (no probs/dropout):
    q [..., Lq, H*Dh], k/v [..., Lk, H*Dh], key_mask [..., Lk].

    ``blk_q``/``blk_k`` tile the (padded) sequence: pick blocks that divide
    round_up(L, 128) exactly to avoid padded-tile work (e.g. 384 for the
    ViT's L=1025 -> 1152)."""
    *lead, Lq, dim = q.shape
    Lk = k.shape[-2]
    dh = dim // num_heads
    if scale is None:
        scale = dh**-0.5
    B = 1
    for s in lead:
        B *= s

    def fold(x, L):
        x = x.reshape(B, L, num_heads, dh)
        return x.transpose(0, 2, 1, 3).reshape(B * num_heads, L, dh)

    qf, kf, vf = fold(q, Lq), fold(k, Lk), fold(v, Lk)
    if key_mask is not None:
        maskf = jnp.repeat(key_mask.reshape(B, Lk), num_heads, axis=0)
    else:
        maskf = None
    out = flash_attention(qf, kf, vf, maskf, scale=scale,
                          blk_q=blk_q, blk_k=blk_k, interpret=interpret)
    out = out.reshape(B, num_heads, Lq, dh).transpose(0, 2, 1, 3)
    return out.reshape(*lead, Lq, dim)


def _flash_gqa_causal_kernel(q_ref, k_ref, v_ref, len_ref, o_ref, *,
                             scale, blk_q, blk_k, s_pad, q_offset, group):
    """One (query-head, q-tile) of causal GQA prefill attention.

    Queries are the contiguous positions [q_offset, q_offset + Lq); the
    k-tile loop stops at the last tile any query in this tile may attend
    (future keys are never touched — per-chunk cost grows causally instead
    of with the full cache length)."""
    qi = pl.program_id(1)
    q = q_ref[0]                                        # [blk_q, dh]
    d = q.shape[1]
    length = len_ref[0, 0]

    limit = q_offset + (qi + 1) * blk_q                 # exclusive key bound
    num_k = pl.cdiv(jnp.minimum(limit, s_pad), blk_k)

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * blk_k, blk_k), :]
        v = v_ref[0, pl.ds(i * blk_k, blk_k), :]

        # bf16 operands + f32 accumulation (see _flash_kernel): f32 MXU
        # matmuls run at a fraction of the bf16 rate
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                       # [blk_q, blk_k]
        q_pos = (
            jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 0)
            + q_offset + qi * blk_q
        )
        k_pos = (
            jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 1)
            + i * blk_k
        )
        mask = (k_pos <= q_pos) & (k_pos < length)
        s = jnp.where(mask, s, NEG_INF)

        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, None])
        l_new = l_prev * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((blk_q, d), jnp.float32)
    m0 = jnp.full((blk_q,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((blk_q,), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, num_k, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)[:, None]).astype(o_ref.dtype)


def flash_gqa_causal(
    q: jnp.ndarray,          # [H, Lq, dh]   query heads
    k: jnp.ndarray,          # [Hkv, S, dh]  full KV cache keys
    v: jnp.ndarray,          # [Hkv, S, dh]
    q_offset: int,           # STATIC global position of q row 0
    length: jnp.ndarray,     # [] traced count of valid keys
    scale: Optional[float] = None,
    blk_q: int = 256,
    blk_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Causal grouped-query flash attention for chunked prefill.

    Query head h reads KV head h // (H // Hkv) straight from the cache
    layout via the BlockSpec index map — no materialized KV repeat, no
    [Lq, S] logit tensor (the XLA prefill path writes [H, Lq, S] f32
    logits per layer: 1.2 GB/layer at the 32-frame QA protocol).
    Returns [H, Lq, dh] in q.dtype."""
    H, Lq, dh = q.shape
    Hkv, S, _ = k.shape
    group = H // Hkv
    if scale is None:
        scale = dh**-0.5

    d_pad = _round_up(dh, 128)
    lq_pad = _round_up(Lq, blk_q)
    s_pad = _round_up(S, blk_k)

    qp = jnp.pad(q, ((0, 0), (0, lq_pad - Lq), (0, d_pad - dh)))
    kp = jnp.pad(k, ((0, 0), (0, s_pad - S), (0, d_pad - dh)))
    vp = jnp.pad(v, ((0, 0), (0, s_pad - S), (0, d_pad - dh)))
    len_arr = jnp.asarray(length, jnp.int32).reshape(1, 1)

    grid = (H, lq_pad // blk_q)
    kernel = functools.partial(
        _flash_gqa_causal_kernel, scale=scale, blk_q=blk_q, blk_k=blk_k,
        s_pad=s_pad, q_offset=q_offset, group=group,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk_q, d_pad), lambda h, i: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d_pad),
                         lambda h, i, g=group: (h // g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d_pad),
                         lambda h, i, g=group: (h // g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda h, i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, blk_q, d_pad), lambda h, i: (h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, lq_pad, d_pad), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, len_arr)
    return out[:, :Lq, :dh]
