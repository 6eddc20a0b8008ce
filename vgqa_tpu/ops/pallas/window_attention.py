"""Fused 3D window attention kernel (Pallas) — the Video Swin hot op.

The XLA einsum path materializes per-head [nW, H, N, N] attention logits in
HBM and re-reads them across softmax passes — ~35 GB of traffic per 64f@420px
forward, which makes Video Swin ~70% of the grounding step. This kernel
computes one window's attention for ALL heads inside VMEM, so nothing
quadratic ever reaches HBM.

Design (v2, measured on v5e):
* grid = (num_windows,) — one step per window; the head loop is unrolled
  in-kernel. Heads stay packed in the channel dim ([W, N, C], the natural
  output layout of the qkv projection), so the wrapper needs **no
  head transpose and no N/D padding**: N=392 is a sublane multiple and
  Mosaic masks internal lane padding in reductions.
* the relative-position bias [H, N, N] uses a constant index map — it is
  DMA'd once and stays VMEM-resident for the whole grid.
* the SW-MSA shift mask is never materialized: the kernel receives per-window
  region ids [W, N] (few KB) and rebuilds the (r_i != r_j) -> -inf mask with
  one vector compare per window. The caller passes ids for the window's
  spatial pattern; for batch > 1 the index map wraps modulo nW.

Reference semantics: WindowAttention3D + compute_mask
(/root/reference/vgqa/core/vision/video_swin_transformer.py:70-155,302-315).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _body(q_ref, k_ref, v_ref, bias_ref, region_ref, o_ref, *,
          num_heads: int, scale: float):
    region_mask = None
    if region_ref is not None:
        r = region_ref[0, 0].astype(jnp.float32)         # [N]
        region_mask = jnp.where(
            r[:, None] != r[None, :], NEG_INF, 0.0
        )                                                # [N, N]
    n, c = q_ref.shape[1], q_ref.shape[2]
    d = c // num_heads
    for h in range(num_heads):                           # unrolled
        sl = slice(h * d, (h + 1) * d)
        qh = q_ref[0, :, sl].astype(jnp.float32) * scale  # [N, D]
        kh = k_ref[0, :, sl].astype(jnp.float32)
        vh = v_ref[0, :, sl].astype(jnp.float32)
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # [N, N]
        s = s + bias_ref[h].astype(jnp.float32)
        if region_mask is not None:
            s = s + region_mask
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p, vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # [N, D]
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


def window_attention(
    q: jnp.ndarray,                        # [W, N, C] heads packed in C
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,                     # [H, N, N] rel-pos bias
    region: Optional[jnp.ndarray] = None,  # [nW, N] int32 region ids (SW-MSA)
    num_heads: int = 1,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Multi-head window attention, one fused VMEM pass per window.

    ``region`` may cover fewer windows than ``q`` (the per-batch spatial
    pattern repeats); it is tiled up to W rows (a few MB of int32 — Pallas
    index maps must stay affine, so no modulo wrap in the spec)."""
    W, N, C = q.shape
    H = bias.shape[0]
    assert H == num_heads and C % num_heads == 0, (bias.shape, num_heads, C)
    if scale is None:
        scale = (C // num_heads) ** -0.5

    grid = (W,)
    qkv_spec = pl.BlockSpec((1, N, C), lambda w: (w, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((H, N, N), lambda w: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((W, N, C), q.dtype)

    if region is not None:
        nW = region.shape[0]
        if nW != W:
            assert W % nW == 0, (W, nW)
            region = jnp.tile(region, (W // nW, 1))
        # sublane-dim block sizes must divide 8 or span the array: carry a
        # singleton sublane axis so the last two dims are (1==full, N==full)
        region = region[:, None, :]
        region_spec = pl.BlockSpec((1, 1, N), lambda w: (w, 0, 0),
                                   memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_body, num_heads=num_heads, scale=scale),
            grid=grid,
            in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, region_spec],
            out_specs=qkv_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(q, k, v, bias, region)

    kernel = functools.partial(
        lambda q_ref, k_ref, v_ref, bias_ref, o_ref, **kw: _body(
            q_ref, k_ref, v_ref, bias_ref, None, o_ref, **kw
        ),
        num_heads=num_heads,
        scale=scale,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
        out_specs=qkv_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(q, k, v, bias)
