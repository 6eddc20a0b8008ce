"""Fused 3D window attention kernel (Pallas) — the Video Swin hot op.

Profiling on v5e showed Video Swin consuming ~80% of the grounding forward
(BASELINE.md): the einsum path materializes the [nW, H, N, N] float32
attention logits in HBM (~1 GB per early block at 64f/224px). This kernel
computes one (window, head) attention tile entirely in VMEM — scores +
relative-position bias + shift mask + softmax + weighted sum — so nothing
quadratic ever touches HBM.

Shapes: q/k/v [W, H, N, D], bias [H, N, N] (relative-position bias),
mask [W, N, N] additive or None (SW-MSA region mask). N and D are padded to
lane width in the wrapper; padded key columns are masked with -inf.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel_with_mask(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *, scale):
    _window_attention_body(
        q_ref, k_ref, v_ref, bias_ref[0], mask_ref[0], o_ref, scale
    )


def _kernel_no_mask(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    _window_attention_body(q_ref, k_ref, v_ref, bias_ref[0], None, o_ref, scale)


def _window_attention_body(q_ref, k_ref, v_ref, bias, mask, o_ref, scale):
    q = q_ref[0, 0].astype(jnp.float32) * scale          # [N, D]
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                    # [N, N]
    s = s + bias.astype(jnp.float32)
    if mask is not None:
        s = s + mask.astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def window_attention(
    q: jnp.ndarray,                      # [W, H, N, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,                   # [H, N, N]
    mask: Optional[jnp.ndarray] = None,  # [W, N, N] additive
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    W, H, N, D = q.shape
    if scale is None:
        scale = D**-0.5

    n_pad = _round_up(N, 128)
    d_pad = _round_up(D, 128)
    pad_nd = ((0, 0), (0, 0), (0, n_pad - N), (0, d_pad - D))
    qp = jnp.pad(q, pad_nd)
    kp = jnp.pad(k, pad_nd)
    vp = jnp.pad(v, pad_nd)
    if n_pad != N:
        # padded query rows get 0 bias; padded KEY columns get -inf so they
        # never receive weight
        bias_p = jnp.pad(bias, ((0, 0), (0, n_pad - N), (0, 0)))
        fill = jnp.full((H, n_pad, n_pad - N), NEG_INF, bias.dtype)
        bias_p = jnp.concatenate([bias_p, fill], axis=-1)
        if mask is not None:
            mask = jnp.pad(mask, ((0, 0), (0, n_pad - N), (0, n_pad - N)))
    else:
        bias_p = bias

    grid = (W, H)
    q_spec = pl.BlockSpec(
        (1, 1, n_pad, d_pad), lambda w, h: (w, h, 0, 0),
        memory_space=pltpu.VMEM,
    )
    bias_spec = pl.BlockSpec(
        (1, n_pad, n_pad), lambda w, h: (h, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((W, H, n_pad, d_pad), q.dtype)

    if mask is not None:
        mask_spec = pl.BlockSpec(
            (1, n_pad, n_pad), lambda w, h: (w, 0, 0), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            functools.partial(_kernel_with_mask, scale=scale),
            grid=grid,
            in_specs=[q_spec, q_spec, q_spec, bias_spec, mask_spec],
            out_specs=q_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(qp, kp, vp, bias_p, mask)
    else:
        out = pl.pallas_call(
            functools.partial(_kernel_no_mask, scale=scale),
            grid=grid,
            in_specs=[q_spec, q_spec, q_spec, bias_spec],
            out_specs=q_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(qp, kp, vp, bias_p)
    return out[:, :, :N, :D]
