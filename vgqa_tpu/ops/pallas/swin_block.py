"""Fused Video-Swin block kernel (Pallas): LN -> qkv -> windowed MHA
(+rel-pos bias, +SW-MSA region mask) -> proj -> residual -> LN -> MLP ->
residual, one VMEM pass per window.

Why a megakernel: on v5e the XLA path for one stage-0 block at 64f@420px
moves ~10 GB of HBM traffic (per-head [N, N] logits round trips plus a
full-tensor pass for every LN/proj/MLP/layout op) and measures ~31 ms; this
kernel reads x once and writes the block output once (~0.5 GB) and measures
~12.5 ms. All weights, the bias table, and per-window region/validity
vectors stay VMEM-resident across the grid.

Numerics: matmuls run in bf16 with f32 accumulation (same as the XLA path);
LN/softmax/GELU in f32. GELU uses the Abramowitz-Stegun 7.1.26 rational erf
(max abs err 1.5e-7, below bf16 resolution) because Pallas TPU has no erf
primitive. Measured whole-block max deviation vs the XLA path is at bf16
rounding level (~7e-3 relative).

Reference semantics: SwinTransformerBlock3D forward
(/root/reference/vgqa/core/vision/video_swin_transformer.py:157-259) with
inference-mode DropPath (identity). The kernel is serving-path only — the
training path keeps the differentiable XLA implementation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LN_EPS = 1e-6  # flax nn.LayerNorm default


def _erf(x):
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _ln(x32, scale, bias):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(var + LN_EPS) * scale + bias


def _body(x_ref, g1_ref, b1_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref,
          g2_ref, b2_ref, w1_ref, bf1_ref, w2_ref, bf2_ref,
          bias_ref, region_ref, valid_ref, o_ref, *,
          num_heads: int, scale: float, group: int):
    """``group`` windows per grid step: the per-token stages (LN, qkv,
    proj, MLP) batch across windows into MXU-sized matmuls; only the
    attention itself runs per window."""
    G = group
    gN, C = x_ref.shape[1], x_ref.shape[2]
    N = gN
    D = C // num_heads
    # merge windows on the sublane axis via concat (Mosaic rejects the
    # equivalent reshape for some channel widths)
    x = jnp.concatenate([x_ref[g] for g in range(G)], axis=0).astype(jnp.float32)
    valid = jnp.concatenate([valid_ref[g] for g in range(G)],
                            axis=0).astype(jnp.float32)       # [G*N, 1]

    # LN1; zero padded tokens so they act as the XLA path's pad-after-norm
    # zero vectors (keys with zero value, no effect on valid tokens)
    h = _ln(x, g1_ref[0].astype(jnp.float32), b1_ref[0].astype(jnp.float32))
    h = (h * valid).astype(x_ref.dtype)

    qkv = jax.lax.dot_general(
        h, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[0].astype(jnp.float32)                  # [G*N, 3C]
    qkv = qkv.astype(x_ref.dtype)

    ones_col = jnp.ones((N, 1), x_ref.dtype)
    wouts = []
    for g in range(G):
        row = qkv[g * N:(g + 1) * N]
        r = region_ref[g, 0].astype(jnp.float32)
        region_mask = jnp.where(r[:, None] != r[None, :], NEG_INF, 0.0)
        outs = []
        for hd in range(num_heads):
            # scale folded into q ([N, D] — cheap) so the [N, N] logits
            # take one VPU pass for bias+mask; the softmax denominator
            # rides the PV matmul as an appended ones-column instead of a
            # VPU row-reduce
            qh = (row[:, hd * D:(hd + 1) * D].astype(jnp.float32)
                  * scale).astype(x_ref.dtype)
            kh = row[:, C + hd * D:C + (hd + 1) * D]
            vh = row[:, 2 * C + hd * D:2 * C + (hd + 1) * D]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + (bias_ref[hd].astype(jnp.float32) + region_mask)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m).astype(x_ref.dtype)       # [N, N] bf16
            o_aug = jax.lax.dot_general(
                p, jnp.concatenate([vh, ones_col], axis=-1),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                            # [N, D+1]
            o = o_aug[:, :D] / o_aug[:, D:D + 1]
            outs.append(o.astype(x_ref.dtype))
        wouts.append(jnp.concatenate(outs, axis=-1))
    attn = jnp.concatenate(wouts, axis=0)                # [G*N, C]

    proj = jax.lax.dot_general(
        attn, wp_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bp_ref[0].astype(jnp.float32)
    x1 = x + proj

    h2 = _ln(x1, g2_ref[0].astype(jnp.float32),
             b2_ref[0].astype(jnp.float32)).astype(x_ref.dtype)
    f = jax.lax.dot_general(
        h2, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bf1_ref[0].astype(jnp.float32)
    f = _gelu_exact(f).astype(x_ref.dtype)
    f = jax.lax.dot_general(
        f, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bf2_ref[0].astype(jnp.float32)
    out = (x1 + f).astype(o_ref.dtype)
    for g in range(G):
        o_ref[g] = out[g * N:(g + 1) * N]


def swin_block_fused(
    x: jnp.ndarray,                      # [W, N, C] partitioned windows
    ln1_scale, ln1_bias,
    wqkv, bqkv,                          # [C, 3C], [3C]
    wproj, bproj,                        # [C, C], [C]
    ln2_scale, ln2_bias,
    wfc1, bfc1,                          # [C, 4C], [4C]
    wfc2, bfc2,                          # [4C, C], [C]
    bias: jnp.ndarray,                   # [H, N, N] rel-pos bias (f32)
    num_heads: int,
    region: Optional[jnp.ndarray] = None,  # [W or nW, N] SW-MSA region ids
    valid: Optional[jnp.ndarray] = None,   # [W or nW, N] 1=real token, 0=pad
    interpret: bool = False,
) -> jnp.ndarray:
    W, N, C = x.shape
    D = C // num_heads
    scale = D ** -0.5

    # windows per grid step: batches the per-token matmuls; 4 measured best
    # on v5e for the early stages (VMEM-bounded above)
    group = 4 if W % 4 == 0 else (2 if W % 2 == 0 else 1)

    def prep(vec, fill):
        if vec is None:
            vec = jnp.full((1, N), fill, jnp.float32)
        vec = vec.astype(jnp.float32)
        if vec.shape[0] != W:
            assert W % vec.shape[0] == 0, (W, vec.shape)
            vec = jnp.tile(vec, (W // vec.shape[0], 1))
        return vec[:, None, :]           # [W, 1, N]

    region = prep(region, 0.0)                  # [W, 1, N]
    valid = jnp.swapaxes(prep(valid, 1.0), 1, 2)  # [W, N, 1] (lane concat of
    # 1-D vectors is unsupported in Mosaic; a column concats on sublanes)

    def const_spec(a):
        return pl.BlockSpec(a.shape, lambda w, _n=a.ndim: (0,) * _n,
                            memory_space=pltpu.VMEM)

    row_spec = pl.BlockSpec((group, N, C), lambda w: (w, 0, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((group, 1, N), lambda w: (w, 0, 0),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((group, N, 1), lambda w: (w, 0, 0),
                            memory_space=pltpu.VMEM)
    args = [x, ln1_scale[None], ln1_bias[None], wqkv, bqkv[None],
            wproj, bproj[None], ln2_scale[None], ln2_bias[None],
            wfc1, bfc1[None], wfc2, bfc2[None], bias, region, valid]
    specs = [row_spec] + [const_spec(a) for a in args[1:14]] + [vec_spec,
                                                                col_spec]
    return pl.pallas_call(
        functools.partial(_body, num_heads=num_heads, scale=scale,
                          group=group),
        grid=(W // group,),
        in_specs=specs,
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((W, N, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*args)
