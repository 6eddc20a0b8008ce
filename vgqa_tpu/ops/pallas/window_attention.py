"""Fused windowed / per-frame multi-head attention kernel (Pallas).

Computes one window's (or one frame's) attention for ALL heads inside VMEM
— nothing quadratic reaches HBM. Used standalone by the cross-modal
encoder's per-frame self-attention (S=418 tokens at 420px — the XLA path
materializes [V*T, H, S, S] logits, ~1.4 ms/pass just for the max-reduce);
the Video Swin tower uses the fuller block megakernel in ``swin_block.py``.

Layout: q/k/v [W, N, C] with heads packed in C (the natural projection
output — no head transpose, no N/D padding; Mosaic masks internal lane
padding in reductions). Optional extras, all VMEM-resident or per-window
vectors:

* ``bias`` [H, N, N] additive (rel-pos bias), constant index map;
* ``region`` [W or nW, N] int ids — pairwise (r_i != r_j) -> -inf (SW-MSA);
* ``key_valid`` [W or nW, N] — column mask: every query may only attend
  keys with key_valid > 0 (padding mask semantics).

Matmuls run in the input dtype with f32 accumulation; the softmax
denominator rides the PV matmul as an appended ones-column.

Reference semantics: WindowAttention3D + compute_mask
(/root/reference/vgqa/core/vision/video_swin_transformer.py:70-155,302-315)
and the masked softmax of multi_head_attention_forward
(/root/reference/vgqa/core/decoder/attention.py:116-260).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _body(refs, o_ref, *, num_heads: int, scale: float,
          has_bias: bool, has_region: bool, has_key_valid: bool):
    it = iter(refs)
    q_ref, k_ref, v_ref = next(it), next(it), next(it)
    bias_ref = next(it) if has_bias else None
    region_ref = next(it) if has_region else None
    kvalid_ref = next(it) if has_key_valid else None

    mask = None
    if has_region:
        r = region_ref[0, 0].astype(jnp.float32)         # [N]
        mask = jnp.where(r[:, None] != r[None, :], NEG_INF, 0.0)
    if has_key_valid:
        kv = kvalid_ref[0, 0].astype(jnp.float32)        # [N]
        col = jnp.where(kv[None, :] > 0, 0.0, NEG_INF)
        mask = col if mask is None else mask + col

    N, C = q_ref.shape[1], q_ref.shape[2]
    D = C // num_heads
    ones_col = jnp.ones((N, 1), q_ref.dtype)
    for h in range(num_heads):                           # unrolled
        sl = slice(h * D, (h + 1) * D)
        qh = (q_ref[0, :, sl].astype(jnp.float32) * scale).astype(q_ref.dtype)
        kh = k_ref[0, :, sl]
        vh = v_ref[0, :, sl]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # [N, N]
        if has_bias:
            s = s + bias_ref[h].astype(jnp.float32)
        if mask is not None:
            s = s + mask
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m).astype(q_ref.dtype)
        o_aug = jax.lax.dot_general(
            p, jnp.concatenate([vh, ones_col], axis=-1),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # [N, D+1]
        o = o_aug[:, :D] / o_aug[:, D:D + 1]
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


def window_attention(
    q: jnp.ndarray,                        # [W, N, C] heads packed in C
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,    # [H, N, N]
    region: Optional[jnp.ndarray] = None,  # [nW, N] int region ids (SW-MSA)
    key_valid: Optional[jnp.ndarray] = None,  # [nW, N] >0 = attendable key
    num_heads: int = 1,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Multi-head window attention, one fused VMEM pass per window.

    ``region``/``key_valid`` may cover fewer windows than ``q`` when the
    per-window pattern repeats across a leading batch; they are tiled up to
    W rows (Pallas index maps must stay affine — no modulo wrap)."""
    W, N, C = q.shape
    assert C % num_heads == 0, (C, num_heads)
    if scale is None:
        scale = (C // num_heads) ** -0.5

    def prep(vec):
        vec = vec.astype(jnp.float32)
        if vec.shape[0] != W:
            assert W % vec.shape[0] == 0, (W, vec.shape)
            vec = jnp.tile(vec, (W // vec.shape[0], 1))
        return vec[:, None, :]             # [W, 1, N]

    qkv_spec = pl.BlockSpec((1, N, C), lambda w: (w, 0, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, 1, N), lambda w: (w, 0, 0),
                            memory_space=pltpu.VMEM)
    args = [q, k, v]
    specs = [qkv_spec, qkv_spec, qkv_spec]
    if bias is not None:
        assert bias.shape[0] == num_heads, (bias.shape, num_heads)
        args.append(bias)
        specs.append(pl.BlockSpec(bias.shape, lambda w: (0, 0, 0),
                                  memory_space=pltpu.VMEM))
    if region is not None:
        args.append(prep(region))
        specs.append(vec_spec)
    if key_valid is not None:
        args.append(prep(key_valid))
        specs.append(vec_spec)

    kernel = functools.partial(
        lambda *refs, **kw: _body(refs[:-1], refs[-1], **kw),
        num_heads=num_heads,
        scale=scale,
        has_bias=bias is not None,
        has_region=region is not None,
        has_key_valid=key_valid is not None,
    )
    return pl.pallas_call(
        kernel,
        grid=(W,),
        in_specs=specs,
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((W, N, C), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*args)
