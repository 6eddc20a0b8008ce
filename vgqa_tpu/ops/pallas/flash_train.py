"""Differentiable fused attention for the TRAINING path (Pallas, TPU).

The serving encoder already runs a fused Pallas attention
(ops/pallas/window_attention.py, inference-only: no VJP, no dropout). In
training, the cross-modal encoder's self-attention fell back to the XLA
einsum path (ops/attention.py), whose backward materializes the
[V*T, H, S, S] probability tensor in HBM — at the production config
(64 frames @420px: S=418, V*T*H=512) the r4 train-step profile attributes
~50 ms/step to these attention fusions, dominated by probability-matrix
HBM traffic rather than MXU work.

This module provides a custom-VJP flash attention whose backward
*recomputes* the probabilities from (q, k, lse) instead of storing them:

* one program per folded (video*frame*head) batch row, full-S block —
  S pads to <=512 at every shipped config, so q/k/v/s all fit VMEM and
  no online-softmax k-loop is needed (simpler than the serving kernels);
* attention-probability dropout (torch nn.MultiheadAttention semantics,
  reference modal_encoder.py:153) runs IN-KERNEL from the TPU hardware
  PRNG: the backward re-seeds with the same per-row seed and regenerates
  the identical keep mask, so no [S, S] dropout mask ever touches HBM;
* matmul operands stay in the input dtype (bf16) with f32 accumulation,
  matching the XLA path's numerics contract (ops/attention.py:80-86).

Reference hot loop: /root/reference/vgqa/core/decoder/modal_encoder.py
:143-178 (per-frame TransformerEncoderLayer over ResNet|text|Swin tokens).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
# full-S blocks: [S, S] f32 scratch x ~5 must fit scoped VMEM
MAX_SEQ_PAD = 1024


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _keep_mask(seed, shape, rate: float, interpret: bool):
    """Deterministic [*shape] keep mask, regenerated identically in the
    backward kernel by re-seeding with the same value.

    TPU path: hardware PRNG (pltpu.prng_*). Interpret (CPU test) path:
    threefry via jax.random — prng_seed has no CPU lowering, and in
    interpret mode the kernel body is plain traced JAX anyway. The int32
    bits are logically shifted to 24 uniform bits (arithmetic-shift sign
    replication would bias the comparison)."""
    if interpret:
        bits = jax.random.bits(
            jax.random.PRNGKey(seed), shape, jnp.uint32
        ).astype(jnp.int32)
    else:
        pltpu.prng_seed(seed)
        bits = pltpu.prng_random_bits(shape)  # int32
    u = jax.lax.shift_right_logical(bits, 8).astype(jnp.float32)
    return u * (1.0 / (1 << 24)) >= rate


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, seed_ref, o_ref, lse_ref, *,
                scale, rate, interpret):
    q = q_ref[0]                                      # [Sq, d]
    k = k_ref[0]                                      # [Sk, d]
    v = v_ref[0]
    mask = mask_ref[0, 0]                             # [Sk]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * scale                                         # [Sq, Sk] f32
    s = jnp.where(mask[None, :], s, NEG_INF)
    m = jnp.max(s, axis=-1)
    p = jnp.exp(s - m[:, None])
    l = jnp.sum(p, axis=-1)
    lse_ref[0, 0] = m + jnp.log(l)
    if rate > 0.0:
        keep = _keep_mask(seed_ref[0, 0] + pl.program_id(0), p.shape, rate,
                          interpret)
        p = jnp.where(keep, p, 0.0) * (1.0 / (1.0 - rate))
    acc = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)[:, None]).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, mask_ref,
                seed_ref, dq_ref, dk_ref, dv_ref, *, scale, rate, interpret):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    o = o_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0]                               # [Sq] f32
    mask = mask_ref[0, 0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * scale
    s = jnp.where(mask[None, :], s, NEG_INF)
    p = jnp.exp(s - lse[:, None])                     # normalized probs, f32

    # dL/dP with the dropout mask folded in (W = keep*P/(1-rate); out = W@V)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )                                                 # [Sq, Sk]
    pw = p
    if rate > 0.0:
        keep = _keep_mask(seed_ref[0, 0] + pl.program_id(0), p.shape, rate,
                          interpret)
        inv = 1.0 / (1.0 - rate)
        dp = jnp.where(keep, dp, 0.0) * inv
        pw = jnp.where(keep, p, 0.0) * inv
    # softmax VJP: rowsum(P o dP) telescopes to dO . O (delta)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    ds = (p * (dp - delta[:, None]) * scale).astype(q.dtype)  # [Sq, Sk]

    dv_ref[0] = jax.lax.dot_general(
        pw.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    dq_ref[0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(dk_ref.dtype)


def _pad_inputs(q, k, v, key_mask):
    B, Lq, D = q.shape
    Lk = k.shape[1]
    d_pad = _round_up(D, 128)
    lq_pad = _round_up(Lq, 128)
    lk_pad = _round_up(Lk, 128)
    qp = jnp.pad(q, ((0, 0), (0, lq_pad - Lq), (0, d_pad - D)))
    kp = jnp.pad(k, ((0, 0), (0, lk_pad - Lk), (0, d_pad - D)))
    vp = jnp.pad(v, ((0, 0), (0, lk_pad - Lk), (0, d_pad - D)))
    if key_mask is None:
        key_mask = jnp.ones((B, Lk), bool)
    maskp = jnp.pad(key_mask, ((0, 0), (0, lk_pad - Lk)))[:, None, :]
    return qp, kp, vp, maskp, d_pad, lq_pad, lk_pad


def _full_specs(d_pad, lq_pad, lk_pad):
    """Per-row full-S blocks; grid is (B,)."""
    row = lambda shape: pl.BlockSpec(shape, lambda b: (b,) + (0,) * (len(shape) - 1),
                                     memory_space=pltpu.VMEM)
    return {
        "q": row((1, lq_pad, d_pad)),
        "kv": row((1, lk_pad, d_pad)),
        "mask": row((1, 1, lk_pad)),
        # [B, 1, Sq] — a 2-D (1, Sq) block would violate the TPU rule that
        # the sublane block dim divide 8 or equal the array dim
        "lse": row((1, 1, lq_pad)),
        "seed": pl.BlockSpec((1, 1), lambda b: (0, 0),
                             memory_space=pltpu.SMEM),
    }


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _flash_train(q, k, v, key_mask, seed, rate, scale, interpret):
    out, _ = _flash_train_fwd(q, k, v, key_mask, seed, rate, scale, interpret)
    return out


def _flash_train_fwd(q, k, v, key_mask, seed, rate, scale, interpret):
    B, Lq, D = q.shape
    qp, kp, vp, maskp, d_pad, lq_pad, lk_pad = _pad_inputs(q, k, v, key_mask)
    sp = _full_specs(d_pad, lq_pad, lk_pad)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, rate=rate, interpret=interpret),
        grid=(B,),
        in_specs=[sp["q"], sp["kv"], sp["kv"], sp["mask"], sp["seed"]],
        out_specs=[sp["q"], sp["lse"]],
        out_shape=[
            jax.ShapeDtypeStruct((B, lq_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((B, 1, lq_pad), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, maskp, seed_arr)
    return out[:, :Lq, :D], (q, k, v, key_mask, seed_arr, out, lse)


def _flash_train_bwd(rate, scale, interpret, res, g):
    q, k, v, key_mask, seed_arr, out_pad, lse = res
    B, Lq, D = q.shape
    Lk = k.shape[1]
    qp, kp, vp, maskp, d_pad, lq_pad, lk_pad = _pad_inputs(q, k, v, key_mask)
    gp = jnp.pad(g, ((0, 0), (0, lq_pad - Lq), (0, d_pad - D)))
    sp = _full_specs(d_pad, lq_pad, lk_pad)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, rate=rate, interpret=interpret),
        grid=(B,),
        in_specs=[sp["q"], sp["kv"], sp["kv"], sp["q"], sp["q"], sp["lse"],
                  sp["mask"], sp["seed"]],
        out_specs=[sp["q"], sp["kv"], sp["kv"]],
        out_shape=[
            jax.ShapeDtypeStruct((B, lq_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((B, lk_pad, d_pad), k.dtype),
            jax.ShapeDtypeStruct((B, lk_pad, d_pad), v.dtype),
        ],
        interpret=interpret,
    )(qp, kp, vp, out_pad, gp, lse, maskp, seed_arr)
    zero_mask = np.zeros(key_mask.shape, jax.dtypes.float0)
    zero_seed = np.zeros((), jax.dtypes.float0)  # primal seed is scalar
    return (dq[:, :Lq, :D], dk[:, :Lk, :D], dv[:, :Lk, :D],
            zero_mask, zero_seed)


_flash_train.defvjp(_flash_train_fwd, _flash_train_bwd)


def flash_mha_train(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    key_mask: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    seed=0,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable drop-in for dot_product_attention (+prob dropout).

    q [..., Lq, H*Dh], k/v [..., Lk, H*Dh], key_mask [..., Lk] True=attend;
    ``seed`` is a traced int32 scalar — derive it from the 'dropout' PRNG
    stream per call site so different layers/steps decorrelate. Heads fold
    into the kernel's batch axis (each gets a distinct PRNG stream via
    program_id).
    """
    *lead, Lq, dim = q.shape
    Lk = k.shape[-2]
    dh = dim // num_heads
    if scale is None:
        scale = dh ** -0.5
    B = int(np.prod(lead)) if lead else 1

    def fold(x, L):
        x = x.reshape(B, L, num_heads, dh)
        return x.transpose(0, 2, 1, 3).reshape(B * num_heads, L, dh)

    qf, kf, vf = fold(q, Lq), fold(k, Lk), fold(v, Lk)
    if key_mask is not None:
        maskf = jnp.repeat(
            jnp.broadcast_to(key_mask, (*lead, Lk)).reshape(B, Lk),
            num_heads, axis=0,
        )
    else:
        maskf = jnp.ones((B * num_heads, Lk), bool)
    seed = jnp.asarray(seed, jnp.int32)
    out = _flash_train(qf, kf, vf, maskf, seed, float(dropout_rate),
                       float(scale), interpret)
    out = out.reshape(B, num_heads, Lq, dh).transpose(0, 2, 1, 3)
    return out.reshape(*lead, Lq, dim)


def supported_seq(Lq: int, Lk: int) -> bool:
    """Whether the full-S single-block form fits scoped VMEM."""
    return _round_up(Lq, 128) <= MAX_SEQ_PAD and _round_up(Lk, 128) <= MAX_SEQ_PAD
