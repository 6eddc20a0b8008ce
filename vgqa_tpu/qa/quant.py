"""Weight-only int8 quantization for the QA LLM.

InternVideo2.5-Chat-8B in bf16 is ~15 GB of weights — it does not fit a
single v5e's 16 GB HBM with activations and KV cache. Per-output-channel
int8 weight quantization (absmax / 127) stores the seven big projection
matrices per layer as int8 (+ one f32 scale row), halving weight memory;
matmuls upcast tile-wise (XLA fuses the convert into the operand load) and
apply the scale to the output, so quality loss is the usual <0.5% of
weight-only int8.

The reference has no quantization path (it shards the fp16 model across
GPUs with device_map="auto", /root/reference/vgqa/inference/qa.py:176-182);
this is the TPU-native single-chip serving answer.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

QUANT_TARGETS = (
    "q_proj", "k_proj", "v_proj", "o_proj",
    "gate_proj", "up_proj", "down_proj", "lm_head",
)


def quantize_llm_params(llm_params: Dict[str, Any]) -> Dict[str, Any]:
    """Replace each target Dense kernel [in, out] with
    {kernel_q int8 [in, out], scale f32 [out]}."""

    def quantize_kernel(kernel):
        absmax = jnp.max(jnp.abs(kernel), axis=0)  # per output channel
        scale = jnp.maximum(absmax, 1e-8) / 127.0
        q = jnp.clip(jnp.round(kernel / scale), -127, 127).astype(jnp.int8)
        return {"kernel_q": q, "scale": scale.astype(jnp.float32)}

    def walk(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                if k in QUANT_TARGETS and "kernel" in v:
                    out[k] = quantize_kernel(v["kernel"])
                else:
                    out[k] = walk(v)
            else:
                out[k] = v
        return out

    return walk(llm_params)


def quant_matmul(x: jnp.ndarray, qparams: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """x [..., in] @ dequant(kernel) -> [..., out]."""
    w = qparams["kernel_q"].astype(x.dtype)
    y = jnp.einsum("...i,io->...o", x, w, preferred_element_type=jnp.float32)
    return (y * qparams["scale"]).astype(x.dtype)


def quant_matmul_w8a8(
    x: jnp.ndarray, qparams: Dict[str, jnp.ndarray]
) -> jnp.ndarray:
    """W8A8: per-row dynamic int8 activations x int8 weights -> int32.

    Each activation row is absmax-quantized on the fly (one scale per
    token), the matmul runs with BOTH operands int8 accumulating int32 —
    on TPU this hits the MXU's int8 path at ~2x the bf16 macs — and the
    output is rescaled by (row_scale x per-channel weight scale).
    Worth it only for compute-bound prefill-sized L (serving decode with
    L=1 stays on the memory-bound bf16-activation path, which is exact in
    the activations)."""
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    x_scale = jnp.maximum(ax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x / x_scale.astype(x.dtype)),
                  -127, 127).astype(jnp.int8)
    y = jnp.einsum("...i,io->...o", xq, qparams["kernel_q"],
                   preferred_element_type=jnp.int32)
    return (
        y.astype(jnp.float32) * x_scale * qparams["scale"]
    ).astype(x.dtype)


def is_quantized(llm_params: Dict[str, Any]) -> bool:
    layer0 = llm_params.get("layer_0", {})
    q = layer0.get("q_proj", {})
    return "kernel_q" in q or "kernel_q4" in q


# -- int4 weight-only (group-wise) --------------------------------------------
#
# Decode on one v5e is HBM-bound: each token streams the full weight set
# (7.7 GB int8 for the 8B LLM) plus ~1.2 GB of KV at the 9216-token
# protocol, measured ~730 GB/s — near the chip's roofline. Halving weight
# bytes is the only decode lever left. int4 needs finer scales than int8's
# per-output-channel to hold quality: scales are per (input-group x output
# channel), group 128 along the contraction axis (GPTQ/AWQ-style RTN
# grouping). Two int4 values pack per int8 byte, split-half along the
# input axis (byte i holds rows i and i+in/2 — concat beats nibble
# interleave for XLA fusion). lm_head stays int8 by default (read once
# per token, logits are precision-sensitive).
#
# The reference has no quantization at all; this is net-new TPU serving
# capability, opt-in until real-weight accuracy is measured
# (tools/gate_w8a8.py --wq int4 reports the proxy logit error).

INT4_GROUP = 128
INT4_TARGETS = (
    "q_proj", "k_proj", "v_proj", "o_proj",
    "gate_proj", "up_proj", "down_proj",
)


def _int4_group(in_dim: int, group_size: int) -> int:
    g = min(group_size, in_dim)
    while in_dim % g:
        g //= 2
    return max(g, 1)


def quantize_kernel_int4(kernel: jnp.ndarray,
                         group_size: int = INT4_GROUP) -> Dict[str, jnp.ndarray]:
    """[in, out] kernel -> {kernel_q4 int8 [in/2, out], scale4 f32 [in/g, out]}."""
    inn, out = kernel.shape
    assert inn % 2 == 0, f"int4 packing needs an even input dim, got {inn}"
    g = _int4_group(inn, group_size)
    k = kernel.astype(jnp.float32).reshape(inn // g, g, out)
    absmax = jnp.max(jnp.abs(k), axis=1)                      # [n_g, out]
    scale = jnp.maximum(absmax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(k / scale[:, None, :]), -7, 7)
    q = q.astype(jnp.int8).reshape(inn, out)
    lo, hi = q[: inn // 2], q[inn // 2:]
    packed = jnp.bitwise_or(
        jnp.bitwise_and(lo, jnp.int8(0x0F)),
        jnp.left_shift(hi, 4).astype(jnp.int8),
    )
    return {"kernel_q4": packed, "scale4": scale.astype(jnp.float32)}


def dequantize_kernel_int4(qparams: Dict[str, jnp.ndarray],
                           dtype=jnp.float32) -> jnp.ndarray:
    """Exact inverse of the pack (up to the RTN rounding): [in, out]."""
    packed = qparams["kernel_q4"]
    scale = qparams["scale4"]
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)   # sign-extend low nibble
    hi = jnp.right_shift(packed, 4)                      # arithmetic: high nibble
    q = jnp.concatenate([lo, hi], axis=0)                # [in, out]
    inn, out = q.shape
    n_g = scale.shape[0]
    w = q.astype(dtype).reshape(n_g, inn // n_g, out)
    w = w * scale[:, None, :].astype(dtype)
    return w.reshape(inn, out)


def quant_matmul_int4(x: jnp.ndarray,
                      qparams: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """x [..., in] @ dequant4(kernel) -> [..., out].

    Computed as TWO half-matmuls (low nibbles x input rows [0, in/2),
    high nibbles x rows [in/2, in)) whose f32 partials add. The point is
    what ISN'T here: the naive ``concat(lo, hi)`` unpack materializes a
    full bf16 weight tensor — a concat cannot fuse into a dot operand —
    and in the chunked prefill XLA then CSE'd every layer's dequantized
    weights across all chunks, holding ~12.8 GB of temps live (measured
    OOM: 17.3 of 15.75 GB HBM, r5). Per half the chain is
    shift -> convert -> group-scale multiply (reshapes are bitcasts),
    the same elementwise form as the int8 path that XLA demonstrably
    fuses into the operand load; HBM reads only packed nibbles.
    Operands stay in x.dtype (bf16 on TPU) — the MXU runs at full bf16
    rate (forcing f32 operands measured at a fraction of it, CLAUDE.md).

    All three XLA-level expressions of this matmul are now chip-measured
    at the production geometry (BASELINE.md r5); this function keeps the
    best one — the half-matmul form — and int4 stays opt-in because even
    it LOSES to int8:

    1. ``concat(lo, hi)`` dequant then one dot: the concat cannot fuse
       into a dot operand, so XLA materializes every layer's bf16
       weights and CSEs them across prefill chunks — chunked prefill
       OOMs HBM outright (17.3 of 15.75 GB).
    2. THIS form — two half-matmuls (low nibbles x rows [0, in/2), high
       nibbles x rows [in/2, in)), group scales applied to the weight
       operand, f32 partials added: prefill healthy (7.3k tok/s), but
       decode measures 30 vs int8's 86 tok/s — contraction-axis group
       scales cannot commute through the dot like int8's per-output-
       channel scale, so each decode step still materializes ~13 GB of
       dequantized bf16 weights (~27 GB/token of traffic).
    3. Per-group partial dots with scales applied to the [.., n_g, out]
       partial sums (weight operand a bare int8->bf16 convert): WORSE
       everywhere — decode 14.3 tok/s, prefill 1.3k tok/s. The G
       batched [M, 128] x [128, N] dots run far below one large dot on
       the MXU, and the convert still materializes.

    Conclusion: group-wise int4 cannot beat int8 through XLA-expressible
    matmuls on this hardware; only a dedicated Pallas kernel that
    unpacks nibbles in VMEM while streaming packed weights could realize
    the 2x bandwidth saving.

    THE FIX is below the XLA level: on TPU (and under
    VGQA_PALLAS_INTERPRET for CPU parity tests), production-shaped
    matmuls route to the Pallas kernel (ops/pallas/int4_matmul.py) that
    streams the PACKED nibbles through VMEM, unpacks + scales
    in-register, and accumulates per-group MXU dots in f32 — HBM reads
    only K*N/2 bytes, the thing none of the XLA forms could achieve.

    Falls back to the explicit dequant when the group split straddles
    the pack halves (only possible at toy dims where in/2 % group != 0)."""
    import os as _os

    packed = qparams["kernel_q4"]          # [in/2, out] int8
    scale = qparams["scale4"]              # [n_g, out] f32
    half, out = packed.shape
    n_g = scale.shape[0]
    g = (half * 2) // n_g
    from ..ops.pallas.int4_matmul import (int4_matmul,
                                          int4_matmul_kernel_applicable)

    interp = _os.environ.get("VGQA_PALLAS_INTERPRET") == "1"
    m = 1
    for d in x.shape[:-1]:
        m *= int(d)
    if ((jax.default_backend() == "tpu" or interp)
            and _os.environ.get("VGQA_INT4_KERNEL", "1") != "0"
            and int4_matmul_kernel_applicable(m, half * 2, out, n_g)):
        return int4_matmul(x, packed, scale, interpret=interp)
    if n_g % 2 or half % g:
        w = dequantize_kernel_int4(qparams, dtype=x.dtype)
        y = jnp.einsum("...i,io->...o", x, w,
                       preferred_element_type=jnp.float32)
        return y.astype(x.dtype)
    n2 = n_g // 2
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)   # sign-extended
    hi = jnp.right_shift(packed, 4)                      # arithmetic shift

    def _half(q, s, xs):
        w = q.astype(x.dtype).reshape(n2, g, out) \
            * s[:, None, :].astype(x.dtype)
        return jnp.einsum("...i,io->...o", xs, w.reshape(half, out),
                          preferred_element_type=jnp.float32)

    y = _half(lo, scale[:n2], x[..., :half]) \
        + _half(hi, scale[n2:], x[..., half:])
    return y.astype(x.dtype)


def quantize_llm_params_int4(
    llm_params: Dict[str, Any],
    group_size: int = INT4_GROUP,
    targets=INT4_TARGETS,
    lm_head_int8: bool = True,
) -> Dict[str, Any]:
    """int4 (group-wise) for ``targets``; lm_head int8 per-channel unless
    ``lm_head_int8=False`` (then int4 too). Accepts a raw OR int8 tree —
    int8 entries in ``targets`` are NOT re-quantized (convert from raw)."""

    def walk(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                if k in targets and "kernel" in v:
                    out[k] = quantize_kernel_int4(v["kernel"], group_size)
                elif k == "lm_head" and "kernel" in v:
                    if lm_head_int8:
                        absmax = jnp.max(jnp.abs(v["kernel"]), axis=0)
                        scale = jnp.maximum(absmax, 1e-8) / 127.0
                        q = jnp.clip(jnp.round(v["kernel"] / scale),
                                     -127, 127).astype(jnp.int8)
                        out[k] = {"kernel_q": q,
                                  "scale": scale.astype(jnp.float32)}
                    else:
                        out[k] = quantize_kernel_int4(v["kernel"], group_size)
                else:
                    out[k] = walk(v)
            else:
                out[k] = v
        return out

    return walk(llm_params)


# -- SmoothQuant-style activation smoothing ----------------------------------
def collect_smooth_stats(raw_params: Dict[str, Any], cfg, token_ids,
                         dtype=jnp.float32) -> Dict[str, Any]:
    """Calibration pass: per-layer per-input-channel activation absmax.

    ``raw_params`` is the UNQUANTIZED llm tree (must also contain
    ``tok_embeddings`` for the embedding lookup, as converted trees do);
    ``token_ids`` [B, L] are calibration prompts (real prompt ids when
    available; random ids drawn from the vocab otherwise — the outlier
    channels live in the *weights/embeddings*, so they surface under any
    token distribution)."""
    import jax

    from .llm_functional import embed_tokens, llm_forward

    ids = jnp.asarray(token_ids)
    B, L = ids.shape
    embeds = embed_tokens(raw_params, cfg, ids).astype(dtype)
    pos = jnp.broadcast_to(jnp.arange(L)[None], (B, L))
    mask = jnp.broadcast_to(
        jnp.tril(jnp.ones((L, L), bool))[None], (B, L, L))

    def run(params, embeds):
        _, _, stats = llm_forward(
            params, cfg, embeds, pos, mask, collect_act_stats=True)
        return stats

    return jax.jit(run)(raw_params, embeds)


def _smooth_scales(act_max, weight_in_absmax, alpha=0.5,
                   lo=1e-2, hi=1e4):
    """Per-input-channel migration factor s = a^alpha / w^(1-alpha)."""
    a = jnp.maximum(act_max.astype(jnp.float32), 1e-5)
    w = jnp.maximum(weight_in_absmax.astype(jnp.float32), 1e-5)
    return jnp.clip(a ** alpha / w ** (1.0 - alpha), lo, hi)


def smooth_llm_params(raw_params: Dict[str, Any], cfg,
                      stats: Dict[str, Any], alpha: float = 0.5
                      ) -> Dict[str, Any]:
    """Migrate activation channel outliers into the weights — EXACT in
    real arithmetic, zero runtime cost (every divide folds into an
    existing static parameter):

    * qkv inputs:   attn_norm.scale /= s ; q/k/v kernel rows *= s
    * mlp inputs:   mlp_norm.scale  /= s ; gate/up kernel rows *= s
    * o_proj input (attention context): v_proj output columns /= s ;
      o_proj rows *= s. The context channel (head h, dim d) is fed by
      v column (kv_head h//group, d), shared across the head group, so s
      is reduced per (kv_head, d) with a max over the group's heads.
      Values enter attention linearly (softmax weights are unscaled), so
      the fold is exact.
    * down_proj input: up_proj output columns /= s ; down_proj rows *= s
      (silu(gate) is untouched; m = silu(g) * u scales linearly in u).

    After folding, per-token absmax activation quantization (W8A8
    prefill) no longer sees the raw outlier channels. Apply BEFORE
    quantize_llm_params. Returns a new raw tree."""
    out = {k: (dict(v) if isinstance(v, dict) else v)
           for k, v in raw_params.items()}
    group = cfg.num_heads // cfg.num_kv_heads
    hd = cfg.head_dim

    for i in range(cfg.num_layers):
        p = dict(raw_params[f"layer_{i}"])
        st = stats[f"layer_{i}"]

        def rows_absmax(kernels):
            return jnp.max(
                jnp.stack([jnp.max(jnp.abs(k), axis=1) for k in kernels]),
                axis=0,
            )

        def upd(name, **changes):
            p[name] = {**p[name], **changes}

        # qkv group (shared input = post attn_norm)
        wk = [p[n]["kernel"] for n in ("q_proj", "k_proj", "v_proj")]
        s1 = _smooth_scales(st["qkv_in"], rows_absmax(wk), alpha)
        upd("attn_norm", scale=p["attn_norm"]["scale"] / s1)
        for n in ("q_proj", "k_proj", "v_proj"):
            upd(n, kernel=p[n]["kernel"] * s1[:, None])

        # mlp group (shared input = post mlp_norm)
        wk = [p[n]["kernel"] for n in ("gate_proj", "up_proj")]
        s2 = _smooth_scales(st["mlp_in"], rows_absmax(wk), alpha)
        upd("mlp_norm", scale=p["mlp_norm"]["scale"] / s2)
        for n in ("gate_proj", "up_proj"):
            upd(n, kernel=p[n]["kernel"] * s2[:, None])

        # o_proj input (ctx [H*hd]) -> per (kv_head, d), max over the group
        a_ctx = st["o_in"].reshape(cfg.num_kv_heads, group, hd).max(axis=1)
        w_o = jnp.abs(p["o_proj"]["kernel"]).max(axis=1)        # [H*hd]
        w_o = w_o.reshape(cfg.num_kv_heads, group, hd).max(axis=1)
        s3 = _smooth_scales(a_ctx, w_o, alpha)                  # [KVH, hd]
        v_scale = s3.reshape(-1)                                # v columns
        upd("v_proj", kernel=p["v_proj"]["kernel"] / v_scale[None, :])
        o_rows = jnp.repeat(s3[:, None, :], group, axis=1).reshape(-1)
        upd("o_proj", kernel=p["o_proj"]["kernel"] * o_rows[:, None])

        # down_proj input (m [I]) -> fold into up_proj output columns
        w_d = jnp.abs(p["down_proj"]["kernel"]).max(axis=1)
        s4 = _smooth_scales(st["down_in"], w_d, alpha)
        upd("up_proj", kernel=p["up_proj"]["kernel"] / s4[None, :])
        upd("down_proj", kernel=p["down_proj"]["kernel"] * s4[:, None])

        out[f"layer_{i}"] = p
    return out
