"""Accuracy gate for the W8A8 prefill path.

The W8A8 prefill (quant.quant_matmul_w8a8: per-token dynamic int8
activations x per-channel int8 weights on the MXU's double-rate path)
measured 1.36x over bf16-activation prefill on TPU (BASELINE.md r3). A
measured win is only shippable behind an accuracy gate; real
InternVideo2.5 weights cannot exist in this environment (no network), so
the gate runs the strongest proxy available:

* **production geometry** — hidden 4096, GQA 32 query / 8 kv heads,
  SwiGLU 14336, the exact shapes the serving engine quantizes,
* **outlier-realistic weights** — real LLM residual streams carry a few
  persistent high-magnitude channels (the reason SmoothQuant exists);
  the builder plants heavy-tailed per-channel scales in the embedding
  (lognormal body + forced 30-80x outlier channels) and lognormal
  per-output-channel weight scales, so post-RMSNorm activations show the
  exact failure mode per-token absmax quantization is vulnerable to,
* **calibrated criteria** — a MEASURED finding (2026-08-19, this
  repo): on a random-weight model, free-running greedy decode is
  chaotic under ANY numeric perturbation — the pure-precision noise
  floor (bf16- vs f32-activation prefill, no quantization anywhere)
  already diverges after 35-43 of 64 tokens, because random logits are
  nearly flat (top-1/top-2 gap ~2-5% of |logits|; trained models have
  peaked, high-margin logits). Token-exact match on the random proxy is
  therefore unattainable *for any 8-bit scheme* and is NOT the pass
  criterion here; instead the proxy gate passes on:

  1. per-matmul W8A8-vs-weight-only rel error <= 3% on real layer
     activations (implementation soundness: a wrong scale axis or
     transpose blows this to >= 50%; measured 1.1% at 4096-width),
  2. outlier neutralization: full-model logit error of the
     outlier-planted model <= 1.5x a no-outlier control (the SmoothQuant
     fold must remove the planted outliers' entire effect; measured
     ratio 1.03), and
  3. an absolute last-token logit error bound (<= 15%; measured ~7%
     at prod width — intrinsic 8-bit accumulation on random weights,
     identical with and without outliers).

  Free-running token-match and the precision noise floor are REPORTED
  alongside for context. With REAL trained weights (``params=`` /
  tools/gate_w8a8.py --params-dir), the gate switches to the strict
  criterion: greedy decode must match token-for-token, which peaked
  trained logits support.

Replaces nothing in the reference (its fp16 multi-GPU serving has no
quantization, /root/reference/vgqa/inference/qa.py:176-182); this is the
TPU single-chip serving answer's safety net.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .llm import LLMConfig
from .llm_functional import llm_forward
from .quant import (collect_smooth_stats, quantize_llm_params,
                    smooth_llm_params)


def build_outlier_llm(cfg: LLMConfig, seed: int = 0) -> Dict[str, Any]:
    """Random LLM param tree with realistic channel-outlier structure.

    Returns the RAW (unquantized) tree: {layer_i: {...}, final_norm,
    lm_head, tok_embeddings}."""
    rng = np.random.RandomState(seed)
    D, I = cfg.hidden_size, cfg.intermediate_size
    hd = cfg.head_dim

    def chan_scales(n, sigma=0.5):
        return rng.lognormal(0.0, sigma, size=n).astype(np.float32)

    def kernel(fan_in, fan_out, gain=1.0, sigma=0.5):
        w = rng.randn(fan_in, fan_out).astype(np.float32)
        w *= gain / np.sqrt(fan_in)
        return jnp.asarray(w * chan_scales(fan_out, sigma)[None, :])

    # embedding with heavy-tailed per-channel scales: a lognormal body plus
    # a handful of forced 30-80x outlier channels. These channels persist
    # through the residual stream (projection outputs are comparatively
    # small), reproducing the "few huge channels" structure of real
    # transformer activations.
    emb_scale = rng.lognormal(0.0, 1.0, size=D).astype(np.float32)
    outlier_idx = rng.choice(D, size=max(4, D // 256), replace=False)
    emb_scale[outlier_idx] = rng.uniform(30.0, 80.0, size=len(outlier_idx))
    emb = rng.randn(cfg.vocab_size, D).astype(np.float32) * 0.02
    emb *= emb_scale[None, :]

    # residual-branch gain ~ 1/sqrt(2*layers) keeps the stream stable over
    # depth with random weights (muP-style), so deep gates stay finite
    res_gain = 1.0 / np.sqrt(2.0 * cfg.num_layers)

    params: Dict[str, Any] = {
        "tok_embeddings": {"embedding": jnp.asarray(emb)},
        "final_norm": {"scale": jnp.ones((D,), jnp.float32)},
        "lm_head": {"kernel": kernel(D, cfg.vocab_size, 1.0, 0.3)},
    }
    for i in range(cfg.num_layers):
        params[f"layer_{i}"] = {
            "attn_norm": {"scale": jnp.asarray(
                1.0 + 0.1 * rng.randn(D).astype(np.float32))},
            "mlp_norm": {"scale": jnp.asarray(
                1.0 + 0.1 * rng.randn(D).astype(np.float32))},
            "q_proj": {"kernel": kernel(D, cfg.num_heads * hd)},
            "k_proj": {"kernel": kernel(D, cfg.num_kv_heads * hd)},
            "v_proj": {"kernel": kernel(D, cfg.num_kv_heads * hd)},
            "o_proj": {"kernel": kernel(cfg.num_heads * hd, D, res_gain)},
            "gate_proj": {"kernel": kernel(D, I)},
            "up_proj": {"kernel": kernel(D, I)},
            "down_proj": {"kernel": kernel(I, D, res_gain)},
        }
    return params


from functools import partial


@partial(jax.jit, static_argnums=(1, 4, 5, 6))
def _prefill_and_decode(params, cfg: LLMConfig, embeds, length,
                        new_tokens: int, w8a8: bool, dtype):
    """Prefill the prompt (w8a8 or exact activations) then greedy-decode
    ``new_tokens`` with EXACT activations (what the serving engine does:
    only the compute-bound prefill is quantized). Returns (tokens
    [new_tokens] int32, last prefill logits [V] f32). Jitted once per
    (cfg, shape, w8a8); ``length`` is traced."""
    from .llm_functional import embed_tokens

    Lp = embeds.shape[1]
    S = Lp + new_tokens

    pos = jnp.arange(Lp)[None]
    idx = jnp.arange(Lp)
    mask = (idx[None, :, None] >= idx[None, None, :]) & (
        idx[None, None, :] < length
    )
    logits, kv = llm_forward(
        params, cfg, embeds, pos, mask,
        lm_head_rows=(length - 1)[None], w8a8=w8a8,
    )
    # move prefill kv into a [B, KVH, S, hd] cache
    cache = [
        (
            jnp.zeros((1, cfg.num_kv_heads, S, cfg.head_dim), dtype)
            .at[:, :, :Lp].set(k.astype(dtype)),
            jnp.zeros((1, cfg.num_kv_heads, S, cfg.head_dim), dtype)
            .at[:, :, :Lp].set(v.astype(dtype)),
        )
        for k, v in kv
    ]

    def step(carry, _):
        cache, logits, position = carry
        next_id = jnp.argmax(logits[0, 0]).astype(jnp.int32)
        embeds = embed_tokens(params, cfg, next_id[None, None])
        mask = (jnp.arange(S)[None, None, :] <= position)
        new_logits, new_cache = llm_forward(
            params, cfg, embeds.astype(dtype), position[None, None],
            mask, cache=cache, cache_index=position,
        )
        return (new_cache, new_logits, position + 1), next_id

    init = (cache, logits, length.astype(jnp.int32))
    _, tokens = jax.lax.scan(step, init, None, length=new_tokens)
    return tokens, logits[0, 0].astype(jnp.float32)


def run_gate(
    cfg: LLMConfig,
    n_prompts: int = 4,
    prompt_len: int = 96,
    new_tokens: int = 64,
    dtype=jnp.bfloat16,
    seed: int = 0,
    params: Dict[str, Any] | None = None,
    smooth: bool = True,
    smooth_alpha: float = 0.5,
) -> Dict[str, Any]:
    """Run the gate; returns a dict with per-prompt match results.

    ``params``: pass a pre-built raw tree to gate real (converted)
    weights — switches to the STRICT criterion (token-exact greedy
    match); default builds the outlier-realistic random tree and uses
    the calibrated criteria (module docstring). ``smooth`` applies the
    SmoothQuant fold (quant.smooth_llm_params) before quantization,
    calibrated on a HELD-OUT random prompt (different stream than the
    eval prompts) — matching what tools/convert_weights.py does."""
    from .llm_functional import _rms_norm, embed_tokens
    from .quant import quant_matmul, quant_matmul_w8a8

    real_weights = params is not None
    raw = params if real_weights else build_outlier_llm(cfg, seed)
    rng = np.random.RandomState(seed + 1)
    calib = np.random.RandomState(seed + 999).randint(
        0, cfg.vocab_size, size=(1, prompt_len))

    def prep(tree):
        if smooth:
            stats = collect_smooth_stats(tree, cfg, calib,
                                         dtype=jnp.float32)
            tree = smooth_llm_params(tree, cfg, stats, alpha=smooth_alpha)
        return quantize_llm_params(tree)

    qparams = prep(raw)

    # no-outlier control (random proxy only): same pipeline on a model
    # whose embedding has NO planted outlier channels — the smoothing
    # fold must make the outlier model quantize as well as this one
    q_control = None
    if not real_weights:
        control = build_outlier_llm(cfg, seed)
        emb = np.asarray(control["tok_embeddings"]["embedding"])
        flat = (np.random.RandomState(seed + 5)
                .randn(*emb.shape).astype(np.float32) * 0.02)
        control["tok_embeddings"] = {"embedding": jnp.asarray(flat)}
        q_control = prep(control)

    def eval_prompts(qp, ids_list, w8a8_b=True, dt_a=dtype, dt_b=dtype):
        rows = []
        for pi, ids in enumerate(ids_list):
            embeds = embed_tokens(qp, cfg, jnp.asarray(ids))
            length = jnp.asarray(ids.shape[1], jnp.int32)
            tok_a, log_a = _prefill_and_decode(
                qp, cfg, embeds.astype(dt_a), length, new_tokens, False,
                dt_a)
            tok_b, log_b = _prefill_and_decode(
                qp, cfg, embeds.astype(dt_b), length, new_tokens, w8a8_b,
                dt_b)
            tok_a, tok_b = np.asarray(tok_a), np.asarray(tok_b)
            la = np.asarray(log_a, np.float32)
            lb = np.asarray(log_b, np.float32)
            n_match = int((tok_a == tok_b).cumprod().sum())
            rel = float(np.abs(la - lb).max() / max(np.abs(la).max(), 1e-6))
            srt = np.sort(la)[::-1]
            rows.append({
                "prompt": pi,
                "tokens_matched": n_match,
                "tokens_total": int(new_tokens),
                "exact_match": bool(n_match == new_tokens),
                "prefill_logit_max_rel_err": rel,
                "baseline_top_gap": float(srt[0] - srt[1]),
                "baseline_logit_absmax": float(np.abs(la).max()),
            })
        return rows

    prompts = [rng.randint(0, cfg.vocab_size, size=(1, prompt_len))
               for _ in range(n_prompts)]
    results = eval_prompts(qparams, prompts)

    # criterion 1: per-matmul soundness on real layer-0 activations
    emb0 = embed_tokens(qparams, cfg, jnp.asarray(prompts[0])).astype(dtype)
    h0 = _rms_norm(emb0, qparams["layer_0"]["attn_norm"], cfg.rms_eps)
    a = quant_matmul(h0, qparams["layer_0"]["q_proj"]).astype(jnp.float32)
    b = quant_matmul_w8a8(
        h0, qparams["layer_0"]["q_proj"]).astype(jnp.float32)
    per_matmul = float(jnp.abs(a - b).max() / jnp.abs(a).max())

    out: Dict[str, Any] = {
        "geometry": {
            "hidden": cfg.hidden_size, "layers": cfg.num_layers,
            "heads": f"{cfg.num_heads}/{cfg.num_kv_heads} (GQA)",
            "intermediate": cfg.intermediate_size,
            "vocab": cfg.vocab_size,
        },
        "protocol": {
            "n_prompts": n_prompts, "prompt_len": prompt_len,
            "new_tokens": new_tokens,
            "dtype": getattr(dtype, "__name__", str(dtype)),
            "weights": "supplied (STRICT token-match criterion)"
                       if real_weights else
                       "random outlier-realistic (calibrated criteria)",
            "smooth": bool(smooth),
            "smooth_alpha": float(smooth_alpha) if smooth else None,
        },
        "results": results,
        "per_matmul_rel_err": per_matmul,
        "max_prefill_logit_rel_err": max(
            r["prefill_logit_max_rel_err"] for r in results),
        "greedy_match": all(r["exact_match"] for r in results),
    }

    if real_weights:
        out["criteria"] = {
            "strict_greedy_match": out["greedy_match"],
            "per_matmul_rel_err<=0.03": per_matmul <= 0.03,
        }
        out["pass"] = bool(out["greedy_match"] and per_matmul <= 0.03)
        return out

    # criterion 2: the control model (no planted outliers)
    control_rows = eval_prompts(q_control, prompts)
    control_err = max(r["prefill_logit_max_rel_err"] for r in control_rows)
    outlier_ratio = out["max_prefill_logit_rel_err"] / max(control_err,
                                                           1e-6)
    # context: the pure-precision noise floor (bf16 vs f32, NO act quant)
    floor_rows = eval_prompts(qparams, prompts[:2], w8a8_b=False,
                              dt_a=jnp.bfloat16, dt_b=jnp.float32)
    out["control_no_outliers"] = {
        "max_prefill_logit_rel_err": control_err,
        "results": control_rows,
    }
    out["noise_floor_bf16_vs_f32"] = floor_rows
    out["criteria"] = {
        "per_matmul_rel_err<=0.03": per_matmul <= 0.03,
        "outlier_vs_control_ratio<=1.5": outlier_ratio <= 1.5,
        "max_logit_rel_err<=0.15": out["max_prefill_logit_rel_err"] <= 0.15,
    }
    out["outlier_vs_control_ratio"] = float(outlier_ratio)
    out["pass"] = bool(all(out["criteria"].values()))
    return out


@partial(jax.jit, static_argnums=(1, 4, 5, 6))
def _prefill_and_decode_kv(params, cfg: LLMConfig, embeds, length,
                           new_tokens: int, kv_mode: str, dtype):
    """Prefill exactly, then greedy-decode through one of three KV-cache
    regimes (``kv_mode`` static):

    * ``"exact"``  — dense ``dtype`` cache (the shipped default),
    * ``"int8"``   — the int8+per-token-scale cache the serving engine
      uses under VGQA_KV_INT8 (factored-scale attention dots),
    * ``"dequant"``— the SAME quantized values explicitly dequantized to
      a dense f32 cache read through the normal path: differs from
      ``"int8"`` only by the factored-scale implementation, so comparing
      the two isolates implementation error from quantization error.

    Returns (tokens [new_tokens], per-step logits [new_tokens, V] f32).
    """
    from .llm import quantize_kv
    from .llm_functional import embed_tokens

    Lp = embeds.shape[1]
    S = Lp + new_tokens
    KVH, hd = cfg.num_kv_heads, cfg.head_dim

    pos = jnp.arange(Lp)[None]
    idx = jnp.arange(Lp)
    mask = (idx[None, :, None] >= idx[None, None, :]) & (
        idx[None, None, :] < length
    )
    logits, kv = llm_forward(
        params, cfg, embeds, pos, mask, lm_head_rows=(length - 1)[None],
    )

    if kv_mode == "exact":
        cache = [
            (
                jnp.zeros((1, KVH, S, hd), dtype)
                .at[:, :, :Lp].set(k.astype(dtype)),
                jnp.zeros((1, KVH, S, hd), dtype)
                .at[:, :, :Lp].set(v.astype(dtype)),
            )
            for k, v in kv
        ]
    else:
        cache = []
        for k, v in kv:
            kq, ks = quantize_kv(k)
            vq, vs = quantize_kv(v)
            ent = {
                "kq": jnp.zeros((1, KVH, S, hd), jnp.int8)
                .at[:, :, :Lp].set(kq),
                "ks": jnp.zeros((1, KVH, S), jnp.float32)
                .at[:, :, :Lp].set(ks),
                "vq": jnp.zeros((1, KVH, S, hd), jnp.int8)
                .at[:, :, :Lp].set(vq),
                "vs": jnp.zeros((1, KVH, S), jnp.float32)
                .at[:, :, :Lp].set(vs),
            }
            cache.append(ent)
        if kv_mode == "dequant":
            from .llm import dequantize_kv

            cache = [
                (
                    dequantize_kv(e["kq"], e["ks"], jnp.float32),
                    dequantize_kv(e["vq"], e["vs"], jnp.float32),
                )
                for e in cache
            ]

    def step(carry, _):
        cache, logits, position = carry
        next_id = jnp.argmax(logits[0, 0]).astype(jnp.int32)
        embeds = embed_tokens(params, cfg, next_id[None, None])
        mask = (jnp.arange(S)[None, None, :] <= position)
        new_logits, new_cache = llm_forward(
            params, cfg, embeds.astype(dtype), position[None, None],
            mask, cache=cache, cache_index=position,
        )
        return ((new_cache, new_logits, position + 1),
                (next_id, new_logits[0, 0].astype(jnp.float32)))

    init = (cache, logits, length.astype(jnp.int32))
    _, (tokens, step_logits) = jax.lax.scan(
        step, init, None, length=new_tokens)
    return tokens, step_logits


def run_gate_kv_int8(
    cfg: LLMConfig,
    n_prompts: int = 4,
    prompt_len: int = 96,
    new_tokens: int = 64,
    dtype=jnp.bfloat16,
    seed: int = 0,
    params: Dict[str, Any] | None = None,
) -> Dict[str, Any]:
    """Accuracy gate for the int8 KV cache (ON by default since r4;
    ``VGQA_KV_INT8=0`` opts out).

    Weights stay UNQUANTIZED here so the measurement isolates KV-cache
    error (the serving engine composes int8 weights + int8 KV, but their
    errors are independent mechanisms). Criteria:

    1. **implementation soundness** (pass/fail on any weights) — the
       factored-scale attention over int8 buffers must match the normal
       attention over the explicitly dequantized cache on the FIRST
       decode step (same quantized values, two code paths) to <=0.5%,
       compared in f32 — in bf16 the two paths round (probs*vs) vs probs
       in different places, adding ~1% of noise unrelated to the
       implementation; a swapped scale axis or misplaced write blows
       this up to >=50% in any dtype,
    2. **first-step logit error bound** — int8-KV vs exact-KV first
       decode step <=5% max rel err (per-vector absmax KV quantization
       measures well under this; only the first step compares cleanly —
       later steps condition on possibly-different tokens),
    3. with REAL weights (``params=``): strict greedy token match, which
       peaked trained logits support (random-proxy logits are near-flat,
       module docstring).
    """
    from .llm_functional import embed_tokens

    real_weights = params is not None
    raw = params if real_weights else build_outlier_llm(cfg, seed)
    rng = np.random.RandomState(seed + 1)
    prompts = [rng.randint(0, cfg.vocab_size, size=(1, prompt_len))
               for _ in range(n_prompts)]

    rows = []
    for ids in prompts:
        embeds = embed_tokens(raw, cfg, jnp.asarray(ids)).astype(dtype)
        length = jnp.asarray(ids.shape[1], jnp.int32)
        tok_e, log_e = _prefill_and_decode_kv(
            raw, cfg, embeds, length, new_tokens, "exact", dtype)
        tok_q, log_q = _prefill_and_decode_kv(
            raw, cfg, embeds, length, new_tokens, "int8", dtype)
        tok_e, tok_q = np.asarray(tok_e), np.asarray(tok_q)
        e0 = np.asarray(log_e[0], np.float32)
        q0 = np.asarray(log_q[0], np.float32)
        scale = max(np.abs(e0).max(), 1e-6)
        rows.append({
            "tokens_matched": int((tok_e == tok_q).cumprod().sum()),
            "tokens_total": int(new_tokens),
            "first_step_logit_rel_err": float(
                np.abs(q0 - e0).max() / scale),
        })

    # implementation soundness in f32 (docstring criterion 1): the SAME
    # quantized cache read through the factored-scale path vs explicitly
    # dequantized — one step is enough, later steps condition on tokens
    emb0 = embed_tokens(raw, cfg, jnp.asarray(prompts[0]))
    len0 = jnp.asarray(prompts[0].shape[1], jnp.int32)
    _, li = _prefill_and_decode_kv(
        raw, cfg, emb0.astype(jnp.float32), len0, 1, "int8", jnp.float32)
    _, ld = _prefill_and_decode_kv(
        raw, cfg, emb0.astype(jnp.float32), len0, 1, "dequant", jnp.float32)
    li0 = np.asarray(li[0], np.float32)
    ld0 = np.asarray(ld[0], np.float32)
    impl = float(np.abs(li0 - ld0).max() / max(np.abs(ld0).max(), 1e-6))

    err = max(r["first_step_logit_rel_err"] for r in rows)
    match = all(r["tokens_matched"] == r["tokens_total"] for r in rows)
    out: Dict[str, Any] = {
        "geometry": {
            "hidden": cfg.hidden_size, "layers": cfg.num_layers,
            "heads": f"{cfg.num_heads}/{cfg.num_kv_heads} (GQA)",
            "intermediate": cfg.intermediate_size, "vocab": cfg.vocab_size,
        },
        "protocol": {
            "kv": "int8 per-token absmax", "n_prompts": n_prompts,
            "prompt_len": prompt_len, "new_tokens": new_tokens,
            "weights": "supplied (STRICT token-match criterion)"
                       if real_weights else
                       "random outlier-realistic (calibrated criteria)",
        },
        "results": rows,
        "impl_rel_err_vs_dequant": impl,
        "first_step_logit_rel_err": err,
        "greedy_match": match,
    }
    out["criteria"] = {
        "impl_rel_err<=0.005": impl <= 0.005,
        "first_step_logit_rel_err<=0.05": err <= 0.05,
    }
    if real_weights:
        out["criteria"]["strict_greedy_match"] = match
    out["pass"] = bool(all(out["criteria"].values()))
    return out


def run_gate_int4(
    cfg: LLMConfig,
    n_prompts: int = 4,
    prompt_len: int = 96,
    new_tokens: int = 64,
    dtype=jnp.bfloat16,
    seed: int = 0,
    params: Dict[str, Any] | None = None,
    smooth: bool = True,
    smooth_alpha: float = 0.5,
    group_size: int = 128,
) -> Dict[str, Any]:
    """Accuracy gate for int4 group-wise weight-only decode (opt-in,
    ``--wq int4``): how much MORE error than the shipped int8 default?

    int4 halves the decode weight read (the measured HBM bound,
    BASELINE.md). The gate measures, on the same outlier-realistic proxy
    (or real weights via ``params``):

    1. **implementation soundness** — ``quant_matmul_int4`` must match a
       plain matmul over the explicitly dequantized kernel to <=0.5% (a
       wrong nibble order / sign extension / group axis blows this up;
       the pack itself is exact, tests/test_quant.py). This is the only
       PASS criterion on the random proxy.
    2. **int4-vs-int8 error ratio** (reported context, not a proxy
       criterion) — MEASURED 2026-08-20 at production width, 2 layers:
       int4 group-128 logit rel err 0.53-0.60 = **~10x** int8's 0.056.
       Random weights carry zero redundancy, so RTN error propagates
       undamped; trained LLMs famously tolerate group-wise int4
       (AWQ/GPTQ ship at <1% quality delta) — the proxy OVERSTATES
       real-weight int4 error, which is exactly why int4 stays opt-in
       until real weights can be gated.

    With real weights (``params=``) the gate switches to the strict
    criteria: greedy token match AND int4_over_int8_ratio <= 3.0 —
    decide from GATE_INT4.json on your eval set. The decode path gated
    here: quant.quant_matmul_int4 via llm_functional._dense (kernel_q4
    dispatch)."""
    from .llm_functional import _rms_norm, embed_tokens
    from .quant import (dequantize_kernel_int4, quant_matmul_int4,
                        quantize_llm_params_int4)

    real_weights = params is not None
    raw = params if real_weights else build_outlier_llm(cfg, seed)
    rng = np.random.RandomState(seed + 1)
    calib = np.random.RandomState(seed + 999).randint(
        0, cfg.vocab_size, size=(1, prompt_len))

    smoothed = raw
    if smooth:
        stats = collect_smooth_stats(raw, cfg, calib, dtype=jnp.float32)
        smoothed = smooth_llm_params(raw, cfg, stats, alpha=smooth_alpha)
    q8 = quantize_llm_params(smoothed)
    q4 = quantize_llm_params_int4(smoothed, group_size=group_size)

    prompts = [rng.randint(0, cfg.vocab_size, size=(1, prompt_len))
               for _ in range(n_prompts)]

    def decode_rows(tree):
        rows = []
        for ids in prompts:
            embeds = embed_tokens(tree, cfg, jnp.asarray(ids))
            length = jnp.asarray(ids.shape[1], jnp.int32)
            tok, log = _prefill_and_decode(
                tree, cfg, embeds.astype(dtype), length, new_tokens,
                False, dtype)
            rows.append((np.asarray(tok), np.asarray(log, np.float32)))
        return rows

    ref_rows = decode_rows(smoothed)   # raw weights, bf16 activations
    r8 = decode_rows(q8)
    r4 = decode_rows(q4)

    def summarize(rows):
        out = []
        for (tok_r, log_r), (tok_q, log_q) in zip(ref_rows, rows):
            n_match = int((tok_r == tok_q).cumprod().sum())
            rel = float(np.abs(log_r - log_q).max()
                        / max(np.abs(log_r).max(), 1e-6))
            out.append({"tokens_matched": n_match,
                        "tokens_total": int(new_tokens),
                        "logit_max_rel_err": rel})
        return out

    s8, s4 = summarize(r8), summarize(r4)
    err8 = max(r["logit_max_rel_err"] for r in s8)
    err4 = max(r["logit_max_rel_err"] for r in s4)
    ratio = err4 / max(err8, 1e-6)

    # criterion 1: packed-int4 matmul vs explicit dequant on real layer-0
    # activations (isolates the pack/unpack/fusion from RTN error)
    emb0 = embed_tokens(q4, cfg, jnp.asarray(prompts[0])).astype(dtype)
    h0 = _rms_norm(emb0, q4["layer_0"]["attn_norm"], cfg.rms_eps)
    qp = q4["layer_0"]["q_proj"]
    a = quant_matmul_int4(h0, qp).astype(jnp.float32)
    b = jnp.einsum("...i,io->...o", h0,
                   dequantize_kernel_int4(qp, dtype=h0.dtype),
                   preferred_element_type=jnp.float32)
    impl_err = float(jnp.abs(a - b).max() / jnp.abs(a).max())

    out: Dict[str, Any] = {
        "geometry": {
            "hidden": cfg.hidden_size, "layers": cfg.num_layers,
            "heads": f"{cfg.num_heads}/{cfg.num_kv_heads} (GQA)",
            "intermediate": cfg.intermediate_size, "vocab": cfg.vocab_size,
        },
        "protocol": {
            "wq": "int4", "group_size": int(group_size),
            "n_prompts": n_prompts, "prompt_len": prompt_len,
            "new_tokens": new_tokens,
            "weights": "supplied" if real_weights
                       else "random outlier-realistic",
            "smooth": bool(smooth),
        },
        "int8_vs_raw": s8,
        "int4_vs_raw": s4,
        "impl_rel_err_vs_dequant": impl_err,
        "int4_logit_rel_err": err4,
        "int8_logit_rel_err": err8,
        "int4_over_int8_ratio": float(ratio),
        "greedy_match_int4": all(
            r["tokens_matched"] == r["tokens_total"] for r in s4),
    }
    if real_weights:
        out["criteria"] = {
            "impl_rel_err<=0.005": impl_err <= 0.005,
            "strict_greedy_match": out["greedy_match_int4"],
            "int4_over_int8_ratio<=3.0": ratio <= 3.0,
        }
    else:
        # random proxy: only implementation soundness can pass/fail here
        # (RTN error on redundancy-free random weights overstates trained-
        # model int4 error ~10x — see docstring); the ratio is context
        out["criteria"] = {"impl_rel_err<=0.005": impl_err <= 0.005}
    out["pass"] = bool(all(out["criteria"].values()))
    return out
