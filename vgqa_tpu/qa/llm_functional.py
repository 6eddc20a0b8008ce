"""Functional LLM forward consuming raw parameter trees.

Same architecture as qa/llm.py's flax modules (verified against them in
tests/test_quant.py) but expressed as pure functions over the param tree,
so kernels may be either full-precision ({kernel}) or weight-only int8
({kernel_q, scale} — qa/quant.py). The serving engine switches to this
path automatically when it detects quantized weights.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .llm import (LLMConfig, apply_rope, dequantize_kv, kv_cache_stacked,
                  kv_cache_stacked_int8, quantize_kv, rotary_embedding)
from .quant import quant_matmul, quant_matmul_int4, quant_matmul_w8a8


def stack_llm_layers(params: Dict[str, Any], num_layers: int,
                     keep_layers: bool = False) -> Dict[str, Any]:
    """Per-layer ``layer_i`` entries -> ONE ``layers`` tree with a leading
    [num_layers, ...] axis per leaf (works for bf16 ``kernel``, int8
    ``kernel_q``+``scale`` and int4 ``kernel_q4``+``scale4`` alike).

    This is the parameter form of :func:`llm_decode_scanned`: the decode
    step then lax.scans over the stacked tree instead of unrolling
    num_layers copies of the layer program — ~32x fewer HLO instructions,
    aimed at the remote-compile-service program-size ceiling that
    deterministically rejected the batch>=8 unrolled decode
    (BASELINE.md r4/r5). The unrolled :func:`llm_forward` reads the same
    storage through static slices (:func:`_layer_params`), so ONE device
    copy of the weights serves both prefill and decode. Stack on HOST
    (cpu jax default_device) for big models — a device-side stack
    transiently doubles weight HBM.

    ``keep_layers=True`` RETAINS the per-layer entries alongside the
    stacked tree — dual storage. Measured motivation (r5): at 8B the
    chunked prefill reading stacked storage through 224 static slices
    re-materializes weight copies on-chip (the same CSE-liveness trap as
    the int4 concat form) and the int4+scan bench OOMed at B=1; int4's
    packed weights are small enough that TWO copies (2 x 3.9 GB) cost
    what int8's single copy does, so int4 scan mode keeps both and each
    path reads its natural form (prefill: per-layer; decode scan:
    stacked)."""
    layer_keys = [f"layer_{i}" for i in range(num_layers)]
    stacked = jax.tree.map(lambda *ls: jnp.stack(ls),
                           *[params[k] for k in layer_keys])
    out = {k: v for k, v in params.items()
           if keep_layers or k not in layer_keys}
    out["layers"] = stacked
    return out


def _layer_params(params: Dict[str, Any], i: int) -> Dict[str, Any]:
    """Layer ``i``'s tree from either storage form (static ``i``).

    Prefers the per-layer entry (dual-storage mode keeps it precisely so
    the unrolled prefill never slices the stacked tree)."""
    key = f"layer_{i}"
    if key in params:
        return params[key]
    return jax.tree.map(lambda a: a[i], params["layers"])


def _dense(x: jnp.ndarray, p: Dict[str, Any], w8a8: bool = False) -> jnp.ndarray:
    if "kernel_q4" in p:
        # int4 group-wise weights: always bf16 activations (the W8A8
        # int8xint8 MXU path needs a per-output rescale, which group
        # scales on the contraction axis don't factor into)
        return quant_matmul_int4(x, p)
    if "kernel_q" in p:
        return quant_matmul_w8a8(x, p) if w8a8 else quant_matmul(x, p)
    y = jnp.einsum(
        "...i,io->...o", x, p["kernel"].astype(x.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"]
    return y


def _rms_norm(x: jnp.ndarray, p: Dict[str, Any], eps: float) -> jnp.ndarray:
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps)).astype(x.dtype) * p["scale"]


def llm_forward(
    params: Dict[str, Any],
    cfg: LLMConfig,
    input_embeds: jnp.ndarray,   # [B, L, D]
    positions: jnp.ndarray,      # [B, L]
    attn_mask: jnp.ndarray,      # [B, L, S]
    cache: Optional[Any] = None,
    cache_index: Optional[jnp.ndarray] = None,
    lm_head_rows: Optional[jnp.ndarray] = None,  # [B] row per batch
    flash_prefill: Optional[Dict[str, Any]] = None,
    w8a8: bool = False,
    collect_act_stats: bool = False,
):
    """Mirror of LLM.__call__ (qa/llm.py) over a raw tree.

    ``cache_index`` may be a scalar (all rows write at the same offset —
    prefill) or a [B] vector (batched decode: row b writes at its own
    position, since concurrent requests have different prompt lengths).

    ``lm_head_rows`` restricts the lm_head projection to one row per batch
    element (returned logits are [B, 1, V]). Prefill only consumes the
    final prompt token's logits, and the full-chunk [L, V] head matmul is
    ~4% of an 8B prefill's FLOPs — all wasted without this.

    ``w8a8`` routes every quantized projection through per-row dynamic
    int8 activations (quant.quant_matmul_w8a8: int8 x int8 -> int32 on the
    MXU's double-rate path) — enable for compute-bound prefill only; the
    L=1 decode steps are weight-memory-bound and keep exact bf16
    activations.

    ``flash_prefill`` = {"q_offset": int (STATIC query start position),
    "length": [] traced valid-key count, "interpret": bool} routes the
    attention through the causal GQA flash kernel
    (ops/pallas/flash_attention.flash_gqa_causal): no [L, S] logit tensor
    is materialized and key tiles beyond the causal frontier are never
    read. ``attn_mask`` is ignored on that path — the kernel's
    (causal, length) masking must describe the same mask. B must be 1.

    ``collect_act_stats`` returns a third output: per-layer per-input-
    channel activation absmax for the four matmul groups (qkv_in / o_in /
    mlp_in / down_in) — the SmoothQuant calibration signal consumed by
    quant.smooth_llm_params."""
    if cache is not None and kv_cache_stacked_int8(cache):
        assert flash_prefill is None and not collect_act_stats, (
            "the scanned decode path serves plain decode steps only"
        )
        return llm_decode_scanned(
            params, cfg, input_embeds, positions, attn_mask, cache,
            cache_index, lm_head_rows=lm_head_rows, w8a8=w8a8,
        )
    x = input_embeds
    B, L, _ = x.shape
    hd = cfg.head_dim
    stacked = cache is not None and kv_cache_stacked(cache)
    if stacked:
        ck_all, cv_all = cache
    new_cache = []
    act_stats: Dict[str, Dict[str, jnp.ndarray]] = {}

    def _absmax(t):
        # per-input-channel absmax over all tokens (SmoothQuant calibration)
        return jnp.max(jnp.abs(t.astype(jnp.float32)),
                       axis=tuple(range(t.ndim - 1)))

    for i in range(cfg.num_layers):
        p = _layer_params(params, i)
        h = _rms_norm(x, p["attn_norm"], cfg.rms_eps)
        q = _dense(h, p["q_proj"], w8a8).reshape(B, L, cfg.num_heads, hd)
        k = _dense(h, p["k_proj"], w8a8).reshape(B, L, cfg.num_kv_heads, hd)
        v = _dense(h, p["v_proj"], w8a8).reshape(B, L, cfg.num_kv_heads, hd)
        cos, sin = rotary_embedding(positions, hd, cfg.rope_theta)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        ent = None  # set on the int8-KV path; attention reads branch on it
        if stacked:
            # one [nL, B, KVH, S, hd] buffer per side: layer index i is
            # STATIC, so each write is a dynamic_update_slice into the
            # donated stacked buffer (aliased in place) and each read a
            # static slice — same math as the per-layer list, but the
            # decode while_loop carries 2 buffers instead of 2*nL
            k_t = k.transpose(0, 2, 1, 3).astype(ck_all.dtype)
            v_t = v.transpose(0, 2, 1, 3).astype(cv_all.dtype)
            if jnp.ndim(cache_index) == 1:
                # batched decode (L=1): row b writes at ITS OWN position
                for b in range(B):
                    start = (i, b, 0, cache_index[b], 0)
                    ck_all = jax.lax.dynamic_update_slice(
                        ck_all, k_t[b:b + 1][None], start
                    )
                    cv_all = jax.lax.dynamic_update_slice(
                        cv_all, v_t[b:b + 1][None], start
                    )
            else:
                start = (i, 0, 0, cache_index, 0)
                ck_all = jax.lax.dynamic_update_slice(ck_all, k_t[None], start)
                cv_all = jax.lax.dynamic_update_slice(cv_all, v_t[None], start)
            keys, values = ck_all[i], cv_all[i]
        elif cache is not None and isinstance(cache[i], dict):
            # int8 KV cache (llm.init_kv_cache quant="int8"): quantize this
            # step's K/V vectors at write time — one absmax scale per
            # token-head vector — and keep the persistent buffers int8, so
            # every later attention read streams half the bytes. The
            # scales are factored OUT of the dots below (q·(kq*ks) ==
            # ks*(q·kq)), so the dequant multiply never materializes a
            # dense bf16 cache in HBM.
            ent = dict(cache[i])
            kq, ks = quantize_kv(k.transpose(0, 2, 1, 3))  # [B,KVH,L,*]
            vq, vs = quantize_kv(v.transpose(0, 2, 1, 3))
            if jnp.ndim(cache_index) == 1:
                # batched decode: each row writes at ITS OWN position
                upd4 = jax.vmap(
                    lambda c, u, ix: jax.lax.dynamic_update_slice(
                        c, u, (0, ix, 0)
                    )
                )
                upd3 = jax.vmap(
                    lambda c, u, ix: jax.lax.dynamic_update_slice(
                        c, u, (0, ix)
                    )
                )
                ent["kq"] = upd4(ent["kq"], kq, cache_index)
                ent["ks"] = upd3(ent["ks"], ks, cache_index)
                ent["vq"] = upd4(ent["vq"], vq, cache_index)
                ent["vs"] = upd3(ent["vs"], vs, cache_index)
            else:
                ent["kq"] = jax.lax.dynamic_update_slice(
                    ent["kq"], kq, (0, 0, cache_index, 0)
                )
                ent["ks"] = jax.lax.dynamic_update_slice(
                    ent["ks"], ks, (0, 0, cache_index)
                )
                ent["vq"] = jax.lax.dynamic_update_slice(
                    ent["vq"], vq, (0, 0, cache_index, 0)
                )
                ent["vs"] = jax.lax.dynamic_update_slice(
                    ent["vs"], vs, (0, 0, cache_index)
                )
            keys = values = None  # attention reads go through `ent`
            new_cache.append(ent)
        elif cache is not None:
            ck, cv = cache[i]
            k_t = k.transpose(0, 2, 1, 3)
            v_t = v.transpose(0, 2, 1, 3)
            if jnp.ndim(cache_index) == 1:
                # batched decode: each row writes at ITS OWN position
                # (per-request prompt lengths differ)
                row_upd = jax.vmap(
                    lambda c, u, ix: jax.lax.dynamic_update_slice(
                        c, u, (0, ix, 0)
                    )
                )
                ck = row_upd(ck, k_t.astype(ck.dtype), cache_index)
                cv = row_upd(cv, v_t.astype(cv.dtype), cache_index)
            else:
                ck = jax.lax.dynamic_update_slice(
                    ck, k_t.astype(ck.dtype), (0, 0, cache_index, 0)
                )
                cv = jax.lax.dynamic_update_slice(
                    cv, v_t.astype(cv.dtype), (0, 0, cache_index, 0)
                )
            keys, values = ck, cv
            new_cache.append((ck, cv))
        else:
            keys = k.transpose(0, 2, 1, 3)
            values = v.transpose(0, 2, 1, 3)
            new_cache.append((keys, values))

        if flash_prefill is not None:
            from ..ops.pallas.flash_attention import flash_gqa_causal

            assert B == 1, "flash prefill is single-sequence"
            if ent is not None:
                # dense bf16 K/V operands for the kernel (one transient
                # [KVH, S, hd] per side per layer — chunked prefill is
                # compute-bound, so the extra HBM round-trip is a few %)
                keys = dequantize_kv(ent["kq"], ent["ks"], x.dtype)
                values = dequantize_kv(ent["vq"], ent["vs"], x.dtype)
            qf = q[0].transpose(1, 0, 2)                 # [H, L, hd]
            ctxf = flash_gqa_causal(
                qf, keys[0], values[0],
                q_offset=flash_prefill["q_offset"],
                length=flash_prefill["length"],
                interpret=flash_prefill.get("interpret", False),
            )
            ctx = ctxf.transpose(1, 0, 2).reshape(1, L, cfg.num_heads * hd)
            ctx = ctx.astype(x.dtype)
        else:
            group = cfg.num_heads // cfg.num_kv_heads
            qh = q.transpose(0, 2, 1, 3).reshape(
                B, cfg.num_kv_heads, group, L, hd
            )
            if ent is not None:
                # int8 KV: factor the per-token scales OUT of both dots —
                # q·(kq*ks) == ks*(q·kq) and sum_s p_s*(vq_s*vs_s) ==
                # sum_s (p_s*vs_s)*vq_s — so the MXU streams the int8
                # buffers directly (the int8->bf16 convert fuses into the
                # dot operand read; a pre-multiplied dense cache would
                # round-trip a bf16 copy through HBM and erase the win)
                logits = jnp.einsum(
                    "bkgld,bksd->bkgls", qh, ent["kq"].astype(qh.dtype),
                    preferred_element_type=jnp.float32,
                ) * ent["ks"][:, :, None, None, :]
                logits = logits / jnp.sqrt(hd).astype(jnp.float32)
                logits = jnp.where(attn_mask[:, None, None], logits, -1e30)
                probs = jax.nn.softmax(logits, axis=-1)
                pv = (probs * ent["vs"][:, :, None, None, :]).astype(x.dtype)
                ctx = jnp.einsum(
                    "bkgls,bksd->bkgld", pv, ent["vq"].astype(x.dtype),
                    preferred_element_type=jnp.float32,
                ).astype(x.dtype)
            else:
                logits = jnp.einsum(
                    "bkgld,bksd->bkgls", qh, keys,
                    preferred_element_type=jnp.float32,
                ) / jnp.sqrt(hd).astype(jnp.float32)
                logits = jnp.where(attn_mask[:, None, None], logits, -1e30)
                probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
                ctx = jnp.einsum(
                    "bkgls,bksd->bkgld", probs, values,
                    preferred_element_type=jnp.float32,
                ).astype(x.dtype)
            ctx = ctx.reshape(B, cfg.num_heads, L, hd).transpose(0, 2, 1, 3)
            ctx = ctx.reshape(B, L, cfg.num_heads * hd)
        x = x + _dense(ctx, p["o_proj"], w8a8)

        h2 = _rms_norm(x, p["mlp_norm"], cfg.rms_eps)
        gate = _dense(h2, p["gate_proj"], w8a8)
        up = _dense(h2, p["up_proj"], w8a8)
        m = jax.nn.silu(gate) * up
        x = x + _dense(m, p["down_proj"], w8a8)
        if collect_act_stats:
            act_stats[f"layer_{i}"] = {
                "qkv_in": _absmax(h), "o_in": _absmax(ctx),
                "mlp_in": _absmax(h2), "down_in": _absmax(m),
            }

    x = _rms_norm(x, params["final_norm"], cfg.rms_eps)
    if lm_head_rows is not None:
        x = jnp.take_along_axis(x, lm_head_rows[:, None, None], axis=1)
    logits = _dense(x, params["lm_head"])
    out_cache = (ck_all, cv_all) if stacked else new_cache
    if collect_act_stats:
        return logits, out_cache, act_stats
    return logits, out_cache


def llm_decode_scanned(
    params: Dict[str, Any],
    cfg: LLMConfig,
    input_embeds: jnp.ndarray,   # [B, L, D]
    positions: jnp.ndarray,      # [B, L]
    attn_mask: jnp.ndarray,      # [B, L, S]
    cache: Dict[str, jnp.ndarray],  # stacked int8 dict (llm.py)
    cache_index,                 # scalar or [B]
    lm_head_rows: Optional[jnp.ndarray] = None,
    w8a8: bool = False,
):
    """Decode step as ONE lax.scan over layers.

    Same math as :func:`llm_forward`'s int8-KV branch (per-token absmax
    K/V quantization at write, scales factored OUT of both attention
    dots), but the 32 unrolled layer copies collapse into a single scan
    body over the stacked parameter tree (:func:`stack_llm_layers`) and
    the stacked int8 cache (llm.init_kv_cache ``stacked_int8`` /
    ``quantize_kv_cache_stacked``). The emitted program is
    ~num_layers-fold smaller: the decode while_loop carries 4 cache
    buffers instead of 4*num_layers and buffer assignment sees one layer
    body — aimed squarely at the remote-compile-service ceiling that
    rejected the unrolled batch>=8 decode (deterministic HTTP 500,
    BASELINE.md r4/r5) while HBM reads stay identical. Replaces the
    reference's per-token HF generate loop
    (/root/reference/vgqa/inference/qa.py:236-245)."""
    x = input_embeds
    B, L, _ = x.shape
    hd = cfg.head_dim
    group = cfg.num_heads // cfg.num_kv_heads
    cos, sin = rotary_embedding(positions, hd, cfg.rope_theta)
    batched = jnp.ndim(cache_index) == 1
    nL = cache["kq"].shape[0]
    assert "layers" in params, (
        "llm_decode_scanned needs stacked params (stack_llm_layers)"
    )
    sqrt_hd = jnp.sqrt(hd).astype(jnp.float32)

    def body(carry, inp):
        x, kq_all, ks_all, vq_all, vs_all = carry
        i, p = inp
        h = _rms_norm(x, p["attn_norm"], cfg.rms_eps)
        q = _dense(h, p["q_proj"], w8a8).reshape(B, L, cfg.num_heads, hd)
        k = _dense(h, p["k_proj"], w8a8).reshape(B, L, cfg.num_kv_heads, hd)
        v = _dense(h, p["v_proj"], w8a8).reshape(B, L, cfg.num_kv_heads, hd)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        kq, ks = quantize_kv(k.transpose(0, 2, 1, 3))   # [B, KVH, L, hd]
        vq, vs = quantize_kv(v.transpose(0, 2, 1, 3))
        # write ONLY the new token's slice into the [nL, ...] buffers
        # (a read-modify-write of the full layer slice would stream the
        # whole cache row per layer); `i` is the traced scan counter —
        # dynamic_update_slice takes traced starts
        if batched:
            for b in range(B):
                st4 = (i, b, 0, cache_index[b], 0)
                st3 = (i, b, 0, cache_index[b])
                kq_all = jax.lax.dynamic_update_slice(
                    kq_all, kq[b:b + 1][None], st4)
                ks_all = jax.lax.dynamic_update_slice(
                    ks_all, ks[b:b + 1][None], st3)
                vq_all = jax.lax.dynamic_update_slice(
                    vq_all, vq[b:b + 1][None], st4)
                vs_all = jax.lax.dynamic_update_slice(
                    vs_all, vs[b:b + 1][None], st3)
        else:
            kq_all = jax.lax.dynamic_update_slice(
                kq_all, kq[None], (i, 0, 0, cache_index, 0))
            ks_all = jax.lax.dynamic_update_slice(
                ks_all, ks[None], (i, 0, 0, cache_index))
            vq_all = jax.lax.dynamic_update_slice(
                vq_all, vq[None], (i, 0, 0, cache_index, 0))
            vs_all = jax.lax.dynamic_update_slice(
                vs_all, vs[None], (i, 0, 0, cache_index))
        ekq = jax.lax.dynamic_index_in_dim(kq_all, i, 0, keepdims=False)
        eks = jax.lax.dynamic_index_in_dim(ks_all, i, 0, keepdims=False)
        evq = jax.lax.dynamic_index_in_dim(vq_all, i, 0, keepdims=False)
        evs = jax.lax.dynamic_index_in_dim(vs_all, i, 0, keepdims=False)
        qh = q.transpose(0, 2, 1, 3).reshape(
            B, cfg.num_kv_heads, group, L, hd)
        # scales factored OUT of both dots (same identity as llm_forward's
        # int8-KV branch): the MXU streams int8 buffers directly
        logits = jnp.einsum(
            "bkgld,bksd->bkgls", qh, ekq.astype(qh.dtype),
            preferred_element_type=jnp.float32,
        ) * eks[:, :, None, None, :]
        logits = logits / sqrt_hd
        logits = jnp.where(attn_mask[:, None, None], logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1)
        pv = (probs * evs[:, :, None, None, :]).astype(x.dtype)
        ctx = jnp.einsum(
            "bkgls,bksd->bkgld", pv, evq.astype(x.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        ctx = ctx.reshape(B, cfg.num_heads, L, hd).transpose(0, 2, 1, 3)
        ctx = ctx.reshape(B, L, cfg.num_heads * hd)
        x = x + _dense(ctx, p["o_proj"], w8a8)
        h2 = _rms_norm(x, p["mlp_norm"], cfg.rms_eps)
        m = jax.nn.silu(_dense(h2, p["gate_proj"], w8a8)) \
            * _dense(h2, p["up_proj"], w8a8)
        x = x + _dense(m, p["down_proj"], w8a8)
        return (x, kq_all, ks_all, vq_all, vs_all), None

    carry0 = (x, cache["kq"], cache["ks"], cache["vq"], cache["vs"])
    (x, kq_all, ks_all, vq_all, vs_all), _ = jax.lax.scan(
        body, carry0, (jnp.arange(nL), params["layers"]))
    x = _rms_norm(x, params["final_norm"], cfg.rms_eps)
    if lm_head_rows is not None:
        x = jnp.take_along_axis(x, lm_head_rows[:, None, None], axis=1)
    logits = _dense(x, params["lm_head"])
    return logits, {"kq": kq_all, "ks": ks_all, "vq": vq_all, "vs": vs_all}


def embed_tokens(params: Dict[str, Any], cfg: LLMConfig, token_ids):
    token_ids = jnp.clip(token_ids, 0, cfg.vocab_size - 1)
    return params["tok_embeddings"]["embedding"][token_ids]
