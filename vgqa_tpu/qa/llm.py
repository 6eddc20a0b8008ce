"""Decoder-only LLM for the VideoQA path (flax, from scratch).

The reference serves InternVideo2.5-Chat-8B through HF ``AutoModel`` with
``trust_remote_code`` and ``device_map="auto"``
(/root/reference/vgqa/inference/qa.py:156-189) — remote PyTorch code on
GPUs. Here the language tower is implemented natively: an InternLM2/Llama
family decoder (RMSNorm, SwiGLU MLP, rotary positions, grouped-query
attention) designed for TPU serving:

* static-shape prefill over the full padded prompt (one MXU-heavy program),
* single-token decode steps against a preallocated KV cache laid out
  [layers, batch, kv_heads, max_len, head_dim] so each step is a batched
  matvec + cache update with no reshapes,
* everything jittable; sampling runs on host for flexible top-p.

Weights load from converted HF checkpoints via tools/convert_weights.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclass(frozen=True)
class LLMConfig:
    vocab_size: int = 92553           # InternLM2.5-7B vocab
    hidden_size: int = 4096
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    intermediate_size: int = 14336
    rope_theta: float = 1000000.0
    rms_eps: float = 1e-5
    max_seq_len: int = 16384
    tie_embeddings: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @classmethod
    def internlm2_5_7b(cls) -> "LLMConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "LLMConfig":
        return cls(
            vocab_size=256, hidden_size=64, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=128, max_seq_len=512,
            rope_theta=10000.0,
        )


def rotary_embedding(positions: jnp.ndarray, head_dim: int, theta: float):
    """cos/sin tables for the given positions. positions: [...,]"""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [..., hd/2]
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """x: [..., L, H, D]; cos/sin: [..., L, D/2] broadcast over heads."""
    x1, x2 = jnp.split(x, 2, axis=-1)
    c = cos[..., None, :]
    s = sin[..., None, :]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


class RMSNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        return (x * jax.lax.rsqrt(var + self.eps)).astype(x.dtype) * scale


class DecoderLayer(nn.Module):
    cfg: LLMConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,               # [B, L, D]
        positions: jnp.ndarray,       # [B, L]
        attn_mask: jnp.ndarray,       # [B, L, S] True = attend
        cache: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,  # (k, v) [B, KVH, S, hd]
        cache_index: Optional[jnp.ndarray] = None,
    ):
        c = self.cfg
        hd = c.head_dim
        B, L, _ = x.shape

        h = RMSNorm(c.rms_eps, name="attn_norm")(x)
        q = nn.Dense(c.num_heads * hd, use_bias=False, name="q_proj")(h)
        k = nn.Dense(c.num_kv_heads * hd, use_bias=False, name="k_proj")(h)
        v = nn.Dense(c.num_kv_heads * hd, use_bias=False, name="v_proj")(h)
        q = q.reshape(B, L, c.num_heads, hd)
        k = k.reshape(B, L, c.num_kv_heads, hd)
        v = v.reshape(B, L, c.num_kv_heads, hd)

        cos, sin = rotary_embedding(positions, hd, c.rope_theta)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        if cache is not None:
            ck, cv = cache  # [B, KVH, S, hd]
            k_t = k.transpose(0, 2, 1, 3)
            v_t = v.transpose(0, 2, 1, 3)
            ck = jax.lax.dynamic_update_slice(
                ck, k_t.astype(ck.dtype), (0, 0, cache_index, 0)
            )
            cv = jax.lax.dynamic_update_slice(
                cv, v_t.astype(cv.dtype), (0, 0, cache_index, 0)
            )
            keys, values = ck, cv
            new_cache = (ck, cv)
        else:
            keys = k.transpose(0, 2, 1, 3)
            values = v.transpose(0, 2, 1, 3)
            new_cache = (keys, values)

        # grouped-query: repeat kv heads across the query-head groups
        group = c.num_heads // c.num_kv_heads
        qh = q.transpose(0, 2, 1, 3).reshape(B, c.num_kv_heads, group, L, hd)
        logits = jnp.einsum(
            "bkgld,bksd->bkgls", qh, keys, preferred_element_type=jnp.float32
        ) / jnp.sqrt(hd).astype(jnp.float32)
        logits = jnp.where(attn_mask[:, None, None], logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        ctx = jnp.einsum(
            "bkgls,bksd->bkgld", probs, values, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        ctx = ctx.reshape(B, c.num_heads, L, hd).transpose(0, 2, 1, 3)
        ctx = ctx.reshape(B, L, c.num_heads * hd)
        x = x + nn.Dense(c.hidden_size, use_bias=False, name="o_proj")(ctx)

        h = RMSNorm(c.rms_eps, name="mlp_norm")(x)
        gate = nn.Dense(c.intermediate_size, use_bias=False, name="gate_proj")(h)
        up = nn.Dense(c.intermediate_size, use_bias=False, name="up_proj")(h)
        down = nn.Dense(c.hidden_size, use_bias=False, name="down_proj")(
            nn.silu(gate) * up
        )
        return x + down, new_cache


class LLM(nn.Module):
    cfg: LLMConfig

    @nn.compact
    def __call__(
        self,
        input_embeds: jnp.ndarray,    # [B, L, D] (embedding lookup is external
                                      #  so visual tokens can be spliced in)
        positions: jnp.ndarray,       # [B, L]
        attn_mask: jnp.ndarray,       # [B, L, S]
        cache: Optional[Any] = None,  # list of per-layer (k, v) or None
        cache_index: Optional[jnp.ndarray] = None,
    ):
        c = self.cfg
        x = input_embeds
        new_cache = []
        for i in range(c.num_layers):
            layer_cache = cache[i] if cache is not None else None
            x, kv = DecoderLayer(c, name=f"layer_{i}")(
                x, positions, attn_mask, layer_cache, cache_index
            )
            new_cache.append(kv)
        x = RMSNorm(c.rms_eps, name="final_norm")(x)
        logits = nn.Dense(c.vocab_size, use_bias=False, name="lm_head")(x)
        return logits, new_cache


class TokenEmbedding(nn.Module):
    cfg: LLMConfig

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        token_ids = jnp.clip(token_ids, 0, c.vocab_size - 1)
        return nn.Embed(c.vocab_size, c.hidden_size, name="tok_embeddings")(
            token_ids
        )


def init_kv_cache(cfg: LLMConfig, batch: int, max_len: int, dtype=jnp.bfloat16,
                  stacked: bool = False, quant: str = None):
    """KV cache in one of three layouts (llm_forward accepts any):

    * list of per-layer ([B, KVH, S, hd], [B, KVH, S, hd]) pairs — the
      default. A 32-layer decode program carries 2*nL separate buffers.
    * ``stacked``: ONE ([nL, B, KVH, S, hd], [nL, B, KVH, S, hd]) pair —
      the decode while_loop then carries 2 buffers instead of 64, which
      shrinks the program the remote compile service has to buffer-assign
      (the QA batch=4 decode failed deterministically in that service with
      the 64-buffer carry, BASELINE.md r4). Layer reads/writes use static
      layer indices, so the compiled math is identical.
    * ``quant="int8"``: list of per-layer dicts
      {kq int8 [B, KVH, S, hd], ks f32 [B, KVH, S], vq, vs} — each token's
      K/V head vector is absmax-quantized at write time and the scales are
      factored OUT of the attention dots at read time (llm_forward), so
      the per-step HBM read of the cache halves. At the 32-frame QA
      protocol a cache row is ~1.2 GB bf16; int8 makes batch=8 rows +
      the 7.7 GB int8 weights fit one v5e's 16 GB HBM.
    * ``quant="int8", stacked=True``: ONE dict of stacked buffers
      {kq int8 [nL, B, KVH, S, hd], ks f32 [nL, B, KVH, S], vq, vs} —
      the scanned-decode layout (llm_functional.llm_decode_scanned).
    """
    if quant == "int8":
        if stacked:
            # the scanned-decode layout (llm_decode_scanned): ONE int8
            # buffer + scale buffer per side with a leading layer axis
            kv = (cfg.num_layers, batch, cfg.num_kv_heads, max_len,
                  cfg.head_dim)
            sc = (cfg.num_layers, batch, cfg.num_kv_heads, max_len)
            return {
                "kq": jnp.zeros(kv, jnp.int8),
                "ks": jnp.zeros(sc, jnp.float32),
                "vq": jnp.zeros(kv, jnp.int8),
                "vs": jnp.zeros(sc, jnp.float32),
            }
        kv = (batch, cfg.num_kv_heads, max_len, cfg.head_dim)
        sc = (batch, cfg.num_kv_heads, max_len)
        return [
            {
                "kq": jnp.zeros(kv, jnp.int8),
                "ks": jnp.zeros(sc, jnp.float32),
                "vq": jnp.zeros(kv, jnp.int8),
                "vs": jnp.zeros(sc, jnp.float32),
            }
            for _ in range(cfg.num_layers)
        ]
    assert quant is None, quant
    if stacked:
        shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len,
                 cfg.head_dim)
        return (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
    return [
        (
            jnp.zeros((batch, cfg.num_kv_heads, max_len, cfg.head_dim), dtype),
            jnp.zeros((batch, cfg.num_kv_heads, max_len, cfg.head_dim), dtype),
        )
        for _ in range(cfg.num_layers)
    ]


def quantize_kv(t: jnp.ndarray):
    """Absmax int8 quantization of K/V vectors along the LAST axis.

    ``t`` [..., hd] -> (int8 [..., hd], f32 scale [...]): one scale per
    token-head vector. Exactly invertible up to the 1/254 rounding step;
    unwritten all-zero cache rows quantize to zeros with the floor scale.
    """
    t32 = t.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(t32), axis=-1), 1e-6) / 127.0
    q = jnp.clip(jnp.round(t32 / s[..., None]), -127, 127)
    return q.astype(jnp.int8), s


def dequantize_kv(q: jnp.ndarray, s: jnp.ndarray, dtype) -> jnp.ndarray:
    """Inverse of :func:`quantize_kv` (used by paths that need a dense
    K/V operand, e.g. the flash prefill kernel)."""
    return (q.astype(jnp.float32) * s[..., None]).astype(dtype)


def quantize_kv_cache(cache):
    """bf16 per-layer list cache -> the int8 dict layout, in one pass.

    Lets prefill run entirely on the fast bf16-KV path (no per-chunk
    dequant for the flash kernel, no quantize-at-write) and pay for int8
    ONCE before decode: a single read of the bf16 cache + half-size write
    (~3 ms for a 1.2 GB row at HBM rate) vs the ~0.15 s prefill tax of
    writing int8 during the chunked flash prefill (measured r4,
    BASELINE.md). For a ONE-SHOT prefill the values match write-time
    quantization exactly (same vectors, same per-token absmax scales);
    under CHUNKED prefill the write-time path feeds dequantized int8 K/V
    into later chunks' attention, so later-chunk K/V drift slightly —
    this post-prefill conversion quantizes the exact bf16 values and is
    the (slightly) more accurate scheme (see
    tests/test_quant.py::test_kv_int8_chunked_prefill_fills_same_cache)."""
    return [
        dict(zip(("kq", "ks", "vq", "vs"), quantize_kv(ck) + quantize_kv(cv)))
        for ck, cv in cache
    ]


def kv_cache_quantized(cache) -> bool:
    """True for the int8-quantized per-layer dict layout."""
    return (
        isinstance(cache, (list, tuple))
        and len(cache) > 0
        and isinstance(cache[0], dict)
    )


def kv_cache_stacked(cache) -> bool:
    """True for the stacked ([nL, B, KVH, S, hd], ...) layout."""
    return isinstance(cache, tuple) and hasattr(cache[0], "shape")


def kv_cache_stacked_int8(cache) -> bool:
    """True for the stacked int8 dict layout ({kq [nL, B, KVH, S, hd]
    int8, ks [nL, B, KVH, S] f32, vq, vs} — llm_decode_scanned)."""
    return isinstance(cache, dict) and "kq" in cache


def quantize_kv_cache_stacked(cache):
    """bf16 per-layer list cache -> ONE stacked int8 dict, in one pass.

    The post-prefill conversion feeding :func:`llm_decode_scanned`: the
    decode scan then carries FOUR buffers (kq/ks/vq/vs) instead of
    4*num_layers, and the per-layer program shrinks ~num_layers-fold —
    targeting the remote-compile-service program-size ceiling that
    rejected the batch>=8 unrolled decode (BASELINE.md r4/r5). Same
    per-token absmax quantization as :func:`quantize_kv_cache`."""
    kq, ks = zip(*(quantize_kv(ck) for ck, _ in cache))
    vq, vs = zip(*(quantize_kv(cv) for _, cv in cache))
    return {
        "kq": jnp.stack(kq), "ks": jnp.stack(ks),
        "vq": jnp.stack(vq), "vs": jnp.stack(vs),
    }


def kv_seq_len(cache) -> int:
    """Static sequence capacity S of any cache layout (no traced ops)."""
    if kv_cache_stacked_int8(cache):
        return cache["kq"].shape[3]
    if kv_cache_stacked(cache):
        return cache[0].shape[3]
    if kv_cache_quantized(cache):
        return cache[0]["kq"].shape[2]
    return cache[0][0].shape[2]
