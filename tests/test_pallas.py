"""Pallas kernel numerics vs the einsum attention core (interpret mode on
the CPU mesh; the same kernels compile natively on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vgqa_tpu.ops.attention import dot_product_attention
from vgqa_tpu.ops.pallas.flash_attention import flash_attention, flash_mha


def test_flash_matches_reference_basic():
    rng = np.random.RandomState(0)
    B, Lq, Lk, D = 2, 16, 24, 32
    q = jnp.asarray(rng.randn(B, Lq, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, Lk, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, Lk, D).astype(np.float32))
    ref = dot_product_attention(q, k, v, num_heads=1)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_respects_key_mask():
    rng = np.random.RandomState(1)
    B, Lq, Lk, D = 1, 8, 20, 16
    q = jnp.asarray(rng.randn(B, Lq, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, Lk, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, Lk, D).astype(np.float32))
    mask = jnp.asarray(rng.rand(B, Lk) > 0.4)
    ref = dot_product_attention(q, k, v, 1, key_mask=mask)
    out = flash_attention(q, k, v, key_mask=mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_non_tile_aligned_lengths():
    """Lq/Lk not multiples of the block size exercise the padding path
    (e.g. 420px gives S=418 tokens)."""
    rng = np.random.RandomState(2)
    B, Lq, Lk, D = 1, 130, 137, 48
    q = jnp.asarray(rng.randn(B, Lq, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, Lk, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, Lk, D).astype(np.float32))
    mask = jnp.ones((B, Lk), bool).at[0, 100:].set(False)
    ref = dot_product_attention(q, k, v, 1, key_mask=mask)
    out = flash_attention(q, k, v, key_mask=mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_flash_mha_multihead_layout():
    rng = np.random.RandomState(3)
    V, T, L, H, dh = 1, 3, 20, 4, 16
    dim = H * dh
    q = jnp.asarray(rng.randn(V, T, L, dim).astype(np.float32))
    k = jnp.asarray(rng.randn(V, T, L, dim).astype(np.float32))
    v = jnp.asarray(rng.randn(V, T, L, dim).astype(np.float32))
    mask = jnp.asarray(rng.rand(V, T, L) > 0.3)
    ref = dot_product_attention(q, k, v, H, key_mask=mask)
    out = flash_mha(q, k, v, H, key_mask=mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_flash_bf16_inputs():
    rng = np.random.RandomState(4)
    q = jnp.asarray(rng.randn(1, 16, 32).astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.randn(1, 16, 32).astype(np.float32)).astype(jnp.bfloat16)
    v = jnp.asarray(rng.randn(1, 16, 32).astype(np.float32)).astype(jnp.bfloat16)
    ref = dot_product_attention(q, k, v, 1)
    out = flash_attention(q, k, v, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


def test_flash_gqa_causal_matches_reference():
    """Causal GQA kernel vs masked einsum attention, incl. grouped KV
    heads, a valid-length bound, and a nonzero chunk offset."""
    from vgqa_tpu.ops.pallas.flash_attention import flash_gqa_causal

    rng = np.random.RandomState(3)
    H, Hkv, dh = 8, 2, 16
    S, Lq, off = 96, 32, 40     # queries are positions [40, 72) of the cache
    length = 70                  # keys beyond 70 are invalid
    q = jnp.asarray(rng.randn(H, Lq, dh).astype(np.float32))
    k = jnp.asarray(rng.randn(Hkv, S, dh).astype(np.float32))
    v = jnp.asarray(rng.randn(Hkv, S, dh).astype(np.float32))

    group = H // Hkv
    kx = jnp.repeat(k, group, axis=0)
    vx = jnp.repeat(v, group, axis=0)
    logits = jnp.einsum("hld,hsd->hls", q, kx) * dh**-0.5
    q_pos = off + jnp.arange(Lq)
    k_pos = jnp.arange(S)
    mask = (k_pos[None, :] <= q_pos[:, None]) & (k_pos[None, :] < length)
    logits = jnp.where(mask[None], logits, -1e30)
    ref = jnp.einsum("hls,hsd->hld", jax.nn.softmax(logits, axis=-1), vx)

    out = flash_gqa_causal(
        q, k, v, q_offset=off, length=jnp.asarray(length),
        blk_q=16, blk_k=32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_flash_prefill_engine_parity(monkeypatch):
    """Engine prefill with the flash path (interpret) must reproduce the
    plain-XLA prefill logits for both one-shot and chunked prompts."""
    import vgqa_tpu.qa.engine as eng_mod
    from vgqa_tpu.qa import LLMConfig, QAEngine, ViTConfig

    monkeypatch.setenv("VGQA_PALLAS_INTERPRET", "1")
    llm_cfg = LLMConfig.tiny()
    vit_cfg = ViTConfig.tiny()
    eng = QAEngine.init_random(llm_cfg, vit_cfg, max_seq_len=128)
    assert eng.use_flash_prefill
    eng_plain = QAEngine(llm_cfg, vit_cfg, eng.params, max_seq_len=128)
    eng_plain.use_flash_prefill = False

    from vgqa_tpu.qa.engine import init_kv_cache
    from vgqa_tpu.qa.llm_functional import embed_tokens

    rng = np.random.RandomState(0)
    ids = rng.randint(4, llm_cfg.vocab_size - 1, (1, 64)).astype(np.int32)
    length = jnp.asarray(57)
    embeds = embed_tokens(eng.params["embed"], llm_cfg, jnp.asarray(ids))

    c1 = init_kv_cache(llm_cfg, 1, 96, eng.dtype)
    c2 = init_kv_cache(llm_cfg, 1, 96, eng.dtype)
    l1, c1 = eng._prefill_impl(eng.params, embeds, length, c1)
    l2, c2 = eng_plain._prefill_impl(eng_plain.params, embeds, length, c2)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=2e-4,
                               rtol=1e-3)

    eng.PREFILL_CHUNK = 16
    eng_plain.PREFILL_CHUNK = 16
    c3 = init_kv_cache(llm_cfg, 1, 96, eng.dtype)
    c4 = init_kv_cache(llm_cfg, 1, 96, eng.dtype)
    l3, c3 = eng._prefill_chunked_impl(eng.params, embeds, length, c3)
    l4, c4 = eng_plain._prefill_chunked_impl(eng_plain.params, embeds,
                                             length, c4)
    np.testing.assert_allclose(np.asarray(l3), np.asarray(l4), atol=2e-4,
                               rtol=1e-3)
    # and chunked-flash matches one-shot-plain end to end
    np.testing.assert_allclose(np.asarray(l3), np.asarray(l2), atol=2e-4,
                               rtol=1e-3)
