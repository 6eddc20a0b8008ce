"""Pallas kernel numerics vs the einsum attention core (interpret mode on
the CPU mesh; the same kernels compile natively on TPU)."""

import numpy as np
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
