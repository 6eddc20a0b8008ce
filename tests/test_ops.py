import jax.numpy as jnp
import numpy as np

from vgqa_tpu.ops.attention import dot_product_attention
from vgqa_tpu.ops.position_encoding import (
    box_sine_embedding,
    inverse_sigmoid,
    sine_position_1d,
    sine_position_2d,
)


def test_attention_uniform_when_keys_equal():
    q = jnp.ones((2, 3, 8))
    k = jnp.ones((2, 5, 8))
    v = jnp.arange(2 * 5 * 8, dtype=jnp.float32).reshape(2, 5, 8)
    out, probs = dot_product_attention(q, k, v, num_heads=2, return_probs=True)
    np.testing.assert_allclose(np.asarray(probs), 0.2, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(v.mean(axis=1, keepdims=True)).repeat(3, 1), atol=1e-4
    )


def test_attention_key_mask_blocks_positions():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(1, 2, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 4, 8).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 4, 8).astype(np.float32))
    mask = jnp.array([[True, True, False, False]])
    out_masked = dot_product_attention(q, k, v, 2, key_mask=mask)
    out_trunc = dot_product_attention(q, k[:, :2], v[:, :2], 2)
    np.testing.assert_allclose(np.asarray(out_masked), np.asarray(out_trunc), atol=1e-5)


def test_attention_matches_naive_single_head():
    rng = np.random.RandomState(1)
    q = rng.randn(1, 3, 4).astype(np.float32)
    k = rng.randn(1, 5, 4).astype(np.float32)
    v = rng.randn(1, 5, 4).astype(np.float32)
    out = dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 1)
    logits = q[0] @ k[0].T / np.sqrt(4)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(out[0]), w @ v[0], atol=1e-5)


def test_sine_position_2d_shape_and_range():
    mask = jnp.ones((1, 4, 6), dtype=bool)
    pos = sine_position_2d(mask, num_pos_feats=8)
    assert pos.shape == (1, 4, 6, 16)
    assert float(jnp.max(jnp.abs(pos))) <= 1.0 + 1e-6
    # padded columns shouldn't shift valid-region embeddings when normalized
    mask2 = jnp.zeros((1, 4, 8), dtype=bool).at[:, :, :6].set(True)
    pos2 = sine_position_2d(mask2, num_pos_feats=8)
    np.testing.assert_allclose(
        np.asarray(pos[:, :, :6]), np.asarray(pos2[:, :, :6]), atol=1e-5
    )


def test_sine_position_1d_structure():
    te = sine_position_1d(10, 8)
    assert te.shape == (10, 8)
    np.testing.assert_allclose(np.asarray(te[0, 0::2]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(te[0, 1::2]), 1.0, atol=1e-7)


def test_box_sine_embedding_dims():
    pos = jnp.array([[[0.5, 0.5, 0.2, 0.2]]])
    emb4 = box_sine_embedding(pos)
    assert emb4.shape == (1, 1, 512)
    emb2 = box_sine_embedding(pos[..., :2])
    assert emb2.shape == (1, 1, 256)
    # first 256 channels of the 4-coord embedding are the (y, x) part
    np.testing.assert_allclose(np.asarray(emb4[..., :256]), np.asarray(emb2), atol=1e-6)


def test_inverse_sigmoid_roundtrip():
    x = jnp.array([0.1, 0.5, 0.9])
    y = 1.0 / (1.0 + jnp.exp(-inverse_sigmoid(x)))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)
