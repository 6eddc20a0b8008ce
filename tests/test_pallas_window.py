"""Fused window-attention kernel numerics vs the einsum path."""

import jax
import jax.numpy as jnp
import numpy as np

from vgqa_tpu.ops.attention import dot_product_attention
from vgqa_tpu.ops.pallas.window_attention import window_attention


def _reference(q, k, v, bias, mask):
    """einsum window attention: q/k/v [W, H, N, D]."""
    W, H, N, D = q.shape
    logits = jnp.einsum("whnd,whmd->whnm", q, k) * (D**-0.5)
    logits = logits + bias[None]
    if mask is not None:
        logits = logits + mask[:, None]
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("whnm,whmd->whnd", p, v)


def test_window_attention_no_mask():
    rng = np.random.RandomState(0)
    W, H, N, D = 3, 2, 24, 16
    q = jnp.asarray(rng.randn(W, H, N, D).astype(np.float32))
    k = jnp.asarray(rng.randn(W, H, N, D).astype(np.float32))
    v = jnp.asarray(rng.randn(W, H, N, D).astype(np.float32))
    bias = jnp.asarray(rng.randn(H, N, N).astype(np.float32))
    ref = _reference(q, k, v, bias, None)
    out = window_attention(q, k, v, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_window_attention_with_shift_mask():
    rng = np.random.RandomState(1)
    W, H, N, D = 4, 3, 18, 8
    q = jnp.asarray(rng.randn(W, H, N, D).astype(np.float32))
    k = jnp.asarray(rng.randn(W, H, N, D).astype(np.float32))
    v = jnp.asarray(rng.randn(W, H, N, D).astype(np.float32))
    bias = jnp.asarray(rng.randn(H, N, N).astype(np.float32))
    mask = jnp.asarray(
        np.where(rng.rand(W, N, N) > 0.5, 0.0, -100.0).astype(np.float32)
    )
    ref = _reference(q, k, v, bias, mask)
    out = window_attention(q, k, v, bias, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_window_attention_swin_shapes():
    """The real Swin tile: N=392 (8x7x7 window), head_dim 32."""
    rng = np.random.RandomState(2)
    W, H, N, D = 2, 3, 392, 32
    q = jnp.asarray(rng.randn(W, H, N, D).astype(np.float32) * 0.1)
    k = jnp.asarray(rng.randn(W, H, N, D).astype(np.float32) * 0.1)
    v = jnp.asarray(rng.randn(W, H, N, D).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(H, N, N).astype(np.float32) * 0.1)
    ref = _reference(q, k, v, bias, None)
    out = window_attention(q, k, v, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_swin_block_flash_matches_einsum():
    """Whole SwinBlock3D with use_flash must match the einsum block."""
    from vgqa_tpu.models.video_swin import SwinBlock3D

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 4, 6, 6, 8).astype(np.float32))
    common = dict(dim=8, num_heads=2, window=(2, 2, 2), shift=(1, 1, 1))
    ein = SwinBlock3D(**common, use_flash=False)
    fla = SwinBlock3D(**common, use_flash=True)
    params = ein.init(jax.random.PRNGKey(0), x)
    out_e = ein.apply(params, x)
    # interpret mode on CPU mesh: force the kernel's interpret path by
    # running under pltpu interpreter
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out_f = fla.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_e), atol=5e-5
    )
