"""Differentiable flash attention (ops/pallas/flash_train.py).

CPU runs the kernels in interpret mode; the dropout keep-mask falls back
to threefry there (the hardware-PRNG path is TPU-only), so these tests
cover the kernel math and the fwd/bwd mask-consistency contract, and the
TPU-only difference is the bit source.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vgqa_tpu.ops.attention import dot_product_attention
from vgqa_tpu.ops.pallas.flash_train import flash_mha_train, supported_seq


V, T, S, H, DH = 2, 3, 70, 4, 8
D = H * DH


@pytest.fixture(scope="module")
def qkv_mask():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(V, T, S, D), jnp.float32)
    k = jnp.asarray(rng.randn(V, T, S, D), jnp.float32)
    v = jnp.asarray(rng.randn(V, T, S, D), jnp.float32)
    mask = jnp.asarray(rng.rand(V, S) > 0.3).at[:, 0].set(True)
    return q, k, v, jnp.broadcast_to(mask[:, None], (V, T, S))


def test_fwd_matches_xla(qkv_mask):
    q, k, v, mask = qkv_mask
    ref = dot_product_attention(q, k, v, H, key_mask=mask)
    out = flash_mha_train(q, k, v, H, key_mask=mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_grads_match_xla(qkv_mask):
    q, k, v, mask = qkv_mask

    def loss(fn, *a):
        o = fn(*a)
        return (o * jnp.cos(o)).sum()

    g_ref = jax.grad(
        lambda q, k, v: loss(
            lambda *a: dot_product_attention(*a, H, key_mask=mask), q, k, v
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    g_fl = jax.grad(
        lambda q, k, v: loss(
            lambda *a: flash_mha_train(*a, H, key_mask=mask, interpret=True),
            q, k, v,
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g_ref, g_fl):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5)


def test_dropout_deterministic_and_consistent(qkv_mask):
    q, k, v, mask = qkv_mask
    f = lambda seed: flash_mha_train(  # noqa: E731
        q, k, v, H, key_mask=mask, dropout_rate=0.3, seed=seed,
        interpret=True,
    )
    o1, o2, o3 = f(7), f(7), f(8)
    assert jnp.array_equal(o1, o2), "same seed must reproduce"
    assert float(jnp.abs(o1 - o3).max()) > 1e-4, "different seed must differ"
    assert float(jnp.abs(o1 - f(7) * 0 - flash_mha_train(
        q, k, v, H, key_mask=mask, interpret=True)).max()) > 1e-4, \
        "dropout must change the output"

    def loss(q, seed):
        o = flash_mha_train(q, k, v, H, key_mask=mask, dropout_rate=0.3,
                            seed=seed, interpret=True)
        return (o ** 2).sum()

    g1 = jax.grad(loss)(q, 7)
    g2 = jax.grad(loss)(q, 7)
    assert jnp.array_equal(g1, g2)
    assert bool(jnp.isfinite(g1).all())


def _interpret_keep_masks(seed, B, lq_pad, lk_pad, rate):
    """Reproduce the interpret-mode kernel's per-row keep masks outside the
    kernel (flash_train._keep_mask: threefry bits of PRNGKey(seed + b),
    top-24-bit uniform >= rate)."""
    masks = []
    for b in range(B):
        bits = jax.random.bits(
            jax.random.PRNGKey(seed + b), (lq_pad, lk_pad), jnp.uint32
        ).astype(jnp.int32)
        u = jax.lax.shift_right_logical(bits, 8).astype(jnp.float32)
        masks.append(u * (1.0 / (1 << 24)) >= rate)
    return jnp.stack(masks)


def test_dropout_fwd_bwd_match_explicit_mask(qkv_mask):
    """The kernel's dropped forward AND backward equal a plain-JAX
    attention using the exact keep mask the kernel generated — the
    backward provably regenerates the forward's mask."""
    q, k, v, mask = qkv_mask
    rate, seed = 0.3, 11
    lq_pad = lk_pad = 128  # S=70 rounds to 128
    B = V * T * H
    keep = _interpret_keep_masks(seed, B, lq_pad, lk_pad, rate)

    def ref(q, k, v):
        qh = q.reshape(V * T, S, H, DH).transpose(0, 2, 1, 3)
        kh = k.reshape(V * T, S, H, DH).transpose(0, 2, 1, 3)
        vh = v.reshape(V * T, S, H, DH).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * DH ** -0.5
        m = jnp.broadcast_to(
            mask.reshape(V * T, S)[:, None, None, :], logits.shape
        )
        logits = jnp.where(m, logits, -1e30)
        p = jax.nn.softmax(logits, axis=-1)
        km = keep.reshape(V * T, H, lq_pad, lk_pad)[:, :, :S, :S]
        w = jnp.where(km, p, 0.0) / (1.0 - rate)
        o = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
        return o.transpose(0, 2, 1, 3).reshape(V, T, S, D)

    out_k = flash_mha_train(q, k, v, H, key_mask=mask, dropout_rate=rate,
                            seed=seed, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(ref(q, k, v)), atol=3e-5
    )

    def loss(fn, q, k, v):
        o = fn(q, k, v)
        return (o * jnp.sin(o)).sum()

    g_ref = jax.grad(lambda *a: loss(ref, *a), argnums=(0, 1, 2))(q, k, v)
    g_k = jax.grad(
        lambda *a: loss(
            lambda q, k, v: flash_mha_train(
                q, k, v, H, key_mask=mask, dropout_rate=rate, seed=seed,
                interpret=True,
            ),
            *a,
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g_ref, g_k):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)


def test_mha_module_flash_train_path(qkv_mask, monkeypatch):
    """MultiHeadAttention routes train-mode calls through the flash kernel
    (VGQA_PALLAS_INTERPRET on CPU) and matches the XLA path at dropout=0."""
    monkeypatch.setenv("VGQA_PALLAS_INTERPRET", "1")
    from vgqa_tpu.models.layers import MultiHeadAttention

    q, _, _, mask = qkv_mask
    x = q[:, 0]                                  # [V, S, D]
    m = mask[:, 0]
    mha_fl = MultiHeadAttention(H, dropout=0.0, use_flash=True)
    mha_xla = MultiHeadAttention(H, dropout=0.0, use_flash=False)
    params = mha_xla.init(jax.random.PRNGKey(0), x, x, x, key_mask=m)

    def run(mod, p):
        return mod.apply(p, x, x, x, key_mask=m, deterministic=False,
                         rngs={"dropout": jax.random.PRNGKey(1)})

    np.testing.assert_allclose(
        np.asarray(run(mha_fl, params)), np.asarray(run(mha_xla, params)),
        atol=2e-5,
    )

    def loss(mod, p):
        return (run(mod, p) ** 2).sum()

    g_fl = jax.grad(lambda p: loss(mha_fl, p))(params)
    g_xla = jax.grad(lambda p: loss(mha_xla, p))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5
        ),
        g_fl, g_xla,
    )


def test_encoder_train_grad_through_flash(monkeypatch):
    """CrossModalEncoder with use_flash + dropout>0 in train mode:
    gradients flow, stay finite, and are deterministic per dropout rng."""
    monkeypatch.setenv("VGQA_PALLAS_INTERPRET", "1")
    from vgqa_tpu.models.encoder import CrossModalEncoder

    rng = np.random.RandomState(2)
    hw, L, d = 12, 6, 32
    enc = CrossModalEncoder(num_layers=2, num_heads=4, ffn_dim=64,
                            dropout=0.1, use_flash=True)
    args = (
        jnp.asarray(rng.randn(1, 2, hw, d), jnp.float32),
        jnp.asarray(rng.randn(1, 2, hw, d), jnp.float32),
        jnp.asarray(rng.randn(1, L, d), jnp.float32),
        jnp.asarray(rng.randn(1, hw, d), jnp.float32),
        jnp.ones((1, hw), bool),
        jnp.ones((1, L), bool),
        jnp.ones((1, 2), bool),
    )
    params = enc.init(jax.random.PRNGKey(0), *args, deterministic=True)

    def loss(p, key):
        out = enc.apply(p, *args, deterministic=False,
                        rngs={"dropout": key})
        return (out["encoded"] ** 2).mean()

    key = jax.random.PRNGKey(3)
    g1 = jax.grad(loss)(params, key)
    g2 = jax.grad(loss)(params, key)
    from jax.flatten_util import ravel_pytree

    flat1 = ravel_pytree(g1)[0]
    flat2 = ravel_pytree(g2)[0]
    assert bool(jnp.isfinite(flat1).all())
    assert jnp.array_equal(flat1, flat2)
    assert float(jnp.abs(flat1).max()) > 0


def test_supported_seq_bounds():
    assert supported_seq(418, 418)
    assert supported_seq(1024, 1024)
    assert not supported_seq(1025, 418)
