"""Numerical parity vs torch re-implementations of the reference's layer
math (torch runs CPU-only here). These rebuild the *semantics* of the
reference modules (double projection in decoder self-attention, per-head
[content|sine] concat cross-attention, post-LN encoder layers) with torch
primitives, push identical weights through both frameworks, and require
outputs to match to float tolerance.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from vgqa_tpu.models.encoder import EncoderLayer
from vgqa_tpu.ops.attention import dot_product_attention


def _np(x):
    return x.detach().cpu().numpy()


def _mha_weights_to_flax(mha: "torch.nn.MultiheadAttention", d: int):
    w = _np(mha.in_proj_weight)
    b = _np(mha.in_proj_bias)
    return {
        "q_proj": {"kernel": w[:d].T, "bias": b[:d]},
        "k_proj": {"kernel": w[d : 2 * d].T, "bias": b[d : 2 * d]},
        "v_proj": {"kernel": w[2 * d :].T, "bias": b[2 * d :]},
        "out_proj": {
            "kernel": _np(mha.out_proj.weight).T,
            "bias": _np(mha.out_proj.bias),
        },
    }


def test_encoder_layer_matches_torch_reference():
    """Reference TransformerEncoderLayer (modal_encoder.py:143-178):
    q=k=src+pos self-attn, post-LN, ReLU FFN."""
    torch.manual_seed(0)
    d, heads, ffn, S, T = 16, 4, 32, 10, 3

    mha = torch.nn.MultiheadAttention(d, heads, dropout=0.0)
    linear1 = torch.nn.Linear(d, ffn)
    linear2 = torch.nn.Linear(ffn, d)
    norm1 = torch.nn.LayerNorm(d)
    norm2 = torch.nn.LayerNorm(d)

    src = torch.randn(S, T, d)  # [seq, batch(frames), d]
    pos = torch.randn(S, T, d)
    key_padding = torch.zeros(T, S, dtype=torch.bool)
    key_padding[:, -2:] = True  # last two tokens padded

    with torch.no_grad():
        q = k = src + pos
        attn, _ = mha(q, k, src, key_padding_mask=key_padding)
        h = norm1(src + attn)
        ffn_out = linear2(torch.relu(linear1(h)))
        ref = norm2(h + ffn_out)

    params = {
        "self_attn": _mha_weights_to_flax(mha, d),
        "ffn": {
            "linear1": {"kernel": _np(linear1.weight).T, "bias": _np(linear1.bias)},
            "linear2": {"kernel": _np(linear2.weight).T, "bias": _np(linear2.bias)},
        },
        "norm1": {"scale": _np(norm1.weight), "bias": _np(norm1.bias)},
        "norm2": {"scale": _np(norm2.weight), "bias": _np(norm2.bias)},
    }
    layer = EncoderLayer(num_heads=heads, ffn_dim=ffn, dropout=0.0)
    # ours: [V=1, T, S, d] with True=valid masks
    src_j = jnp.asarray(_np(src).transpose(1, 0, 2)[None])
    pos_j = jnp.asarray(_np(pos).transpose(1, 0, 2)[None])
    mask_j = jnp.asarray(~_np(key_padding)[None])
    out = layer.apply(
        {"params": jax.tree.map(jnp.asarray, params)}, src_j, pos_j, mask_j
    )
    np.testing.assert_allclose(
        np.asarray(out)[0], _np(ref).transpose(1, 0, 2), atol=2e-5
    )


def test_attention_core_matches_torch_mha_no_proj():
    """The custom no-input-projection attention
    (decoder/attention.py:13-260): embed 2c q/k, c v, scale (2c/H)^-0.5."""
    torch.manual_seed(1)
    c, heads, Lq, Lk = 16, 4, 3, 11
    q = torch.randn(Lq, 1, 2 * c)
    k = torch.randn(Lk, 1, 2 * c)
    v = torch.randn(Lk, 1, c)

    # torch reference math (attention.py:148-260 simplified, no dropout)
    head_dim = 2 * c // heads
    v_head = c // heads
    with torch.no_grad():
        qh = (q * head_dim**-0.5).view(Lq, heads, head_dim).transpose(0, 1)
        kh = k.view(Lk, heads, head_dim).transpose(0, 1)
        vh = v.view(Lk, heads, v_head).transpose(0, 1)
        attn = torch.softmax(qh @ kh.transpose(-2, -1), dim=-1)
        ref = (attn @ vh).transpose(0, 1).reshape(Lq, c)

    out = dot_product_attention(
        jnp.asarray(_np(q).transpose(1, 0, 2)),
        jnp.asarray(_np(k).transpose(1, 0, 2)),
        jnp.asarray(_np(v).transpose(1, 0, 2)),
        heads,
        scale=head_dim**-0.5,
    )
    np.testing.assert_allclose(np.asarray(out)[0], _np(ref), atol=2e-5)


def test_frozen_bn_matches_torch_semantics():
    """FrozenBatchNorm2d (backbone.py:13-57) == folded scale/bias."""
    torch.manual_seed(2)
    n = 8
    w = torch.rand(n) + 0.5
    b = torch.randn(n)
    mean = torch.randn(n)
    var = torch.rand(n) + 0.5
    x = torch.randn(2, n, 4, 4)
    with torch.no_grad():
        scale_t = w * (var + 1e-5).rsqrt()
        bias_t = b - mean * scale_t
        ref = x * scale_t.reshape(1, -1, 1, 1) + bias_t.reshape(1, -1, 1, 1)

    from vgqa_tpu.models.convert import _fold_bn

    sd = {
        "bn.weight": _np(w), "bn.bias": _np(b),
        "bn.running_mean": _np(mean), "bn.running_var": _np(var),
    }
    folded = _fold_bn(sd, "bn")
    x_nhwc = _np(x).transpose(0, 2, 3, 1)
    ours = x_nhwc * folded["scale"] + folded["bias"]
    np.testing.assert_allclose(
        ours, _np(ref).transpose(0, 2, 3, 1), atol=1e-5
    )


def test_roberta_layer_vs_torch_manual():
    """Post-LN BERT layer math (bert_module.py) using torch linears."""
    torch.manual_seed(3)
    d, heads, L = 16, 4, 6
    qp, kp, vp, op = (torch.nn.Linear(d, d) for _ in range(4))
    inter = torch.nn.Linear(d, 32)
    outp = torch.nn.Linear(32, d)
    ln1 = torch.nn.LayerNorm(d, eps=1e-5)
    ln2 = torch.nn.LayerNorm(d, eps=1e-5)
    x = torch.randn(1, L, d)

    with torch.no_grad():
        q = qp(x).view(1, L, heads, d // heads).transpose(1, 2)
        k = kp(x).view(1, L, heads, d // heads).transpose(1, 2)
        v = vp(x).view(1, L, heads, d // heads).transpose(1, 2)
        a = torch.softmax(q @ k.transpose(-2, -1) / (d // heads) ** 0.5, -1)
        ctx = (a @ v).transpose(1, 2).reshape(1, L, d)
        h = ln1(x + op(ctx))
        ref = ln2(h + outp(torch.nn.functional.gelu(inter(h))))

    from vgqa_tpu.models.roberta import RobertaLayer, RobertaConfig

    cfg = RobertaConfig(hidden_size=d, num_heads=heads, intermediate_size=32,
                        dropout=0.0)
    params = {
        "attention": {
            "q_proj": {"kernel": _np(qp.weight).T, "bias": _np(qp.bias)},
            "k_proj": {"kernel": _np(kp.weight).T, "bias": _np(kp.bias)},
            "v_proj": {"kernel": _np(vp.weight).T, "bias": _np(vp.bias)},
            "out_proj": {"kernel": _np(op.weight).T, "bias": _np(op.bias)},
        },
        "attention_ln": {"scale": _np(ln1.weight), "bias": _np(ln1.bias)},
        "intermediate": {"kernel": _np(inter.weight).T, "bias": _np(inter.bias)},
        "output": {"kernel": _np(outp.weight).T, "bias": _np(outp.bias)},
        "output_ln": {"scale": _np(ln2.weight), "bias": _np(ln2.bias)},
    }
    layer = RobertaLayer(cfg)
    out = layer.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(_np(x)), jnp.ones((1, L), bool),
    )
    np.testing.assert_allclose(np.asarray(out), _np(ref), atol=2e-5)
