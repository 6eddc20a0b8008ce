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


def test_pos_decoder_layer_cross_attention_vs_torch():
    """PosDecoderLayer's time-aligned concat cross-attention
    (query_decoder.py:299-369): per-head [content|sine] q of 2c dims,
    per-head [content|pos] k of 2c dims, c-dim v, scale (2c/H)^-0.5,
    per-frame single-query attention, out-proj + residual + LN + FFN."""
    torch.manual_seed(4)
    c, heads, T, S = 16, 4, 3, 9
    dh = c // heads

    proj = {
        name: torch.nn.Linear(c, c)
        for name in ("qc", "kc", "vv", "kp", "sine", "cross_out")
    }
    linear1 = torch.nn.Linear(c, 32)
    linear2 = torch.nn.Linear(32, c)
    norm3 = torch.nn.LayerNorm(c)
    norm4 = torch.nn.LayerNorm(c)

    tgt = torch.randn(T, 1, c)          # [t, b=1, c]
    memory = torch.randn(S, T, c)       # [tokens, frames, c]
    mem_pos = torch.randn(S, T, c)
    query_sine = torch.randn(T, 1, c)

    with torch.no_grad():
        # the flax layer applies norm1 after (zeroed) self-attention; a
        # scale=1/bias=0 LayerNorm still normalizes, so mirror it here
        tgt = torch.nn.functional.layer_norm(tgt, (c,))
        q_content = proj["qc"](tgt)
        k_content = proj["kc"](memory)
        v = proj["vv"](memory)
        k_pos = proj["kp"](mem_pos)
        sine = proj["sine"](query_sine)

        # per-head concat (query_decoder.py:319-333)
        q = torch.cat(
            [q_content.view(T, 1, heads, dh), sine.view(T, 1, heads, dh)],
            dim=3,
        ).view(T, 1, 2 * c)
        k = torch.cat(
            [k_content.view(S, T, heads, dh), k_pos.view(S, T, heads, dh)],
            dim=3,
        ).view(S, T, 2 * c)

        # per-frame single-query attention, custom scaling (attention.py:151)
        hd2 = 2 * c // heads
        qh = (q[:, 0] * hd2**-0.5).view(T, heads, hd2).transpose(0, 1)  # [H,T,hd2]
        kh = k.view(S, T, heads, hd2).permute(2, 1, 0, 3)               # [H,T,S,hd2]
        vh = v.view(S, T, heads, dh).permute(2, 1, 0, 3)                # [H,T,S,dh]
        attn = torch.softmax(
            torch.einsum("htd,htsd->hts", qh, kh), dim=-1
        )
        ctx = torch.einsum("hts,htsd->htd", attn, vh)                   # [H,T,dh]
        ctx = ctx.permute(1, 0, 2).reshape(T, c)
        tgt2 = proj["cross_out"](ctx).unsqueeze(1)
        h = norm3(tgt + tgt2)
        ref = norm4(h + linear2(torch.relu(linear1(h))))

    from vgqa_tpu.models.decoder import PosDecoderLayer

    def dense(p):
        return {"kernel": _np(p.weight).T, "bias": _np(p.bias)}

    # self-attention weights must exist but are bypassed by feeding the
    # post-self-attention target directly: build the layer and run only the
    # cross-attention by mimicking with zeroed self-attn... instead compare
    # the cross path by constructing a layer whose self-attn output is the
    # identity: set sa_v to zero so self-attn adds nothing, and norm1 to
    # identity.
    d = c
    zeros_dense = {"kernel": np.zeros((d, d), np.float32),
                   "bias": np.zeros((d,), np.float32)}
    identity_ln = {"scale": np.ones((d,), np.float32),
                   "bias": np.zeros((d,), np.float32)}
    params = {
        "sa_qcontent": zeros_dense, "sa_qtime": zeros_dense,
        "sa_qpos": zeros_dense, "sa_kcontent": zeros_dense,
        "sa_ktime": zeros_dense, "sa_kpos": zeros_dense,
        "sa_v": zeros_dense,
        "self_attn": {
            "q_proj": zeros_dense, "k_proj": zeros_dense,
            "v_proj": zeros_dense, "out_proj": zeros_dense,
        },
        "norm1": identity_ln,
        "ca_qcontent": dense(proj["qc"]),
        "ca_kcontent": dense(proj["kc"]),
        "ca_v": dense(proj["vv"]),
        "ca_kpos": dense(proj["kp"]),
        "ca_qpos_sine": dense(proj["sine"]),
        "cross_out": dense(proj["cross_out"]),
        "ffn": {"linear1": dense(linear1), "linear2": dense(linear2)},
        "norm3": {"scale": _np(norm3.weight), "bias": _np(norm3.bias)},
        "norm4": {"scale": _np(norm4.weight), "bias": _np(norm4.bias)},
    }
    # norm1 as identity means tgt entering cross-attn equals the raw input
    layer = PosDecoderLayer(num_heads=heads, ffn_dim=32, dropout=0.0,
                            is_first=False)
    out = layer.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(_np(tgt).transpose(1, 0, 2)),       # [V=1, T, c]
        jnp.zeros((1, T, c)),                            # query_pos (unused: not first)
        jnp.zeros((1, T, c)),                            # query_time (projected by zeros)
        jnp.asarray(_np(query_sine).transpose(1, 0, 2)),
        jnp.asarray(_np(memory).transpose(1, 0, 2)[None]),   # [1, T, S, c]
        jnp.asarray(_np(mem_pos).transpose(1, 0, 2)[None]),
        jnp.ones((1, T, S), bool),
        jnp.ones((1, T), bool),
    )
    np.testing.assert_allclose(
        np.asarray(out)[0], _np(ref)[:, 0], atol=3e-5
    )


def test_sine_hw_position_matches_torch_reference():
    """PositionEmbeddingSineHW (position_encoding.py:7-47) with the builder's
    (20, 20) temperatures, rebuilt in torch, vs sine_position_hw_2d."""
    import math

    from vgqa_tpu.ops.position_encoding import sine_position_hw_2d

    n_feats, th, tw = 8, 20.0, 20.0
    mask_np = np.zeros((1, 5, 7), bool)
    mask_np[:, :4, :6] = True  # True=valid (ours); torch ref uses inverted

    not_mask = torch.from_numpy(mask_np).float()
    y_embed = not_mask.cumsum(1)
    x_embed = not_mask.cumsum(2)
    eps, scale = 1e-6, 2 * math.pi
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_tx = torch.arange(n_feats, dtype=torch.float32)
    dim_tx = tw ** (2 * torch.div(dim_tx, 2, rounding_mode="floor") / n_feats)
    pos_x = x_embed[:, :, :, None] / dim_tx
    dim_ty = torch.arange(n_feats, dtype=torch.float32)
    dim_ty = th ** (2 * torch.div(dim_ty, 2, rounding_mode="floor") / n_feats)
    pos_y = y_embed[:, :, :, None] / dim_ty
    pos_x = torch.stack(
        (pos_x[:, :, :, 0::2].sin(), pos_x[:, :, :, 1::2].cos()), dim=4
    ).flatten(3)
    pos_y = torch.stack(
        (pos_y[:, :, :, 0::2].sin(), pos_y[:, :, :, 1::2].cos()), dim=4
    ).flatten(3)
    expected = torch.cat((pos_y, pos_x), dim=3)  # [1, H, W, 2*n]

    got = sine_position_hw_2d(
        jnp.asarray(mask_np), num_pos_feats=n_feats,
        temperature_h=th, temperature_w=tw,
    )
    np.testing.assert_allclose(np.asarray(got), _np(expected), atol=1e-5)


def test_learned_position_2d_matches_torch_reference():
    """PositionEmbeddingLearned (position_encoding.py:94-128): x-embed then
    y-embed channel order from row/col tables."""
    from vgqa_tpu.models.layers import LearnedPosition2D

    n = 4
    mod = LearnedPosition2D(num_pos_feats=n, table_size=50)
    params = mod.init(jax.random.PRNGKey(0), 3, 5)
    row = np.asarray(params["params"]["row_embed"])
    col = np.asarray(params["params"]["col_embed"])

    t_row = torch.nn.Embedding(50, n)
    t_col = torch.nn.Embedding(50, n)
    with torch.no_grad():
        t_row.weight.copy_(torch.from_numpy(row))
        t_col.weight.copy_(torch.from_numpy(col))
    h, w = 3, 5
    x_emb = t_col(torch.arange(w))
    y_emb = t_row(torch.arange(h))
    expected = torch.cat(
        [x_emb.unsqueeze(0).repeat(h, 1, 1), y_emb.unsqueeze(1).repeat(1, w, 1)],
        dim=-1,
    )

    got = mod.apply(params, h, w)
    np.testing.assert_allclose(np.asarray(got), _np(expected), atol=1e-6)
