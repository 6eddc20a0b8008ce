"""Weight-converter tests, including numerics parity vs torch where a torch
reference is constructible offline (HF transformers RobertaModel)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vgqa_tpu.models.convert import (
    check_tree_shapes,
    convert_resnet,
    convert_roberta,
    convert_video_swin,
    torch_state_dict_to_numpy,
)


def test_roberta_numerics_match_hf():
    """Random tiny HF RobertaModel vs our flax tower on identical weights."""
    torch = pytest.importorskip("torch")
    from transformers import RobertaConfig as HFConfig, RobertaModel as HFModel

    hf_cfg = HFConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=1, pad_token_id=1,
    )
    torch.manual_seed(0)
    hf = HFModel(hf_cfg).eval()

    ids = np.array([[0, 9, 17, 44, 2, 1, 1]], np.int64)
    mask = (ids != 1).astype(np.int64)
    with torch.no_grad():
        out = hf(torch.tensor(ids), attention_mask=torch.tensor(mask))
    hf_hidden = out.last_hidden_state.numpy()
    hf_pooled = out.pooler_output.numpy()

    from vgqa_tpu.models.roberta import RobertaConfig, RobertaModel

    cfg = RobertaConfig(
        vocab_size=120, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=40, dropout=0.0,
    )
    model = RobertaModel(cfg)
    params0 = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(mask.astype(bool)),
    )
    converted = convert_roberta(
        torch_state_dict_to_numpy(hf.state_dict()), num_layers=2
    )
    check_tree_shapes(converted, params0["params"])
    hidden, pooled = model.apply(
        {"params": jax.tree.map(jnp.asarray, converted)},
        jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(mask.astype(bool)),
    )
    # padded positions differ (HF computes them, we don't care) — compare
    # valid positions only
    np.testing.assert_allclose(
        np.asarray(hidden)[0, :5], hf_hidden[0, :5], atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(pooled), hf_pooled, atol=2e-4)


def _fake_resnet_sd(depths, width=8):
    rng = np.random.RandomState(0)
    sd = {}

    def bn(prefix, n):
        sd[f"{prefix}.weight"] = rng.rand(n).astype(np.float32) + 0.5
        sd[f"{prefix}.bias"] = rng.randn(n).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.randn(n).astype(np.float32)
        sd[f"{prefix}.running_var"] = rng.rand(n).astype(np.float32) + 0.5

    sd["conv1.weight"] = rng.randn(width, 3, 7, 7).astype(np.float32)
    bn("bn1", width)
    inp = width
    for s, blocks in enumerate(depths):
        planes = width * 2**s
        for b in range(blocks):
            p = f"layer{s + 1}.{b}"
            sd[f"{p}.conv1.weight"] = rng.randn(planes, inp, 1, 1).astype(np.float32)
            bn(f"{p}.bn1", planes)
            sd[f"{p}.conv2.weight"] = rng.randn(planes, planes, 3, 3).astype(np.float32)
            bn(f"{p}.bn2", planes)
            sd[f"{p}.conv3.weight"] = rng.randn(4 * planes, planes, 1, 1).astype(np.float32)
            bn(f"{p}.bn3", planes * 4)
            if b == 0:
                sd[f"{p}.downsample.0.weight"] = rng.randn(
                    4 * planes, inp, 1, 1
                ).astype(np.float32)
                bn(f"{p}.downsample.1", planes * 4)
            inp = planes * 4
    return sd


def test_resnet_structure_and_bn_fold():
    from vgqa_tpu.models.resnet import build_resnet

    depths = (1, 1, 1, 1)
    sd = _fake_resnet_sd(depths)
    converted = convert_resnet(sd, depths)

    model = build_resnet("resnet_test")
    params0 = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    check_tree_shapes(converted, params0["params"])

    # BN folding math: y = (x - mean)/sqrt(var+eps)*w + b == x*scale + bias
    x = np.linspace(-2, 2, 8).astype(np.float32)
    w, b = sd["bn1.weight"], sd["bn1.bias"]
    mean, var = sd["bn1.running_mean"], sd["bn1.running_var"]
    expected = (x - mean) / np.sqrt(var + 1e-5) * w + b
    got = x * converted["bn1"]["scale"] + converted["bn1"]["bias"]
    np.testing.assert_allclose(got, expected, atol=1e-5)

    # converted weights must produce finite outputs through the real model
    y = model.apply({"params": jax.tree.map(jnp.asarray, converted)},
                    jnp.ones((1, 64, 64, 3)) * 0.1)
    assert np.isfinite(np.asarray(y)).all()


def test_video_swin_structure_and_temporal_sum():
    from vgqa_tpu.models.video_swin import VideoSwinBackbone, VideoSwinConfig

    cfg = VideoSwinConfig.tiny_test()
    rng = np.random.RandomState(1)
    sd = {}
    C = cfg.embed_dim

    def dense(prefix, i, o):
        sd[f"{prefix}.weight"] = rng.randn(o, i).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.randn(o).astype(np.float32)

    def ln(prefix, n):
        sd[f"{prefix}.weight"] = rng.rand(n).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.randn(n).astype(np.float32)

    # (2, 4, 4) patch kernel like the K400 checkpoint
    sd["patch_embed.proj.weight"] = rng.randn(C, 3, 2, 4, 4).astype(np.float32)
    sd["patch_embed.proj.bias"] = rng.randn(C).astype(np.float32)
    ln("patch_embed.norm", C)
    wd, wh, ww = cfg.window
    tbl = (2 * wd - 1) * (2 * wh - 1) * (2 * ww - 1)
    for s, blocks in enumerate(cfg.depths):
        dim = C * 2**s
        for b in range(blocks):
            p = f"layers.{s}.blocks.{b}"
            ln(f"{p}.norm1", dim)
            sd[f"{p}.attn.relative_position_bias_table"] = rng.randn(
                tbl, cfg.num_heads[s]
            ).astype(np.float32)
            dense(f"{p}.attn.qkv", dim, 3 * dim)
            dense(f"{p}.attn.proj", dim, dim)
            ln(f"{p}.norm2", dim)
            dense(f"{p}.mlp.fc1", dim, int(dim * cfg.mlp_ratio))
            dense(f"{p}.mlp.fc2", int(dim * cfg.mlp_ratio), dim)
        if s < len(cfg.depths) - 1:
            ln(f"layers.{s}.downsample.norm", 4 * dim)
            sd[f"layers.{s}.downsample.reduction.weight"] = rng.randn(
                2 * dim, 4 * dim
            ).astype(np.float32)

    converted = convert_video_swin(sd, cfg.depths)
    # temporal patch kernel summed 2 -> 1
    assert converted["patch_embed_kernel"].shape[0] == 1
    np.testing.assert_allclose(
        converted["patch_embed_kernel"][0],
        np.transpose(sd["patch_embed.proj.weight"].sum(2), (2, 3, 1, 0)),
        atol=1e-6,
    )

    model = VideoSwinBackbone(cfg)
    params0 = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 16, 16, 3)))
    check_tree_shapes(converted, params0["params"])
    out = model.apply(
        {"params": jax.tree.map(jnp.asarray, converted)},
        jnp.ones((1, 4, 16, 16, 3)) * 0.1,
    )
    assert np.isfinite(np.asarray(out["1"])).all()


def test_check_tree_shapes_rejects_mismatch():
    with pytest.raises(ValueError):
        check_tree_shapes({"a": np.zeros(3)}, {"a": np.zeros(4)})
    with pytest.raises(ValueError):
        check_tree_shapes({"a": np.zeros(3)}, {"b": np.zeros(3)})
