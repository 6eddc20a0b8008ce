import numpy as np
import pytest

from vgqa_tpu.qa import LLMConfig, QAEngine, ViTConfig
from vgqa_tpu.qa.convert import (
    convert_internvideo,
    split_internlm2_wqkv,
)
from vgqa_tpu.models.convert import check_tree_shapes


def test_wqkv_split_layout():
    """Hand-built fused wqkv with recognizable rows must de-interleave to
    the right heads."""
    H, KVH, hd, D = 4, 2, 2, 3
    group = H // KVH
    rows = []
    # group-major layout: per kv group [q0..q_{group-1}, k, v]
    label = 0
    for g in range(KVH):
        for _ in range(group + 2):
            for _ in range(hd):
                rows.append(np.full(D, label, np.float32))
                label += 1
    w = np.stack(rows)
    wq, wk, wv = split_internlm2_wqkv(w, H, KVH, hd)
    assert wq.shape == (H * hd, D)
    assert wk.shape == (KVH * hd, D) and wv.shape == (KVH * hd, D)
    # group 0: rows 0..3 are q heads, 4..5 k, 6..7 v
    np.testing.assert_array_equal(wq[0], np.full(D, 0))
    np.testing.assert_array_equal(wk[0], np.full(D, 4))
    np.testing.assert_array_equal(wv[0], np.full(D, 6))
    # group 1 begins at row 8
    np.testing.assert_array_equal(wq[group * hd], np.full(D, 8))
    np.testing.assert_array_equal(wk[hd], np.full(D, 12))


def _fake_internvideo_sd(llm: LLMConfig, vit: ViTConfig):
    rng = np.random.RandomState(0)
    sd = {}

    def w(name, *shape):
        sd[name] = rng.randn(*shape).astype(np.float32) * 0.02

    D = llm.hidden_size
    fused = (llm.num_heads + 2 * llm.num_kv_heads) * llm.head_dim
    for i in range(llm.num_layers):
        p = f"language_model.model.layers.{i}"
        w(f"{p}.attention.wqkv.weight", fused, D)
        w(f"{p}.attention.wo.weight", D, llm.num_heads * llm.head_dim)
        w(f"{p}.feed_forward.w1.weight", llm.intermediate_size, D)
        w(f"{p}.feed_forward.w3.weight", llm.intermediate_size, D)
        w(f"{p}.feed_forward.w2.weight", D, llm.intermediate_size)
        w(f"{p}.attention_norm.weight", D)
        w(f"{p}.ffn_norm.weight", D)
    w("language_model.model.norm.weight", D)
    w("language_model.output.weight", llm.vocab_size, D)
    w("language_model.model.tok_embeddings.weight", llm.vocab_size, D)

    V = vit.hidden_size
    g = vit.grid
    w("vision_model.embeddings.class_embedding", 1, 1, V)
    w("vision_model.embeddings.position_embedding", 1, g * g + 1, V)
    w("vision_model.embeddings.patch_embedding.weight", V, 3, vit.patch_size,
      vit.patch_size)
    w("vision_model.embeddings.patch_embedding.bias", V)
    for i in range(vit.num_layers):
        p = f"vision_model.encoder.layers.{i}"
        w(f"{p}.attn.qkv.weight", 3 * V, V)
        w(f"{p}.attn.qkv.bias", 3 * V)
        w(f"{p}.attn.proj.weight", V, V)
        w(f"{p}.attn.proj.bias", V)
        w(f"{p}.ls1", V)
        w(f"{p}.ls2", V)
        w(f"{p}.norm1.weight", V)
        w(f"{p}.norm1.bias", V)
        w(f"{p}.norm2.weight", V)
        w(f"{p}.norm2.bias", V)
        w(f"{p}.mlp.fc1.weight", vit.intermediate_size, V)
        w(f"{p}.mlp.fc1.bias", vit.intermediate_size)
        w(f"{p}.mlp.fc2.weight", V, vit.intermediate_size)
        w(f"{p}.mlp.fc2.bias", V)
    r = int(1 / vit.downsample_ratio)
    shuffled_dim = V * r * r
    w("mlp1.0.weight", shuffled_dim)
    w("mlp1.0.bias", shuffled_dim)
    w("mlp1.1.weight", vit.llm_hidden_size, shuffled_dim)
    w("mlp1.1.bias", vit.llm_hidden_size)
    w("mlp1.3.weight", vit.llm_hidden_size, vit.llm_hidden_size)
    w("mlp1.3.bias", vit.llm_hidden_size)
    return sd


def test_internvideo_conversion_structure():
    llm_cfg = LLMConfig.tiny()
    vit_cfg = ViTConfig.tiny()
    sd = _fake_internvideo_sd(llm_cfg, vit_cfg)
    converted = convert_internvideo(sd, llm_cfg, vit_cfg)

    engine = QAEngine.init_random(llm_cfg, vit_cfg)
    check_tree_shapes(converted["llm"], engine.params["llm"])
    check_tree_shapes(converted["embed"], engine.params["embed"])
    check_tree_shapes(converted["vision"], engine.params["vision"])

    # the converted weights must run end-to-end through the engine
    import jax.numpy as jnp
    import jax

    engine2 = QAEngine(
        llm_cfg, vit_cfg, jax.tree.map(jnp.asarray, converted)
    )
    s = vit_cfg.image_size
    tiles = np.random.RandomState(1).rand(1, s, s, 3).astype(np.float32)
    from vgqa_tpu.qa import GenerationConfig

    answer = engine2.chat(
        tiles, "hi", GenerationConfig(max_new_tokens=3, do_sample=False)
    )
    assert isinstance(answer, str)
