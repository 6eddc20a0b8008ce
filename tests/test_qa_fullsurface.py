"""Full-architecture QA converter surface + int8 x TP=2 combined paths.

Real 8B weights cannot exist in this offline environment, so this exercises
the converter on a synthetic dict with the REAL architecture surface:
all 32 InternLM2.5 layers, all 24 InternViT layers, the real 92553 vocab
and head/kv-head counts, real tile token counts — only the hidden widths
shrink (converter logic never branches on width). Every key must be
consumed; the converted tree must run, quantize, and generate identically
under TP=2 sharding.
"""

import numpy as np
import pytest

from vgqa_tpu.qa import GenerationConfig, LLMConfig, QAEngine, ViTConfig
from vgqa_tpu.qa.convert import convert_internvideo
from vgqa_tpu.models.convert import check_tree_shapes

# real architecture surface, narrow widths (hidden 4096->256 etc.)
FULL_LLM = LLMConfig(
    vocab_size=92553, hidden_size=256, num_layers=32, num_heads=32,
    num_kv_heads=8, intermediate_size=512, max_seq_len=2048,
)
FULL_VIT = ViTConfig(
    image_size=64, patch_size=16, hidden_size=64, num_layers=24,
    num_heads=8, intermediate_size=128, llm_hidden_size=256,
)


def _full_surface_sd(llm: LLMConfig, vit: ViTConfig):
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
    w("vision_model.embeddings.patch_embedding.weight", V, 3,
      vit.patch_size, vit.patch_size)
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
    shuffled = V * r * r
    w("mlp1.0.weight", shuffled)
    w("mlp1.0.bias", shuffled)
    w("mlp1.1.weight", vit.llm_hidden_size, shuffled)
    w("mlp1.1.bias", vit.llm_hidden_size)
    w("mlp1.3.weight", vit.llm_hidden_size, vit.llm_hidden_size)
    w("mlp1.3.bias", vit.llm_hidden_size)
    return sd


class _Tracking(dict):
    def __init__(self, data):
        super().__init__(data)
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return dict.__getitem__(self, k)

    def __contains__(self, k):
        return dict.__contains__(self, k)


def test_converter_consumes_every_key_full_surface():
    """Every key of a full-architecture InternVideo2.5 state dict (32 LLM
    layers, 24 ViT layers, 92553 vocab) must be consumed — no silent drops
    when the real checkpoint arrives."""
    import vgqa_tpu.qa.convert as cv

    sd = _full_surface_sd(FULL_LLM, FULL_VIT)
    tracker = _Tracking(sd)

    # convert_internvideo re-keys through strip(); track reads at the
    # converter functions instead by wrapping the stripped dicts
    orig_lm, orig_vit = cv.convert_internlm2, cv.convert_internvit
    read_keys = set()

    def track_lm(d, cfg):
        t = _Tracking(d)
        out = orig_lm(t, cfg)
        read_keys.update("language_model." + k for k in t.read)
        return out

    def track_vit(d, cfg, mlp1):
        t, tm = _Tracking(d), _Tracking(mlp1)
        out = orig_vit(t, cfg, tm)
        read_keys.update("vision_model." + k for k in t.read)
        read_keys.update("mlp1." + k for k in tm.read)
        return out

    cv.convert_internlm2, cv.convert_internvit = track_lm, track_vit
    try:
        converted = cv.convert_internvideo(tracker, FULL_LLM, FULL_VIT)
    finally:
        cv.convert_internlm2, cv.convert_internvit = orig_lm, orig_vit

    unread = set(sd) - read_keys
    assert not unread, f"converter ignored {len(unread)} keys: {sorted(unread)[:5]}"

    # shapes line up with a same-config engine
    engine = QAEngine.init_random(FULL_LLM, FULL_VIT)
    check_tree_shapes(converted["llm"], engine.params["llm"])
    check_tree_shapes(converted["embed"], engine.params["embed"])
    check_tree_shapes(converted["vision"], engine.params["vision"])


def test_converted_full_surface_int8_tp2_generation():
    """Converted full-surface weights, int8-quantized, sharded TP=2: the
    combination must generate and match its replicated-bf16-free baseline
    (int8 replicated vs int8 sharded)."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    import jax.numpy as jnp

    from vgqa_tpu.parallel import build_mesh, param_shardings
    from vgqa_tpu.qa.quant import quantize_llm_params

    sd = _full_surface_sd(FULL_LLM, FULL_VIT)
    converted = convert_internvideo(sd, FULL_LLM, FULL_VIT)
    converted["llm"] = quantize_llm_params(converted["llm"])
    params = jax.tree.map(jnp.asarray, converted)

    engine = QAEngine(FULL_LLM, FULL_VIT, params)
    s = FULL_VIT.image_size
    tiles = np.random.RandomState(1).rand(1, s, s, 3).astype(np.float32)
    gen = GenerationConfig(max_new_tokens=4, do_sample=False)
    baseline = engine.chat(tiles, "what?", gen)
    assert isinstance(baseline, str)

    mesh = build_mesh(dp=1, tp=2)
    shardings = param_shardings(mesh, engine.params)
    engine.params = jax.device_put(engine.params, shardings)
    with mesh:
        sharded = engine.chat(tiles, "what?", gen)
    assert sharded == baseline

    # int8 quantized weights through the BATCHED decode (per-row [B]
    # cache_index writes in llm_forward) must match solo greedy too
    with mesh:
        batched = engine.chat_batch(
            [(tiles, "what?"), (tiles, "and then what happened?")], gen
        )
    assert batched[0] == baseline
