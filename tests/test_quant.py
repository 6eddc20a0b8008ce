"""Weight-only int8 quantization + functional-forward parity tests."""

import jax
import jax.numpy as jnp
import numpy as np

from vgqa_tpu.qa import GenerationConfig, LLMConfig, QAEngine, ViTConfig
from vgqa_tpu.qa.llm_functional import embed_tokens, llm_forward
from vgqa_tpu.qa.quant import is_quantized, quant_matmul, quantize_llm_params


def test_functional_forward_matches_flax():
    """llm_forward over the raw tree must match the flax LLM module."""
    eng = QAEngine.init_random(LLMConfig.tiny(), ViTConfig.tiny())
    cfg = eng.llm_cfg
    ids = np.array([[5, 9, 30, 2]], np.int32)
    L = ids.shape[1]
    embeds = embed_tokens(eng.params["embed"], cfg, jnp.asarray(ids))
    pos = jnp.arange(L)[None]
    mask = jnp.tril(jnp.ones((1, L, L), bool))

    flax_logits, _ = eng.llm.apply(
        {"params": eng.params["llm"]}, embeds, pos, mask
    )
    fn_logits, _ = llm_forward(eng.params["llm"], cfg, embeds, pos, mask)
    np.testing.assert_allclose(
        np.asarray(fn_logits), np.asarray(flax_logits), atol=2e-4
    )


def test_quant_matmul_accuracy():
    rng = np.random.RandomState(0)
    w = rng.randn(64, 32).astype(np.float32) * 0.1
    x = rng.randn(4, 64).astype(np.float32)
    from vgqa_tpu.qa.quant import quantize_llm_params

    q = quantize_llm_params({"layer_0": {"q_proj": {"kernel": jnp.asarray(w)}}})
    qp = q["layer_0"]["q_proj"]
    assert qp["kernel_q"].dtype == jnp.int8
    out = quant_matmul(jnp.asarray(x), qp)
    ref = x @ w
    rel = np.abs(np.asarray(out) - ref).max() / np.abs(ref).max()
    assert rel < 0.02, rel


def test_quantized_engine_generates_similarly():
    eng = QAEngine.init_random(LLMConfig.tiny(), ViTConfig.tiny())
    s = eng.vit_cfg.image_size
    tiles = np.random.RandomState(0).rand(1, s, s, 3).astype(np.float32)
    gen = GenerationConfig(max_new_tokens=6, do_sample=False)
    baseline = eng.chat(tiles, "what?", gen)

    qparams = dict(eng.params)
    qparams["llm"] = quantize_llm_params(eng.params["llm"])
    assert is_quantized(qparams["llm"])
    qeng = QAEngine(eng.llm_cfg, eng.vit_cfg, qparams)
    quantized = qeng.chat(tiles, "what?", gen)
    # greedy decode from a random tiny model is sensitive; require the
    # engine to run and produce a string (parity is checked at matmul level)
    assert isinstance(quantized, str)
    # and the first-token logits should be close
    from vgqa_tpu.qa.llm_functional import llm_forward

    ids = np.array([[5, 9]], np.int32)
    embeds = embed_tokens(eng.params["embed"], eng.llm_cfg, jnp.asarray(ids))
    pos = jnp.arange(2)[None]
    mask = jnp.tril(jnp.ones((1, 2, 2), bool))
    full, _ = llm_forward(eng.params["llm"], eng.llm_cfg, embeds, pos, mask)
    quant, _ = llm_forward(qparams["llm"], eng.llm_cfg, embeds, pos, mask)
    denom = float(jnp.abs(full).max())
    rel = float(jnp.abs(full - quant).max()) / max(denom, 1e-6)
    assert rel < 0.05, rel
    del baseline, quantized


def test_quantized_memory_shrinks():
    eng = QAEngine.init_random(LLMConfig.tiny(), ViTConfig.tiny())

    def nbytes(tree):
        return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))

    full = nbytes(eng.params["llm"])
    quant = nbytes(quantize_llm_params(eng.params["llm"]))
    assert quant < 0.45 * full  # f32 -> int8 + small scales


def test_w8a8_prefill_numerics():
    """Dynamic int8 activations (W8A8 prefill path) must stay close to the
    weight-only int8 path, and the engine flag must produce a working chat
    with identical KV-cache layout (decode stays on the exact path)."""
    import os

    import jax.numpy as jnp
    import numpy as np

    from vgqa_tpu.qa import GenerationConfig, LLMConfig, QAEngine, ViTConfig
    from vgqa_tpu.qa.llm_functional import embed_tokens, llm_forward
    from vgqa_tpu.qa.quant import quantize_llm_params

    eng = QAEngine.init_random(LLMConfig.tiny(), ViTConfig.tiny())
    qllm = quantize_llm_params(eng.params["llm"])

    ids = np.array([[5, 9, 40, 7]], np.int32)
    embeds = embed_tokens(eng.params["embed"], eng.llm_cfg, jnp.asarray(ids))
    pos = jnp.arange(4)[None]
    mask = jnp.tril(jnp.ones((1, 4, 4), bool))
    w8, _ = llm_forward(qllm, eng.llm_cfg, embeds, pos, mask)
    w8a8, _ = llm_forward(qllm, eng.llm_cfg, embeds, pos, mask, w8a8=True)
    denom = float(jnp.abs(w8).max())
    rel = float(jnp.abs(w8 - w8a8).max()) / max(denom, 1e-6)
    assert rel < 0.08, rel

    # engine flag end-to-end (chunk-free prompt; greedy)
    os.environ["VGQA_W8A8_PREFILL"] = "1"
    try:
        qeng = QAEngine(eng.llm_cfg, eng.vit_cfg,
                        {**eng.params, "llm": qllm})
        assert qeng._w8a8_prefill
        s = qeng.vit_cfg.image_size
        tiles = np.random.RandomState(2).rand(1, s, s, 3).astype(np.float32)
        out = qeng.chat(tiles, "what?",
                        GenerationConfig(max_new_tokens=4, do_sample=False))
        assert isinstance(out, str)
    finally:
        del os.environ["VGQA_W8A8_PREFILL"]
