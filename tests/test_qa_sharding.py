"""QA engine under tensor parallelism: params sharded over a tp axis must
produce the same generation as replicated execution."""

import numpy as np
import pytest

from vgqa_tpu.qa import GenerationConfig, LLMConfig, QAEngine, ViTConfig


def test_llm_tp_sharded_generation_matches():
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    from vgqa_tpu.parallel import build_mesh, param_shardings

    engine = QAEngine.init_random(LLMConfig.tiny(), ViTConfig.tiny())
    s = engine.vit_cfg.image_size
    tiles = np.random.RandomState(0).rand(1, s, s, 3).astype(np.float32)
    gen = GenerationConfig(max_new_tokens=5, do_sample=False)

    baseline = engine.chat(tiles, "what?", gen)

    mesh = build_mesh(dp=1, tp=2)
    shardings = param_shardings(mesh, engine.params)
    # at least one leaf must actually shard over tp
    import jax.sharding as shd

    specs = jax.tree.leaves(
        jax.tree.map(lambda s_: s_.spec, shardings,
                     is_leaf=lambda x: isinstance(x, shd.NamedSharding))
    )
    assert any("tp" in str(s_) for s_ in specs), "no leaf sharded over tp"

    engine.params = jax.device_put(engine.params, shardings)
    with mesh:
        sharded = engine.chat(tiles, "what?", gen)
    assert sharded == baseline
