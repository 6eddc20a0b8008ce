"""End-to-end parity toolchain: reference-style checkpoint -> converter ->
orbax save -> evaluate CLI path. Validates the exact pipeline that will be
used to measure accuracy parity once real VidSTG data + the TA-STVG
checkpoint are supplied."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vgqa_tpu.config import build_default_cfg
from vgqa_tpu.data.synthetic import make_synthetic_dataset


def test_converted_checkpoint_through_eval(tmp_path):
    from tests.test_convert_grounding import _build_reference_state_dict
    from vgqa_tpu.models import GroundingConfig, VSTGNet
    from vgqa_tpu.models.convert_grounding import convert_grounding_reference
    from vgqa_tpu.training.checkpoint import CheckpointManager

    data_dir = str(tmp_path / "data")
    make_synthetic_dataset(data_dir, num_videos=1, frames_per_video=20)

    cfg = build_default_cfg()
    cfg.merge_from_file("configs/grounding_vidstg_tiny.yaml")
    cfg.DATA_DIR = data_dir
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.DATA_TRUNK = 1

    # convert a reference-shaped checkpoint and save it like the converter
    # CLI would
    sd = _build_reference_state_dict()
    converted = convert_grounding_reference(
        sd, enc_layers=2, dec_layers=2,
        resnet_depths=(1, 1, 1, 1), swin_depths=(1, 1, 1, 1), roberta_layers=2,
    )
    converted = jax.tree.map(jnp.asarray, converted)
    ckpt_dir = str(tmp_path / "ckpt")
    mgr = CheckpointManager(ckpt_dir)
    mgr.save("vidstg", converted)

    # load through the eval path (CheckpointManager restore onto init tree)
    model = VSTGNet(GroundingConfig.from_cfg(cfg))
    from vgqa_tpu.data.loader import make_data_loader
    from vgqa_tpu.data.metrics import build_evaluator
    from vgqa_tpu.training.evaluator import do_eval

    loader = make_data_loader(cfg, "test", global_batch=1)
    example = next(iter(make_data_loader(cfg, "test", global_batch=1)))
    params0 = model.init(
        jax.random.PRNGKey(0), example["video"], example["text"], train=False
    )
    restored = CheckpointManager(ckpt_dir, save_to_disk=False).load(
        params0, os.path.join(ckpt_dir, "vidstg")
    )
    assert restored is not None
    # restored weights equal the converted ones (spot check)
    np.testing.assert_allclose(
        np.asarray(restored["params"]["input_proj"]["bias"]),
        np.asarray(converted["params"]["input_proj"]["bias"]),
        atol=0,
    )

    evaluator = build_evaluator(cfg, None, mode="test")
    results = do_eval(cfg, "test", None, model, restored, loader, evaluator)
    assert any(k.endswith("_viou") for k in results)
    for k, v in results.items():
        assert np.isfinite(v), k


def test_converted_forward_deltas_reported(tmp_path, capsys):
    """End-to-end numerics evidence through converted weights on an
    identical real video input:

    * orbax save -> restore must be BIT-IDENTICAL (max-abs-delta == 0)
    * the fused Pallas serving path (interpret mode on CPU — the same
      kernels run natively on TPU) vs the inline XLA path must agree to
      float tolerance; max-abs errors are asserted AND reported.
    """
    import os as _os

    from tests.test_convert_grounding import _build_reference_state_dict
    from vgqa_tpu.data.tokenizer import batch_encode, build_tokenizer
    from vgqa_tpu.data.video_io import read_frames, uniform_sample_indices, video_info
    from vgqa_tpu.data.synthetic import write_synthetic_video
    from vgqa_tpu.models import GroundingConfig, VSTGNet
    from vgqa_tpu.models.convert_grounding import convert_grounding_reference
    from vgqa_tpu.training.checkpoint import CheckpointManager
    from vgqa_tpu.utils.containers import TextBatch, VideoBatch

    # real decoded video frames as the shared input
    video_path = str(tmp_path / "v.mp4")
    write_synthetic_video(video_path, 24, (64, 64), seed=7)
    total, fps, w0, h0 = video_info(video_path)
    ids = uniform_sample_indices(total, 8)
    frames = read_frames(video_path, ids).astype(np.float32) / 255.0

    sd = _build_reference_state_dict()
    converted = jax.tree.map(jnp.asarray, convert_grounding_reference(
        sd, enc_layers=2, dec_layers=2,
        resnet_depths=(1, 1, 1, 1), swin_depths=(1, 1, 1, 1),
        roberta_layers=2,
    ))

    cfg = GroundingConfig.tiny_test()
    model = VSTGNet(cfg)
    vb = VideoBatch(
        frames=jnp.asarray(frames)[None],
        pixel_mask=jnp.ones((1, 64, 64), bool),
        time_mask=jnp.ones((1, 8), bool),
    )
    tok = build_tokenizer(vocab_size=128)
    tids, tmask = batch_encode(tok, ["a green square moves right"], 8)
    tb = TextBatch(jnp.asarray(tids), jnp.asarray(tmask))

    out_direct = model.apply(converted, vb, tb, train=False)

    # 1) checkpoint round trip: bit-identical forward
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save("w", converted)
    restored = CheckpointManager(str(tmp_path / "ck"), save_to_disk=False).load(
        converted, str(tmp_path / "ck" / "w")
    )
    out_restored = model.apply(restored, vb, tb, train=False)
    d_boxes = float(jnp.max(jnp.abs(out_direct["pred_boxes"]
                                    - out_restored["pred_boxes"])))
    d_sted = float(jnp.max(jnp.abs(out_direct["pred_sted"]
                                   - out_restored["pred_sted"])))
    print(f"\n[parity] save/restore max-abs-delta: boxes={d_boxes:.3e} "
          f"sted={d_sted:.3e}")
    assert d_boxes == 0.0 and d_sted == 0.0

    # 2) fused serving path (same kernels as TPU, interpret on CPU) vs
    #    inline XLA path through the same converted weights
    import dataclasses

    cfg_f = dataclasses.replace(cfg, use_pallas_attention=True)
    model_f = VSTGNet(cfg_f)
    _os.environ["VGQA_PALLAS_INTERPRET"] = "1"
    try:
        out_fused = model_f.apply(converted, vb, tb, train=False)
    finally:
        _os.environ.pop("VGQA_PALLAS_INTERPRET")
    f_boxes = float(jnp.max(jnp.abs(out_direct["pred_boxes"]
                                    - out_fused["pred_boxes"])))
    f_sted = float(jnp.max(jnp.abs(out_direct["pred_sted"]
                                   - out_fused["pred_sted"])))
    print(f"[parity] fused-vs-inline max-abs-delta: boxes={f_boxes:.3e} "
          f"sted={f_sted:.3e}")
    assert f_boxes < 5e-4, f_boxes   # boxes are sigmoided (0..1 scale)
    assert f_sted < 5e-2, f_sted     # logits scale


def test_parity_run_dry_run(tmp_path):
    """tools/parity_run.py --dry-run must produce a complete
    PARITY_RESULT.json through the real convert -> key-account -> evaluate
    chain, and the --reference-json diff must pass against itself."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import parity_run

    out = str(tmp_path / "PARITY_RESULT.json")
    result = parity_run.main(["--dry-run", "--out", out])
    assert result["key_accounting"] == "exact"
    assert result["converted_leaves"] > 100
    assert set(result["headline"]) == {"m_tiou", "m_viou", "m_gt_viou"}
    for v in result["headline"].values():
        assert np.isfinite(v)
    assert result["pass"] is None  # no reference numbers supplied
    saved = json.load(open(out))
    assert saved["headline"] == result["headline"]

    # self-diff: identical numbers must pass the parity gate
    ref = str(tmp_path / "ref.json")
    json.dump(saved["metrics"], open(ref, "w"))
    result2 = parity_run.main(
        ["--dry-run", "--out", str(tmp_path / "r2.json"),
         "--reference-json", ref]
    )
    assert result2["pass"] is True
    assert all(d == 0.0 for d in result2["deltas"].values())


def test_parity_run_qa_gate(tmp_path):
    """--qa-gate with an UNquantized converted QA dir must run all three
    real-weights quantization gates (w8a8 prefill / int4 decode weights /
    int8 KV cache) inside the parity artifact, so asset day covers the
    grounding parity AND the QA quantization decisions in one command."""
    import dataclasses
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import parity_run

    from vgqa_tpu.qa import LLMConfig, QAEngine, ViTConfig
    from vgqa_tpu.training.checkpoint import CheckpointManager

    llm_cfg, vit_cfg = LLMConfig.tiny(), ViTConfig.tiny()
    eng = QAEngine.init_random(llm_cfg, vit_cfg)
    mdl = tmp_path / "model"
    CheckpointManager(str(mdl)).save("params", dict(eng.params))
    with open(mdl / "vgqa_tpu_config.json", "w") as f:
        json.dump({"llm": dataclasses.asdict(llm_cfg),
                   "vit": dataclasses.asdict(vit_cfg)}, f)

    out = str(tmp_path / "PARITY_RESULT.json")
    result = parity_run.main(
        ["--dry-run", "--out", out, "--qa-model-dir", str(mdl), "--qa-gate"]
    )
    assert "answer" in result["qa_smoke"]
    assert set(result["qa_gates"]) == {"w8a8", "int4", "kv8"}
    for wq, g in result["qa_gates"].items():
        # each gate must RUN to a verdict; the verdict itself is not
        # asserted — a tiny random model legitimately diverges on the
        # strict 64-token greedy match (real weights are the real gate)
        assert "error" not in g, (wq, g)
        assert isinstance(g["pass"], bool), (wq, g)
        assert g["criteria"], (wq, g)
    saved = json.load(open(out))
    assert saved["qa_gates"] == result["qa_gates"]
