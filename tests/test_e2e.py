"""End-to-end smoke: synthetic dataset -> train -> checkpoint -> eval ->
inference predict. The hermetic counterpart of the reference's DATA_TRUNK
fast path (it ships no tests at all, SURVEY.md §4)."""

import json
import os

import numpy as np
import pytest

from vgqa_tpu.config import build_default_cfg
from vgqa_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data_dir = str(root / "data")
    out_dir = str(root / "out")
    make_synthetic_dataset(data_dir, num_videos=2, frames_per_video=24)
    cfg = build_default_cfg()
    cfg.merge_from_file("configs/grounding_vidstg_tiny.yaml")
    cfg.DATA_DIR = data_dir
    cfg.OUTPUT_DIR = out_dir
    cfg.DATA_TRUNK = 2
    cfg.SOLVER.TO_VAL = False
    cfg.TPU.MESH_DP = 1  # single-device data axis -> 2 items = 2 iterations
    return cfg, data_dir, out_dir


def test_train_eval_infer(env):
    cfg, data_dir, out_dir = env
    import sys

    sys.path.insert(0, "tools")
    from vgqa_tpu.utils.log_setup import setup_logger

    import importlib

    train_mod = importlib.import_module("train")
    logger = setup_logger("e2e-test", "")

    trainer = train_mod.Trainer(cfg, logger, seed=0)
    trainer.setup()
    assert trainer.max_iter == 2  # 2 items / 1 global batch x 1 epoch
    trainer.fit()
    assert int(trainer.state.step) == 2
    # final checkpoint tagged
    assert os.path.exists(os.path.join(out_dir, "last_checkpoint"))

    # evaluation over the synthetic test split
    from vgqa_tpu.data.loader import make_data_loader
    from vgqa_tpu.data.metrics import build_evaluator
    from vgqa_tpu.training.evaluator import do_eval

    evaluator = build_evaluator(cfg, logger, mode="test")
    loader = make_data_loader(cfg, "test", global_batch=1)
    results = do_eval(cfg, "test", logger, trainer.model, trainer.eval_params(),
                      loader, evaluator)
    assert any(k.endswith("_viou") for k in results)
    assert any(k.endswith("_tiou") for k in results)
    for k, v in results.items():
        assert np.isfinite(v), k
        assert 0.0 <= v <= 1.0 or k.endswith("kf_p") or k.endswith("kf_r"), (k, v)


def test_train_sharded_sp(env, tmp_path):
    """dp=1 x sp=2 Trainer run: the frame axis of every batch shards over
    sp (sequence parallel — net-new vs the reference's DDP-only scaling,
    SURVEY §2.6) end-to-end through the CLI Trainer (TPU.MESH_SP knob)."""
    _, data_dir, _ = env
    import sys

    sys.path.insert(0, "tools")
    import importlib

    from vgqa_tpu.utils.log_setup import setup_logger

    cfg = build_default_cfg()
    cfg.merge_from_file("configs/grounding_vidstg_tiny.yaml")
    cfg.DATA_DIR = data_dir
    cfg.OUTPUT_DIR = str(tmp_path / "out_sp")
    cfg.DATA_TRUNK = 2
    cfg.SOLVER.TO_VAL = False
    cfg.TPU.MESH_DP = 1
    cfg.TPU.MESH_SP = 2

    train_mod = importlib.import_module("train")
    trainer = train_mod.Trainer(cfg, setup_logger("sp-test", ""), seed=0)
    trainer.setup()
    assert dict(trainer.mesh.shape) == {"dp": 1, "sp": 2, "tp": 1}
    trainer.fit()
    assert int(trainer.state.step) == 2
    v_sh, _, _ = trainer._sp_shards
    assert "sp" in str(v_sh.frames.spec)  # frame axis genuinely sharded


def test_checkpoint_resume(env):
    cfg, data_dir, out_dir = env
    import jax

    from vgqa_tpu.training import CheckpointManager

    mgr = CheckpointManager(out_dir)
    assert mgr.has_checkpoint()
    # restore into an abstract twin of the saved state
    import sys

    sys.path.insert(0, "tools")
    import importlib

    train_mod = importlib.import_module("train")
    from vgqa_tpu.utils.log_setup import setup_logger

    trainer = train_mod.Trainer(cfg, setup_logger("resume-test", ""), seed=0)
    trainer.setup()  # setup() auto-resumes from the tag
    assert int(trainer.state.step) == 2


def test_predict_api(env, tmp_path):
    cfg, data_dir, out_dir = env
    from vgqa_tpu.inference.grounding import predict

    cfg_path = str(tmp_path / "tiny.yaml")
    # predict() loads config from disk like the CLI does
    c = build_default_cfg()
    c.merge_from_file("configs/grounding_vidstg_tiny.yaml")
    c.DATA_DIR = data_dir
    with open(cfg_path, "w") as f:
        f.write(c.dump())

    video = os.path.join(data_dir, "videos", "test_vid000.mp4")
    result = predict(video, "a green square moves right", cfg_path, ckpt_path="")
    assert set(result.keys()) == {"temporal", "tube"}
    assert result["temporal"]["start"] <= result["temporal"]["end"]
    assert len(result["tube"]) >= 1
    first = result["tube"][0]
    assert set(first.keys()) == {"frame", "bbox", "score"}
    assert len(first["bbox"]) == 4
    json.dumps(result)  # schema must be JSON-serializable


def test_predict_short_odd_frame_video(env, tmp_path):
    """A video shorter than 2*TRAIN_SAMPLE_NUM with an odd frame count must
    not crash the even/odd split (regression: np.stack on unequal halves)."""
    cfg, data_dir, out_dir = env
    from vgqa_tpu.data.synthetic import write_synthetic_video
    from vgqa_tpu.inference.grounding import predict

    cfg_path = str(tmp_path / "tiny.yaml")
    c = build_default_cfg()
    c.merge_from_file("configs/grounding_vidstg_tiny.yaml")
    c.DATA_DIR = data_dir
    with open(cfg_path, "w") as f:
        f.write(c.dump())

    # 9 frames < 2*8 target -> uniform sampling returns all 9 (odd)
    video = str(tmp_path / "odd.mp4")
    write_synthetic_video(video, 9, (64, 48), seed=3)
    result = predict(video, "a square", cfg_path, ckpt_path="")
    assert result["temporal"]["start"] <= result["temporal"]["end"]
    assert len(result["tube"]) >= 1
    json.dumps(result)


def test_predict_yuv_matches_rgb(env, tmp_path, monkeypatch):
    """The YUV-upload serving path (I420 planes + on-device BT.601) must
    reproduce the RGB-upload path within colorspace rounding: identical
    schema, near-identical boxes/spans."""
    from vgqa_tpu.native import videodec

    if not videodec.available():
        import pytest as _pytest

        _pytest.skip("native decoder not built")
    cfg, data_dir, out_dir = env
    from vgqa_tpu.inference.grounding import predict

    cfg_path = str(tmp_path / "tiny.yaml")
    c = build_default_cfg()
    c.merge_from_file("configs/grounding_vidstg_tiny.yaml")
    c.DATA_DIR = data_dir
    with open(cfg_path, "w") as f:
        f.write(c.dump())
    video = os.path.join(data_dir, "videos", "test_vid000.mp4")

    monkeypatch.setenv("VGQA_SERVE_YUV", "0")
    r_rgb = predict(video, "a green square", cfg_path, ckpt_path="")
    monkeypatch.setenv("VGQA_SERVE_YUV", "1")
    r_yuv = predict(video, "a green square", cfg_path, ckpt_path="")

    assert set(r_yuv.keys()) == {"temporal", "tube"}
    assert len(r_yuv["tube"]) == len(r_rgb["tube"])
    # spans may shift by at most one sampled frame under pixel-level
    # colorspace rounding through a random-init model
    import numpy as _np

    fps_step = abs(r_yuv["temporal"]["start"] - r_rgb["temporal"]["start"])
    assert fps_step < 0.51, (r_yuv["temporal"], r_rgb["temporal"])
    b_rgb = _np.array([t["bbox"] for t in r_rgb["tube"]])
    b_yuv = _np.array([t["bbox"] for t in r_yuv["tube"]])
    assert _np.abs(b_rgb - b_yuv).mean() < 3.0


def test_predict_many_coalesces_and_matches_solo(env, tmp_path):
    """Two same-length videos batch into ONE V=4 forward whose per-video
    results match their solo predict() calls (rows are independent); a bad
    slot fails alone and a different-length video lands in its own group."""
    cfg, data_dir, out_dir = env
    from vgqa_tpu.data.synthetic import write_synthetic_video
    from vgqa_tpu.inference.grounding import predict, predict_many

    cfg_path = str(tmp_path / "tiny.yaml")
    c = build_default_cfg()
    c.merge_from_file("configs/grounding_vidstg_tiny.yaml")
    c.DATA_DIR = data_dir
    with open(cfg_path, "w") as f:
        f.write(c.dump())

    v0 = os.path.join(data_dir, "videos", "test_vid000.mp4")
    v1 = str(tmp_path / "v1.mp4")
    write_synthetic_video(v1, 40, (64, 48), seed=5)   # same T2 group as v0
    v_short = str(tmp_path / "short.mp4")
    write_synthetic_video(v_short, 6, (64, 48), seed=6)  # own T2 group

    solo0 = predict(v0, "a green square", cfg_path, ckpt_path="")
    solo1 = predict(v1, "a red circle", cfg_path, ckpt_path="")

    results = predict_many(
        [
            {"video_path": v0, "query": "a green square"},
            {"video_path": str(tmp_path / "nope.mp4"), "query": "?"},
            {"video_path": v1, "query": "a red circle"},
            {"video_path": v_short, "query": "something"},
        ],
        cfg_path, ckpt_path="",
    )
    assert isinstance(results[1], FileNotFoundError)
    import numpy as _np

    for solo, got in ((solo0, results[0]), (solo1, results[2])):
        assert got["temporal"] == solo["temporal"]
        b_solo = _np.array([t["bbox"] for t in solo["tube"]])
        b_got = _np.array([t["bbox"] for t in got["tube"]])
        _np.testing.assert_allclose(b_got, b_solo, atol=1e-3)
    assert set(results[3].keys()) == {"temporal", "tube"}
    json.dumps([r for r in results if not isinstance(r, Exception)])
