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
