"""Standalone evaluation entrypoint (parity with
/root/reference/tools/evaluate.py:78-135): load a checkpoint, run the
even/odd two-pass VidSTG evaluation, print the metrics."""

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vgqa_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp

from vgqa_tpu.config import cfg
from vgqa_tpu.data.loader import make_data_loader
from vgqa_tpu.data.metrics import build_evaluator
from vgqa_tpu.models import GroundingConfig, VSTGNet
from vgqa_tpu.training.checkpoint import CheckpointManager
from vgqa_tpu.training.evaluator import do_eval
from vgqa_tpu.utils.containers import TextBatch, VideoBatch
from vgqa_tpu.utils.log_setup import setup_logger


def main():
    parser = argparse.ArgumentParser(description="Grounding evaluation")
    parser.add_argument("--config-file", default="", metavar="FILE", type=str)
    parser.add_argument("--save-pred", action="store_true")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts or [])
    cfg.freeze()

    logger = setup_logger("Video Grounding Eval", cfg.OUTPUT_DIR,
                          jax.process_index())
    model = VSTGNet(GroundingConfig.from_cfg(cfg))

    loader = make_data_loader(cfg, "test", global_batch=1)
    example = next(iter(make_data_loader(cfg, "test", global_batch=1)))
    params = jax.jit(
        lambda rng: model.init(rng, example["video"], example["text"], train=False)
    )(jax.random.PRNGKey(0))

    weight = cfg.MODEL.WEIGHT_EVAL or cfg.MODEL.WEIGHT
    if weight and os.path.exists(weight):
        mgr = CheckpointManager(os.path.dirname(weight) or ".", save_to_disk=False)
        restored = mgr.load(params, weight)
        if restored is not None:
            params = restored
            logger.info(f"Loaded eval weights from {weight}")
    else:
        logger.warning("No eval checkpoint found; evaluating random init")

    evaluator = build_evaluator(cfg, logger, mode="test", save_pred=args.save_pred)
    results = do_eval(cfg, "test", logger, model, params, loader, evaluator)
    print(json.dumps(results, indent=2, default=float))


if __name__ == "__main__":
    main()
