"""Learning validation: train the tiny model on synthetic data and verify
the optimizer/loss/EMA stack actually learns — loss decreases and eval
vIoU/tIoU beat the untrained baseline by a wide margin.

This is the correctness check unit tests can't provide: a moving-square
dataset with the query "a green square moves to the right" is learnable in
a few hundred steps if and only if gradients, schedules, masking, and the
evaluator all line up.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vgqa_tpu.utils.platform import apply_platform_env

apply_platform_env()


def main(epochs: int = 60, out_root: str = "/tmp/vgqa_learning"):
    import importlib

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    train_mod = importlib.import_module("train")

    from vgqa_tpu.config import build_default_cfg
    from vgqa_tpu.data.loader import make_data_loader
    from vgqa_tpu.data.metrics import build_evaluator
    from vgqa_tpu.data.synthetic import make_synthetic_dataset
    from vgqa_tpu.training.evaluator import do_eval
    from vgqa_tpu.utils.log_setup import setup_logger

    root = Path(out_root)
    data_dir = str(root / "data")
    if not (root / "data" / "videos").exists():
        make_synthetic_dataset(data_dir, num_videos=6, frames_per_video=30)

    cfg = build_default_cfg()
    cfg.merge_from_file("configs/grounding_vidstg_tiny.yaml")
    cfg.DATA_DIR = data_dir
    cfg.OUTPUT_DIR = str(root / "out")
    cfg.SOLVER.MAX_EPOCH = epochs
    cfg.SOLVER.TO_VAL = False
    cfg.SOLVER.CHECKPOINT_PERIOD = 10**9
    cfg.SOLVER.SCHEDULE.DROP_STEP = [epochs]  # constant LR after warmup
    cfg.TPU.MESH_DP = 1
    # make the task cleanly learnable: no augmentation jitter, single scale
    cfg.INPUT.AUG_SCALE = False
    cfg.INPUT.FLIP_PROB_TRAIN = 0.0
    cfg.INPUT.TEMP_CROP_PROB = 0.0
    cfg.SOLVER.BASE_LR = 5e-4
    cfg.SOLVER.TEMP_LR = 5e-4
    cfg.SOLVER.VERB_LR = 5e-4

    logger = setup_logger("learning-validation", "")
    trainer = train_mod.Trainer(cfg, logger, seed=0)
    trainer.setup()

    # baseline eval on the untrained model
    evaluator = build_evaluator(cfg, logger, mode="test")
    loader = make_data_loader(cfg, "test", global_batch=1)
    base = do_eval(cfg, "test", None, trainer.model, trainer.eval_params(),
                   loader, evaluator)

    t0 = time.time()
    trainer.fit()
    train_s = time.time() - t0

    evaluator = build_evaluator(cfg, logger, mode="test")
    loader = make_data_loader(cfg, "test", global_batch=1)
    final = do_eval(cfg, "test", None, trainer.model, trainer.eval_params(),
                    loader, evaluator)

    summary = {
        "steps": trainer.max_iter,
        "train_seconds": round(train_s, 1),
        "baseline": {k: round(v, 4) for k, v in base.items()
                     if k.endswith(("_viou", "_tiou", "_gt_viou"))},
        "trained": {k: round(v, 4) for k, v in final.items()
                    if k.endswith(("_viou", "_tiou", "_gt_viou"))},
    }
    print(json.dumps(summary, indent=2))
    improved = any(
        summary["trained"].get(k, 0) > summary["baseline"].get(k, 0) + 0.1
        for k in summary["trained"]
    )
    print("LEARNING:", "CONFIRMED" if improved else "NOT CONFIRMED")


if __name__ == "__main__":
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    out_root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vgqa_learning"
    main(epochs, out_root)
