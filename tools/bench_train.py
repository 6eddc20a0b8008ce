"""Training-step throughput benchmark (not part of the driver contract;
bench.py remains the single-line headline metric).

Measures the full jitted train step — forward, all losses, backward,
5-group AdamW, EMA — at the flagship 64-frame/224px scale on the attached
chip, with the tunnel-safe chained-timing protocol.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vgqa_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np

from vgqa_tpu.config import build_default_cfg
from vgqa_tpu.models import GroundingConfig, VSTGNet, VideoSTGLoss, build_weight_dict
from vgqa_tpu.training import create_train_state, make_optimizer, make_train_step
from vgqa_tpu.utils.containers import TextBatch, VideoBatch


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=0, help="override T")
    ap.add_argument("--res", type=int, default=0, help="override resolution")
    ap.add_argument("--remat", action="store_true",
                    help="per-block gradient checkpointing")
    ap.add_argument("--bf16", action="store_true",
                    help="mixed precision: bf16 fwd/bwd, f32 master params")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--profile", default="",
                    help="trace 2 steps into this dir and print the top "
                         "device ops (utils.profiling.summarize_trace)")
    ap.add_argument("--ab-flat-clip", action="store_true",
                    help="time the step with the per-leaf optax grad clip "
                         "AND clip_by_global_norm_flat in one process "
                         "(two compiles, comparable timings)")
    ap.add_argument("--ab-bucket-clip", action="store_true",
                    help="time the step with the per-leaf optax grad clip "
                         "AND clip_by_global_norm_bucketed (small leaves "
                         "concat, big leaves per-leaf) in one process")
    ap.add_argument("--ab-flash-train", action="store_true",
                    help="time the step with the XLA einsum encoder "
                         "attention AND the differentiable flash kernel "
                         "(ops/pallas/flash_train.py) in one process")
    ap.add_argument("--ab-rbg", action="store_true",
                    help="time the step with threefry AND rbg dropout "
                         "keys in one process (two compiles; rbg trades "
                         "the counter-based PRNG's cost for the TPU's "
                         "hardware RNG path)")
    args = ap.parse_args()

    cfg = build_default_cfg()
    t, res, l = cfg.INPUT.TRAIN_SAMPLE_NUM, cfg.INPUT.RESOLUTION, cfg.INPUT.MAX_QUERY_LEN
    if args.frames:
        t = args.frames
    if args.res:
        res = args.res
    if args.remat:
        cfg.TPU.REMAT = True
    if args.bf16:
        cfg.TPU.TRAIN_DTYPE = "bfloat16"
    print(f"config: T={t} res={res} remat={args.remat} "
          f"dtype={cfg.TPU.TRAIN_DTYPE}", flush=True)
    model = VSTGNet(GroundingConfig.from_cfg(cfg))
    rng = np.random.RandomState(0)
    video = VideoBatch(
        frames=jnp.asarray(rng.randn(1, t, res, res, 3).astype(np.float32) * 0.1),
        pixel_mask=jnp.ones((1, res, res), bool),
        time_mask=jnp.ones((1, t), bool),
    )
    text = TextBatch(
        token_ids=jnp.asarray(rng.randint(4, 50000, (1, l)).astype(np.int32)),
        mask=jnp.ones((1, l), bool),
    )
    act = np.zeros((1, t), np.float32)
    act[:, t // 4 : max(t // 2, t // 4 + 2)] = 1
    targets = {
        "boxes": jnp.asarray(np.tile([0.5, 0.5, 0.2, 0.3], (1, t, 1)).astype(np.float32)),
        "actioness": jnp.asarray(act),
        "time_mask": jnp.ones((1, t), bool),
        "sted": jnp.asarray([[t // 4, max(t // 2, t // 4 + 2) - 1]], jnp.int32),
        "attr_labels": jnp.zeros((1, cfg.DATASET.APP_NUM)),
        "verb_labels": jnp.zeros((1, cfg.DATASET.MOT_NUM)),
    }

    init_fn = jax.jit(lambda r: model.init(r, video, text, train=False))
    loss_fn = VideoSTGLoss(sigma=cfg.SOLVER.SIGMA, eos_coef=cfg.SOLVER.EOS_COEF)

    def build_and_time(label, rng_impl=None):
        rng_impl = rng_impl or cfg.TPU.TRAIN_PRNG
        # fresh params per arm: the step donates the TrainState, whose
        # buffers alias these params — a second arm tracing against the
        # first arm's donated buffers dies with InvalidArgument. The jit
        # cache makes the re-init an execute, not a recompile.
        params = init_fn(jax.random.PRNGKey(0))
        tx, _ = make_optimizer(cfg, params, max_iter=1000)
        state = create_train_state(params, tx, use_ema=True)
        step_fn = jax.jit(
            make_train_step(model, loss_fn, build_weight_dict(cfg), tx,
                            cfg.MODEL.EMA_DECAY, remat=cfg.TPU.REMAT,
                            compute_dtype=(jnp.bfloat16
                                           if cfg.TPU.TRAIN_DTYPE == "bfloat16"
                                           else None)),
            donate_argnums=(0,),
        )
        key = jax.random.key(0, impl=rng_impl)
        t0 = time.time()
        state, metrics = step_fn(state, video, text, targets, key)
        loss0 = float(metrics["loss"])  # host fetch = real completion
        print(f"{label}compile+first step: {time.time() - t0:.0f}s "
              f"(loss {loss0:.3f})", flush=True)

        n = args.iters
        t0 = time.time()
        for _ in range(n):
            state, metrics = step_fn(state, video, text, targets, key)
        final = float(metrics["loss"])
        dt = (time.time() - t0) / n
        print(
            f"{label}train step: {dt * 1000:.0f} ms  "
            f"({1 / dt:.2f} clips/s/chip, loss {final:.3f})", flush=True
        )
        return state, step_fn, key

    if args.ab_flat_clip:
        import os

        for flat in ("0", "1"):
            os.environ["VGQA_FLAT_CLIP"] = flat
            build_and_time(f"[flat_clip={flat}] ")
        return

    if args.ab_bucket_clip:
        import os

        for impl in ("optax", "bucket"):
            os.environ["VGQA_CLIP_IMPL"] = impl
            build_and_time(f"[clip={impl}] ")
        return

    if args.ab_flash_train:
        import os

        for flag in ("0", "1"):
            os.environ["VGQA_FLASH_TRAIN"] = flag
            build_and_time(f"[flash_train={flag}] ")
        return

    if args.ab_rbg:
        for impl in ("threefry2x32", "rbg"):
            build_and_time(f"[rng={impl}] ", rng_impl=impl)
        return

    state, step_fn, key = build_and_time("")

    if args.profile:
        from vgqa_tpu.utils.profiling import summarize_trace

        jax.profiler.start_trace(args.profile)
        for _ in range(2):
            state, metrics = step_fn(state, video, text, targets, key)
        float(metrics["loss"])
        jax.profiler.stop_trace()
        summarize_trace(args.profile)


if __name__ == "__main__":
    main()
