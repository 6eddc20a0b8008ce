"""Benchmark: 64-frame grounding inference end-to-end, clips/sec/chip.

Runs the flagship model (ResNet-101 + Video Swin-T + RoBERTa, 224px, 64
frames — the reference's default INPUT scale, defaults.py:9-11) through the
full jitted forward + postprocess in bfloat16, and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "clips/sec/chip", "vs_baseline": N}.

vs_baseline is measured against the driver's north-star target of
10 clips/sec/chip (BASELINE.json — the reference publishes no numbers).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from vgqa_tpu.utils.platform import apply_platform_env

apply_platform_env()

TARGET_CLIPS_PER_SEC = 10.0  # north-star from /root/repo/BASELINE.json


def _measure(res: int, iters: int, batch: int = 1):
    import jax
    import jax.numpy as jnp

    from vgqa_tpu.config import build_default_cfg
    from vgqa_tpu.models import GroundingConfig, VSTGNet
    from vgqa_tpu.models.postprocess import postprocess
    from vgqa_tpu.utils.containers import TextBatch, VideoBatch

    cfg = build_default_cfg()
    t, l = cfg.INPUT.TRAIN_SAMPLE_NUM, cfg.INPUT.MAX_QUERY_LEN
    gcfg = GroundingConfig.from_cfg(cfg)
    model = VSTGNet(gcfg)

    rng = np.random.RandomState(0)
    video = VideoBatch(
        frames=jnp.asarray(
            rng.randn(batch, t, res, res, 3).astype(np.float32) * 0.1,
        ).astype(jnp.bfloat16),
        pixel_mask=jnp.ones((batch, res, res), bool),
        time_mask=jnp.ones((batch, t), bool),
    )
    text = TextBatch(
        token_ids=jnp.asarray(rng.randint(4, 50000, (batch, l)).astype(np.int32)),
        mask=jnp.ones((batch, l), bool),
    )

    params = jax.jit(lambda r: model.init(r, video, text, train=False))(
        jax.random.PRNGKey(0)
    )
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )

    @jax.jit
    def fwd(params, video, text, feedback):
        # `feedback` chains consecutive invocations through a data
        # dependency: this environment's remote-device tunnel returns from
        # block_until_ready before execution finishes, so timing must
        # serialize on-device work and fetch a scalar to the host.
        frames = video.frames + feedback.astype(video.frames.dtype)
        chained = VideoBatch(frames, video.pixel_mask, video.time_mask)
        out = model.apply(params, chained, text, train=False)
        sizes = jnp.asarray([[720.0, 1280.0]] * batch)
        boxes, s, e = postprocess(
            out["pred_boxes"].astype(jnp.float32),
            out["pred_sted"].astype(jnp.float32),
            sizes,
            video.time_mask,
        )
        return boxes, s, e, out["att_sequences"], jnp.sum(boxes) * 1e-9

    # warmup / compile (fetch forces real completion)
    t0 = time.time()
    feedback = jnp.zeros((), jnp.float32)
    *_, feedback = fwd(params, video, text, feedback)
    float(feedback)
    compile_s = time.time() - t0

    t0 = time.time()
    for _ in range(iters):
        *res_out, feedback = fwd(params, video, text, feedback)
    float(feedback)  # host fetch: waits for the whole chained sequence
    dt = time.time() - t0
    return batch * iters / dt, compile_s, 1000 * dt / iters


def main():
    import os

    import jax

    batch = int(os.environ.get("VGQA_BENCH_BATCH", "2"))
    clips_224, compile_s, step_ms = _measure(224, iters=20, batch=batch)
    extra = {
        "batch": batch,
        "compile_s": round(compile_s, 1),
        "step_ms": round(step_ms, 1),
        "device": str(jax.devices()[0]),
        "dtype": "bfloat16",
    }
    if os.environ.get("VGQA_BENCH_420", "1") != "0":
        # the reference's shipped production resolution
        # (/root/reference/configs/grounding_vidstg.yaml:6)
        clips_420, _, step_420 = _measure(420, iters=10, batch=batch)
        extra["clips_per_sec_420px"] = round(clips_420, 3)
        extra["step_ms_420px"] = round(step_420, 1)

    print(
        json.dumps(
            {
                "metric": "grounding_64f_224px_clips_per_sec_per_chip",
                "value": round(clips_224, 3),
                "unit": "clips/sec",
                "vs_baseline": round(clips_224 / TARGET_CLIPS_PER_SEC, 3),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
