"""Grounding inference floor accounting: profile + roofline for one step.

VERDICT r4 #6: the 420px batch-2 throughput has been flat at ~10.85
clips/s for three rounds with no statement of whether that is the
hardware floor. This tool produces the accounting: it times the jitted
batch-B forward (chained, scalar-fetched — the only valid timing on this
tunnel, BASELINE.md), pulls XLA's own FLOP estimate from cost_analysis,
derives achieved TF/s and MFU against the v5e bf16 peak, then traces two
steps and buckets device op time per tower (Pallas Swin megakernel /
ResNet convs / encoder attention / copies / rest).

    python tools/profile_grounding.py --res 420 --batch 2 --iters 20
"""

import argparse
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vgqa_tpu.utils.platform import apply_platform_env

apply_platform_env()

V5E_BF16_PEAK_TFS = 197.0  # one v5e chip, bf16 MXU peak


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=420)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--trace-dir", default="/tmp/ground_prof")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vgqa_tpu.config import build_default_cfg
    from vgqa_tpu.models import GroundingConfig, VSTGNet
    from vgqa_tpu.models.postprocess import postprocess
    from vgqa_tpu.utils.containers import TextBatch, VideoBatch
    from vgqa_tpu.utils.profiling import summarize_trace

    cfg = build_default_cfg()
    t, l = cfg.INPUT.TRAIN_SAMPLE_NUM, cfg.INPUT.MAX_QUERY_LEN
    res, batch = args.res, args.batch
    model = VSTGNet(GroundingConfig.from_cfg(cfg))

    rng = np.random.RandomState(0)
    video = VideoBatch(
        frames=jnp.asarray(
            rng.randn(batch, t, res, res, 3).astype(np.float32) * 0.1
        ).astype(jnp.bfloat16),
        pixel_mask=jnp.ones((batch, res, res), bool),
        time_mask=jnp.ones((batch, t), bool),
    )
    text = TextBatch(
        token_ids=jnp.asarray(
            rng.randint(4, 50000, (batch, l)).astype(np.int32)),
        mask=jnp.ones((batch, l), bool),
    )
    params = jax.jit(lambda r: model.init(r, video, text, train=False))(
        jax.random.PRNGKey(0)
    )
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )

    @jax.jit
    def fwd(params, video, text, feedback):
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

    # compile + XLA's own FLOP count for this exact program
    lowered = fwd.lower(params, video, text, jnp.zeros((), jnp.float32))
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))

    feedback = jnp.zeros((), jnp.float32)
    t0 = time.time()
    *_, feedback = fwd(params, video, text, feedback)
    float(feedback)
    compile_s = time.time() - t0

    t0 = time.time()
    for _ in range(args.iters):
        *_, feedback = fwd(params, video, text, feedback)
    float(feedback)
    step_s = (time.time() - t0) / args.iters
    clips = batch / step_s
    achieved_tfs = flops / step_s / 1e12
    mfu = achieved_tfs / V5E_BF16_PEAK_TFS

    print(f"step: {step_s * 1000:.1f} ms for batch={batch} @ {res}px "
          f"({clips:.2f} clips/s; compile+first {compile_s:.0f}s)")
    print(f"XLA flops/step: {flops / 1e9:.1f} GF -> achieved "
          f"{achieved_tfs:.1f} TF/s = {100 * mfu:.1f}% MFU "
          f"(v5e bf16 peak {V5E_BF16_PEAK_TFS:.0f} TF/s)")

    # trace 2 steps, bucket device time per tower
    jax.profiler.start_trace(args.trace_dir)
    for _ in range(2):
        *_, feedback = fwd(params, video, text, feedback)
    float(feedback)
    jax.profiler.stop_trace()
    rows = summarize_trace(args.trace_dir, top=60)

    buckets = defaultdict(float)
    for name, ms, _ in rows:
        n = name.lower()
        if "swin" in n or "custom-call" in n or "pallas" in n:
            buckets["swin_pallas"] += ms
        elif "conv" in n:
            buckets["conv_fusions(resnet+stem)"] += ms
        elif "dot" in n or "einsum" in n or "gemm" in n:
            buckets["matmuls(encoder/decoder/text)"] += ms
        elif "copy" in n or "transpose" in n or "bitcast" in n:
            buckets["copies/format"] += ms
        elif "fusion" in n or "reduce" in n or "softmax" in n:
            buckets["elementwise/reduce fusions"] += ms
        else:
            buckets["other"] += ms
    total = sum(buckets.values())
    print("\ndevice-time buckets over 2 traced steps "
          f"(total {total:.1f} ms, {total / 2:.1f} ms/step):")
    for k, v in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {k:36s} {v / 2:7.1f} ms/step")
    print(json.dumps({
        "res": res, "batch": batch, "step_ms": round(step_s * 1000, 1),
        "clips_per_sec": round(clips, 2), "gflops": round(flops / 1e9, 1),
        "achieved_tfs": round(achieved_tfs, 1),
        "mfu_pct": round(100 * mfu, 1),
        "buckets_ms_per_step": {k: round(v / 2, 1)
                                for k, v in buckets.items()},
    }))


if __name__ == "__main__":
    main()
