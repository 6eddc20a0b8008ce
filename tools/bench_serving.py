"""Serving e2e benchmark: the user-visible `predict()` contract.

Times the full grounding serving path — selective decode + decode-time
resize + upload + V=2 batched even/odd forward + merge — the thing a user
of the reference's `vgqa/inference/grounding.py:142-244` actually waits
on. Reports the phase split (host decode vs the rest) and sweeps decoder
thread counts (native/videodec thread-sliced decode, VGQA_DECODE_THREADS).

Usage:
  python tools/bench_serving.py                       # 420px production cfg
  python tools/bench_serving.py --config configs/grounding_vidstg_tiny.yaml
  python tools/bench_serving.py --video my.mp4 --iters 5
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vgqa_tpu.utils.platform import apply_platform_env

apply_platform_env()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/grounding_vidstg.yaml")
    ap.add_argument("--video", default="")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--frames", type=int, default=300,
                    help="synthetic source video length")
    ap.add_argument("--size", default="640x480",
                    help="synthetic source video WxH")
    ap.add_argument("--threads", default="",
                    help="comma list of decode thread counts to sweep "
                         "(default: 1 and the CPU count)")
    args = ap.parse_args()

    video_path = args.video
    if not video_path:
        from vgqa_tpu.data.synthetic import write_synthetic_video

        w, h = (int(x) for x in args.size.split("x"))
        video_path = "/tmp/bench_serving.mp4"
        write_synthetic_video(video_path, args.frames, (w, h))
        print(f"synthetic source: {args.frames} frames @ {w}x{h}", flush=True)

    from vgqa_tpu.config import build_default_cfg
    from vgqa_tpu.data.video_io import read_frames, uniform_sample_indices, \
        video_info
    from vgqa_tpu.inference.grounding import predict

    cfg = build_default_cfg()
    cfg.merge_from_file(args.config)
    res = cfg.INPUT.RESOLUTION
    target_t = max(2, int(cfg.INPUT.TRAIN_SAMPLE_NUM) * 2)
    total, fps, w0, h0 = video_info(video_path)
    frame_ids = uniform_sample_indices(total, target_t)
    print(f"config {args.config}: res {res}, {target_t} sampled frames "
          f"of {total}", flush=True)

    if args.threads:
        sweep = [int(x) for x in args.threads.split(",")]
    else:
        sweep = sorted({1, os.cpu_count() or 1})

    # decode-only phase, per thread count (host-side; no device involved)
    for nt in sweep:
        os.environ["VGQA_DECODE_THREADS"] = str(nt)
        read_frames(video_path, frame_ids, size=(res, res))  # warm caches
        t0 = time.time()
        for _ in range(args.iters):
            read_frames(video_path, frame_ids, size=(res, res))
        dt = (time.time() - t0) / args.iters
        print(f"decode+resize x{len(frame_ids)} @ {nt:2d} threads: "
              f"{dt*1000:7.1f} ms", flush=True)

    # full predict() e2e at the best thread count
    best = sweep[-1]
    os.environ["VGQA_DECODE_THREADS"] = str(best)
    t0 = time.time()
    predict(video_path, "a person walks across the room",
            cfg_path=args.config,
            ckpt_path="checkpoints/grounding/vidstg")
    print(f"predict() first call (compile+load): {time.time()-t0:.1f} s",
          flush=True)
    times = []
    for i in range(args.iters):
        t0 = time.time()
        out = predict(video_path, f"a person walks across the room {i}",
                      cfg_path=args.config,
                      ckpt_path="checkpoints/grounding/vidstg")
        times.append(time.time() - t0)
    import numpy as np

    e2e = float(np.median(times))
    print(f"predict() e2e @ {best} decode threads: median {e2e:.2f} s "
          f"(all: {', '.join(f'{t:.2f}' for t in times)}); "
          f"tube len {len(out['tube'])}", flush=True)

    # coalesced serving: 2 videos per V=4 forward (the HTTP layer batches
    # concurrent /api/predict callers this way; device forward cost is the
    # same as one video, so aggregate throughput ~doubles minus the extra
    # host decode)
    from vgqa_tpu.data.synthetic import write_synthetic_video
    from vgqa_tpu.inference.grounding import predict_many

    v2 = "/tmp/bench_serving_b.mp4"
    write_synthetic_video(v2, args.frames, tuple(
        int(x) for x in args.size.split("x")), seed=7)
    reqs = [
        {"video_path": video_path, "query": "a person walks left"},
        {"video_path": v2, "query": "a red object moves"},
    ]
    predict_many(reqs, cfg_path=args.config,
                 ckpt_path="checkpoints/grounding/vidstg")  # compile V=4
    times2 = []
    for i in range(args.iters):
        t0 = time.time()
        outs = predict_many(
            [{"video_path": r["video_path"], "query": f"{r['query']} {i}"}
             for r in reqs],
            cfg_path=args.config, ckpt_path="checkpoints/grounding/vidstg",
        )
        times2.append(time.time() - t0)
    assert all(not isinstance(o, Exception) for o in outs)
    pair = float(np.median(times2))
    print(f"predict_many() 2-video coalesced e2e: median {pair:.2f} s "
          f"({pair/2:.2f} s/video aggregate vs {e2e:.2f} solo; "
          f"all: {', '.join(f'{t:.2f}' for t in times2)})", flush=True)


if __name__ == "__main__":
    main()
