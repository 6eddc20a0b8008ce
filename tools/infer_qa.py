"""CLI for video question answering (parity with
/root/reference/tools/infer_qa.py:17-64)."""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vgqa_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

from vgqa_tpu.inference.qa import DEFAULT_MODEL_DIR, predict  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description="Video question answering")
    parser.add_argument("--video", required=True)
    parser.add_argument("--question", required=True)
    parser.add_argument("--model-dir", default=DEFAULT_MODEL_DIR)
    parser.add_argument("--num-frames", type=int, default=32)
    parser.add_argument("--max-new-tokens", type=int, default=128)
    parser.add_argument("--temperature", type=float, default=0.2)
    parser.add_argument("--top-p", type=float, default=0.9)
    parser.add_argument("--bound-start", type=float, default=None)
    parser.add_argument("--bound-end", type=float, default=None)
    parser.add_argument("--output", default="")
    args = parser.parse_args()

    bound = None
    if args.bound_start is not None and args.bound_end is not None:
        bound = (args.bound_start, args.bound_end)

    result = predict(
        args.video,
        args.question,
        bound=bound,
        model_dir=args.model_dir,
        num_frames=args.num_frames,
        max_new_tokens=args.max_new_tokens,
        temperature=args.temperature,
        top_p=args.top_p,
    )
    text = json.dumps(result, indent=2)
    if args.output:
        Path(args.output).write_text(text)
    print(text)


if __name__ == "__main__":
    main()
