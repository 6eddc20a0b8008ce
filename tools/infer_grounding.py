"""CLI for single-video grounding inference (parity with
/root/reference/tools/infer_grounding.py:17-50)."""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vgqa_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

from vgqa_tpu.inference.grounding import (  # noqa: E402
    DEFAULT_CHECKPOINT_PATH,
    DEFAULT_CONFIG_PATH,
    predict,
    predict_many,
)


def main():
    parser = argparse.ArgumentParser(description="Spatio-temporal grounding inference")
    parser.add_argument("--video", required=True, action="append",
                        help="path to input video (repeatable: N videos "
                             "with N --query flags batch same-length pairs "
                             "into one coalesced forward)")
    parser.add_argument("--query", required=True, action="append",
                        help="natural-language query (one per --video)")
    parser.add_argument("--config", default=DEFAULT_CONFIG_PATH)
    parser.add_argument("--checkpoint", default=DEFAULT_CHECKPOINT_PATH)
    parser.add_argument("--output", default="", help="optional JSON output path")
    args = parser.parse_args()

    if len(args.video) != len(args.query):
        parser.error(f"{len(args.video)} --video flags but "
                     f"{len(args.query)} --query flags")
    if len(args.video) == 1:
        result = predict(args.video[0], args.query[0], args.config,
                         args.checkpoint)
    else:
        results = predict_many(
            [{"video_path": v, "query": q}
             for v, q in zip(args.video, args.query)],
            args.config, args.checkpoint,
        )
        errs = [r for r in results if isinstance(r, Exception)]
        if errs:
            raise errs[0]
        result = results
    text = json.dumps(result, indent=2)
    if args.output:
        Path(args.output).write_text(text)
    print(text)


if __name__ == "__main__":
    main()
