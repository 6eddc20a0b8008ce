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
)


def main():
    parser = argparse.ArgumentParser(description="Spatio-temporal grounding inference")
    parser.add_argument("--video", required=True, help="path to input video")
    parser.add_argument("--query", required=True, help="natural-language query")
    parser.add_argument("--config", default=DEFAULT_CONFIG_PATH)
    parser.add_argument("--checkpoint", default=DEFAULT_CHECKPOINT_PATH)
    parser.add_argument("--output", default="", help="optional JSON output path")
    args = parser.parse_args()

    result = predict(args.video, args.query, args.config, args.checkpoint)
    text = json.dumps(result, indent=2)
    if args.output:
        Path(args.output).write_text(text)
    print(text)


if __name__ == "__main__":
    main()
