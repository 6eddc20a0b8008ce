"""W8A8 prefill accuracy gate -> GATE_W8A8.json.

Runs the gate defined in vgqa_tpu/qa/gate_w8a8.py: outlier-realistic
random weights at the production LLM geometry, greedy-decode token match
of W8A8 prefill vs bf16-activation prefill over the same int8 weights
(the decision that ships VGQA_W8A8_PREFILL on by default).

    # suite-scale geometry (production width, shallow) — CPU-friendly
    python tools/gate_w8a8.py --layers 2 --out GATE_W8A8.json
    # full production depth (run on TPU; minutes on CPU)
    python tools/gate_w8a8.py --layers 32 --prompts 4 --new-tokens 64

On real converted InternVideo2.5 weights (when assets exist), gate those
instead of the random proxy:

    python tools/gate_w8a8.py --params-dir ckpt/qa --layers 32
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vgqa_tpu.utils.platform import apply_platform_env

apply_platform_env()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--layers", type=int, default=32)
    p.add_argument("--hidden", type=int, default=4096)
    p.add_argument("--vocab", type=int, default=8192,
                   help="random-proxy vocab (full 92553 only changes the "
                        "lm_head; 8192 keeps the gate fast)")
    p.add_argument("--prompts", type=int, default=4)
    p.add_argument("--prompt-len", type=int, default=96)
    p.add_argument("--new-tokens", type=int, default=64)
    p.add_argument("--no-smooth", action="store_true",
                   help="gate the raw per-token-absmax path (expected to "
                        "FAIL with outlier channels — the A in the A/B)")
    p.add_argument("--alpha", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--params-dir", default="",
                   help="converted QA checkpoint dir (UNquantized — "
                        "convert without --quantize; the gate smooths and "
                        "quantizes itself): gate REAL weights instead of "
                        "the random proxy")
    p.add_argument("--wq", choices=("w8a8", "int4", "kv8"), default="w8a8",
                   help="which quantized path to gate: the default-on "
                        "W8A8 prefill, the opt-in int4 group-wise "
                        "decode weights (reports int4's logit error "
                        "relative to the shipped int8 default), or the "
                        "default-on int8 KV cache (VGQA_KV_INT8=0 "
                        "opts out)")
    p.add_argument("--group-size", type=int, default=128,
                   help="int4 contraction-axis group size (--wq int4)")
    p.add_argument("--out", default="")
    args = p.parse_args(argv)
    if not args.out:
        args.out = {"int4": "GATE_INT4.json", "kv8": "GATE_KV8.json"}.get(
            args.wq, "GATE_W8A8.json")

    import jax.numpy as jnp

    from vgqa_tpu.qa.gate_w8a8 import run_gate
    from vgqa_tpu.qa.llm import LLMConfig

    params = None
    if args.params_dir:
        from vgqa_tpu.training.checkpoint import CheckpointManager

        tree = CheckpointManager(
            str(Path(args.params_dir).parent), save_to_disk=False
        ).load(None, args.params_dir)
        # the gate tree needs the llm weights + the embedding table
        params = dict(tree["llm"])
        params["tok_embeddings"] = tree["embed"]["tok_embeddings"]
        # a converted dir records its geometry; default to the production
        # InternVideo2.5 LLM otherwise
        import json as _json

        cfg_path = Path(args.params_dir).parent / "vgqa_tpu_config.json"
        if cfg_path.exists():
            with open(cfg_path) as f:
                cfg = LLMConfig(**_json.load(f).get("llm", {}))
        else:
            cfg = LLMConfig.internlm2_5_7b()
    else:
        cfg = LLMConfig(
            vocab_size=args.vocab, hidden_size=args.hidden,
            num_layers=args.layers, max_seq_len=4096,
        )

    if args.wq == "int4":
        from vgqa_tpu.qa.gate_w8a8 import run_gate_int4

        result = run_gate_int4(
            cfg, n_prompts=args.prompts, prompt_len=args.prompt_len,
            new_tokens=args.new_tokens, dtype=jnp.bfloat16, seed=args.seed,
            params=params, smooth=not args.no_smooth,
            smooth_alpha=args.alpha, group_size=args.group_size,
        )
    elif args.wq == "kv8":
        from vgqa_tpu.qa.gate_w8a8 import run_gate_kv_int8

        result = run_gate_kv_int8(
            cfg, n_prompts=args.prompts, prompt_len=args.prompt_len,
            new_tokens=args.new_tokens, dtype=jnp.bfloat16, seed=args.seed,
            params=params,
        )
    else:
        result = run_gate(
            cfg, n_prompts=args.prompts, prompt_len=args.prompt_len,
            new_tokens=args.new_tokens, dtype=jnp.bfloat16, seed=args.seed,
            params=params, smooth=not args.no_smooth,
            smooth_alpha=args.alpha,
        )
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    return result


if __name__ == "__main__":
    main()
