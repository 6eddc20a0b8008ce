"""One-command accuracy-parity artifact: convert -> evaluate -> PARITY_RESULT.json.

The north-star deliverable (BASELINE.json: m_vIoU within 0.2 points of the
PyTorch reference) needs the VidSTG data and the TA-STVG `vidstg.pth`
checkpoint, neither present in this environment (no network —
/root/reference/setup.sh:24). This tool makes the measurement a single
command the day the assets exist:

    python tools/parity_run.py \
        --vidstg-pth /assets/checkpoints/grounding/vidstg.pth \
        --data-dir   /assets/vidstg \
        [--config-file configs/grounding_vidstg.yaml] \
        [--reference-json ref_metrics.json]   # reference-side numbers, if
                                              # measured with the reference's
                                              # tools/evaluate.py elsewhere
        [--out PARITY_RESULT.json]

It (1) converts the torch checkpoint with exhaustive key accounting
(every leaf of our model tree must be produced, shapes checked), (2) runs
the reference evaluation protocol — 128-frame test clips in even/odd
64-frame passes merged by interpolation (tools/evaluate.py:78-135 /
training/evaluator.py:110-138 of the reference) — and (3) writes a
PARITY_RESULT.json with the metrics, the targets, and pass/fail deltas
when reference numbers are supplied.

`--dry-run` proves the whole chain with zero assets: a synthetic VidSTG
dataset plus a random reference-SHAPED torch checkpoint (tiny geometry,
vgqa_tpu/models/reference_shapes.py) flows through the identical code
path; exercised in the suite (tests/test_parity_toolchain.py) so the
command is known-good before assets ever arrive.
"""

import argparse
import json
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vgqa_tpu.utils.platform import apply_platform_env

apply_platform_env()

# headline parity metrics and the maximum tolerated |ours - reference|
PARITY_TARGETS = {
    "m_viou": 0.2,   # BASELINE.json north star (points, 0-100 scale -> 0.002
                     # on the evaluator's 0-1 scale; we compare on the scale
                     # the numbers are supplied in — see _delta)
    "m_tiou": 0.5,
}


def _resnet_depths(name: str):
    return {
        "resnet50": (3, 4, 6, 3),
        "resnet101": (3, 4, 23, 3),
        "resnet_test": (1, 1, 1, 1),
    }[name.replace("-gn", "")]


def _swin_depths(name: str):
    from vgqa_tpu.models.video_swin import VIDEO_SWIN_CONFIGS

    return tuple(VIDEO_SWIN_CONFIGS[name].depths)


def _headline(metrics: dict) -> dict:
    """Average the per-question-type means into overall m_tIoU / m_vIoU
    (the reference logs per-type; the headline is their mean)."""
    out = {}
    for short, pick in (
        ("m_tiou", lambda k: k.endswith("_tiou")),
        ("m_viou", lambda k: k.endswith("_viou") and "gt_viou" not in k
         and "@" not in k),
        ("m_gt_viou", lambda k: k.endswith("_gt_viou") and "@" not in k),
    ):
        vals = [v for k, v in metrics.items() if pick(k)]
        if vals:
            out[short] = float(sum(vals) / len(vals))
    return out


def _make_dry_run_assets(tmp: str):
    """Synthetic dataset + random reference-shaped torch checkpoint."""
    import numpy as np
    import torch

    from vgqa_tpu.data.synthetic import make_synthetic_dataset
    from vgqa_tpu.models.reference_shapes import build_reference_state_dict

    data_dir = os.path.join(tmp, "data")
    make_synthetic_dataset(data_dir, num_videos=2, frames_per_video=20)
    sd = build_reference_state_dict()
    pth = os.path.join(tmp, "vidstg.pth")
    torch.save({"model": {k: torch.from_numpy(np.asarray(v))
                          for k, v in sd.items()}}, pth)
    return data_dir, pth


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--vidstg-pth", default="",
                        help="reference torch checkpoint (TA-STVG vidstg.pth)")
    parser.add_argument("--data-dir", default="", help="VidSTG dataset root")
    parser.add_argument("--config-file", default="",
                        help="defaults to configs/grounding_vidstg.yaml "
                             "(tiny config under --dry-run)")
    parser.add_argument("--reference-json", default="",
                        help="JSON of reference-side metrics (same key "
                             "names, e.g. from the reference tools/"
                             "evaluate.py) to diff against")
    parser.add_argument("--qa-model-dir", default="",
                        help="optional converted QA model dir; runs a smoke "
                             "question through the QA engine")
    parser.add_argument("--qa-gate", action="store_true",
                        help="with --qa-model-dir (an UNquantized converted "
                             "dir): run the strict real-weights accuracy "
                             "gates for every shipped quantized path "
                             "(w8a8 prefill, int4 decode weights, int8 KV "
                             "cache) and record their verdicts — the "
                             "asset-day artifact then covers grounding "
                             "parity AND the QA quantization decisions in "
                             "one command")
    parser.add_argument("--out", default="PARITY_RESULT.json")
    parser.add_argument("--dry-run", action="store_true",
                        help="synthetic data + random reference-shaped "
                             "checkpoint; proves the chain without assets")
    parser.add_argument("--data-trunk", type=int, default=0,
                        help="evaluate only the first N test items (0=all)")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from vgqa_tpu.config import build_default_cfg
    from vgqa_tpu.data.loader import make_data_loader
    from vgqa_tpu.data.metrics import build_evaluator
    from vgqa_tpu.models import GroundingConfig, VSTGNet
    from vgqa_tpu.models.convert import check_tree_shapes
    from vgqa_tpu.models.convert_grounding import convert_grounding_reference
    from vgqa_tpu.training.evaluator import do_eval
    from vgqa_tpu.utils.log_setup import setup_logger

    tmp_ctx = tempfile.TemporaryDirectory(prefix="parity_")
    with tmp_ctx as tmp:
        if args.dry_run:
            data_dir, pth = _make_dry_run_assets(tmp)
            config_file = args.config_file or "configs/grounding_vidstg_tiny.yaml"
        else:
            if not (args.vidstg_pth and args.data_dir):
                parser.error("--vidstg-pth and --data-dir are required "
                             "(or use --dry-run)")
            data_dir, pth = args.data_dir, args.vidstg_pth
            config_file = args.config_file or "configs/grounding_vidstg.yaml"

        cfg = build_default_cfg()
        cfg.merge_from_file(config_file)
        cfg.DATA_DIR = data_dir
        if args.data_trunk:
            cfg.DATA_TRUNK = args.data_trunk
        cfg.OUTPUT_DIR = os.path.join(tmp, "out")
        cfg.merge_from_list(args.opts or [])
        cfg.freeze()
        gcfg = GroundingConfig.from_cfg(cfg)
        logger = setup_logger("parity_run", cfg.OUTPUT_DIR, jax.process_index())

        # 1) convert with exhaustive key accounting ------------------------
        sys.path.insert(0, str(Path(__file__).resolve().parent))
        from convert_weights import _load_torch_sd

        sd = _load_torch_sd(pth)
        logger.info(f"loaded {len(sd)} reference tensors from {pth}")
        converted = convert_grounding_reference(
            sd,
            enc_layers=gcfg.enc_layers,
            dec_layers=gcfg.dec_layers,
            resnet_depths=_resnet_depths(gcfg.resnet),
            swin_depths=_swin_depths(gcfg.swin),
            roberta_layers=gcfg.text.num_layers,
        )
        converted = jax.tree.map(jnp.asarray, converted)

        model = VSTGNet(gcfg)
        loader = make_data_loader(cfg, "test", global_batch=1)
        example = next(iter(make_data_loader(cfg, "test", global_batch=1)))
        init = jax.jit(
            lambda rng: model.init(
                rng, example["video"], example["text"], train=False)
        )(jax.random.PRNGKey(0))
        # every leaf of the model tree must exist in the converted tree
        # with the exact shape — a missing head or transposed kernel fails
        # here, not as a silently-wrong metric
        check_tree_shapes(converted["params"], init["params"])
        n_leaves = len(jax.tree.leaves(converted))
        logger.info(f"key accounting exact: {n_leaves} converted leaves")

        # 2) reference-protocol evaluation ---------------------------------
        evaluator = build_evaluator(cfg, logger, mode="test")
        metrics = do_eval(cfg, "test", logger, model, converted, loader,
                          evaluator)
        headline = _headline(metrics)

        # 3) diff vs reference numbers, if supplied ------------------------
        reference = None
        deltas = None
        passed = None
        if args.reference_json:
            with open(args.reference_json) as f:
                reference = json.load(f)
            ref_headline = _headline(reference) or {
                k: reference[k] for k in PARITY_TARGETS if k in reference
            }
            deltas = {
                k: abs(headline[k] - ref_headline[k])
                for k in PARITY_TARGETS
                if k in headline and k in ref_headline
            }
            passed = bool(deltas) and all(
                d <= PARITY_TARGETS[k] for k, d in deltas.items()
            )

        qa_answer = None
        qa_gates = None
        if args.qa_model_dir:
            from vgqa_tpu.inference.qa import predict as qa_predict
            from vgqa_tpu.data.synthetic import write_synthetic_video

            vid = os.path.join(tmp, "qa_smoke.mp4")
            write_synthetic_video(vid, 24, (64, 64))
            qa_answer = qa_predict(
                vid, "Describe the video.", model_dir=args.qa_model_dir,
                temperature=0.0, num_frames=8,
            )
            if args.qa_gate:
                # strict real-weights gates for the quantized serving paths
                # (gate_w8a8.py switches to its strict criteria when given
                # real params); a failure is a RESULT — record it per path
                from gate_w8a8 import main as gate_main

                gate_dir = os.path.join(args.qa_model_dir, "params")
                qa_gates = {}
                for wq in ("w8a8", "int4", "kv8"):
                    try:
                        qa_gates[wq] = gate_main([
                            "--params-dir", gate_dir, "--wq", wq,
                            "--out", os.path.join(tmp, f"gate_{wq}.json"),
                        ])
                    except Exception as e:  # missing/quantized dir etc.
                        qa_gates[wq] = {
                            "error": f"{type(e).__name__}: {e}"}
                    logger.info(f"qa gate {wq}: "
                                f"{qa_gates[wq].get('pass', 'error')}")

        result = {
            "dry_run": bool(args.dry_run),
            "checkpoint": pth if not args.dry_run else "<synthetic>",
            "data_dir": data_dir if not args.dry_run else "<synthetic>",
            "config": config_file,
            "protocol": "128-frame test clips, even/odd 64-frame passes, "
                        "interp merge (reference tools/evaluate.py:78-135)",
            "converted_leaves": n_leaves,
            "key_accounting": "exact",
            "headline": headline,
            "metrics": {k: float(v) for k, v in metrics.items()},
            "targets": PARITY_TARGETS,
            "reference": reference,
            "deltas": deltas,
            "pass": passed,
        }
        if qa_answer is not None:
            result["qa_smoke"] = qa_answer
        if qa_gates is not None:
            result["qa_gates"] = {
                wq: {k: g[k] for k in ("pass", "error", "criteria")
                     if k in g}
                for wq, g in qa_gates.items()
            }
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2, default=float)
        print(json.dumps({"headline": headline, "pass": passed,
                          "out": args.out}, indent=2))
    return result


if __name__ == "__main__":
    main()
