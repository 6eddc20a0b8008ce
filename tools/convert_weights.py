"""Convert pretrained torch checkpoints into vgqa_tpu parameter trees.

Subcommands:
  grounding  — a reference-framework VSTGNet checkpoint (e.g. the TA-STVG
               vidstg.pth release) -> full model params (orbax dir)
  mdetr      — an MDETR/TubeDETR-format pretrained checkpoint -> full model
               params: warm-startable components (backbone, text tower,
               input_proj, encoder layers, TubeDETR decoders) are remapped
               (reference checkpoint_manager.py:118-164), the rest keep
               fresh initialization; requires --config for model shape
  resnet     — torchvision ResNet-50/101 state dict -> backbone subtree
  roberta    — HF RobertaModel state dict -> text tower subtree
  video_swin — K400 Video Swin checkpoint -> Swin subtree

All subcommands write an orbax checkpoint directory loadable by
CheckpointManager / inference predict().
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vgqa_tpu.utils.platform import apply_platform_env

apply_platform_env()


def _load_torch_sd(path: str):
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for key in ("state_dict", "model", "model_ema"):
            if key in ckpt and isinstance(ckpt[key], dict):
                ckpt = ckpt[key]
                break
    from vgqa_tpu.models.convert import torch_state_dict_to_numpy

    sd = torch_state_dict_to_numpy(ckpt)
    # strip a DDP "module." prefix if present
    if all(k.startswith("module.") for k in sd):
        sd = {k[len("module.") :]: v for k, v in sd.items()}
    return sd


def _save(tree, dst: str):
    import jax.numpy as jnp
    import jax

    from vgqa_tpu.training.checkpoint import CheckpointManager

    tree = jax.tree.map(jnp.asarray, tree)
    mgr = CheckpointManager(str(Path(dst).parent) or ".")
    mgr.save(Path(dst).name, tree)
    print(f"wrote {dst}")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)
    for name in ("grounding", "mdetr", "resnet", "roberta", "video_swin", "qa"):
        p = sub.add_parser(name)
        p.add_argument("--src", required=True, help="torch checkpoint path")
        p.add_argument("--dst", required=True, help="output orbax dir")
        if name == "qa":
            p.add_argument("--quantize", action="store_true",
                           help="int8 weight-only quantize the LLM")
            p.add_argument("--wq", choices=("int8", "int4"), default="int8",
                           help="with --quantize: int8 per-channel "
                                "(default, W8A8-prefill capable) or int4 "
                                "group-128 (lm_head stays int8; halves the "
                                "decode weight read — opt-in, verify "
                                "accuracy on your eval set first)")
            p.add_argument("--no-smooth", action="store_true",
                           help="skip the SmoothQuant activation-outlier "
                                "fold before quantizing (the fold is exact "
                                "in fp and costs nothing at runtime; it is "
                                "what lets W8A8 prefill pass the accuracy "
                                "gate — tools/gate_w8a8.py)")
            p.add_argument("--calib-ids", default="",
                           help="optional .npy of [B, L] int token ids for "
                                "smoothing calibration (default: random "
                                "ids over the vocab)")
        if name == "mdetr":
            p.add_argument("--config", required=True,
                           help="model config yaml (for fresh-init shapes)")
    args = parser.parse_args()

    if args.cmd == "qa":
        # src may be a directory of sharded .bin files
        import os as _os

        if _os.path.isdir(args.src):
            sd = {}
            for f in sorted(_os.listdir(args.src)):
                if f.endswith(".bin") or f.endswith(".pth"):
                    sd.update(_load_torch_sd(_os.path.join(args.src, f)))
        else:
            sd = _load_torch_sd(args.src)
        from vgqa_tpu.qa.convert import convert_internvideo
        from vgqa_tpu.qa.llm import LLMConfig
        from vgqa_tpu.qa.vit import ViTConfig

        llm_cfg = LLMConfig.internlm2_5_7b()
        tree = convert_internvideo(
            sd, llm_cfg, ViTConfig.internvit_300m()
        )
        if args.quantize:
            from vgqa_tpu.qa.quant import (collect_smooth_stats,
                                           quantize_llm_params,
                                           quantize_llm_params_int4,
                                           smooth_llm_params)

            if not args.no_smooth:
                import numpy as np

                if args.calib_ids:
                    ids = np.load(args.calib_ids)
                else:
                    ids = np.random.RandomState(0).randint(
                        0, llm_cfg.vocab_size, size=(1, 256))
                calib_tree = dict(tree["llm"])
                calib_tree["tok_embeddings"] = (
                    tree["embed"]["tok_embeddings"])
                stats = collect_smooth_stats(calib_tree, llm_cfg, ids)
                tree["llm"] = smooth_llm_params(tree["llm"], llm_cfg, stats)
                print("applied SmoothQuant fold (alpha=0.5, "
                      f"{ids.shape[0]}x{ids.shape[1]} calibration tokens)")
            else:
                print("WARNING: quantizing without the SmoothQuant fold — "
                      "serve with VGQA_W8A8_PREFILL=0 (the default-on W8A8 "
                      "prefill is gated on smoothed weights; "
                      "tools/gate_w8a8.py)")
            if args.wq == "int4":
                # smoothing folds still help (they shrink weight-row
                # outliers the group scales must cover)
                tree["llm"] = quantize_llm_params_int4(tree["llm"])
            else:
                tree["llm"] = quantize_llm_params(tree["llm"])
        _save(tree, args.dst)
        return

    sd = _load_torch_sd(args.src)
    if args.cmd == "mdetr":
        import jax
        import jax.numpy as jnp

        from vgqa_tpu.config import build_default_cfg
        from vgqa_tpu.models import GroundingConfig, VSTGNet
        from vgqa_tpu.models.convert_grounding import (
            convert_mdetr_warmstart,
            merge_partial_params,
        )
        from vgqa_tpu.utils.containers import TextBatch, VideoBatch

        cfg = build_default_cfg()
        cfg.merge_from_file(args.config)
        gcfg = GroundingConfig.from_cfg(cfg)
        model = VSTGNet(gcfg)
        # param shapes don't depend on input resolution: init tiny
        video = VideoBatch(
            frames=jnp.zeros((1, 2, 64, 64, 3)),
            pixel_mask=jnp.ones((1, 64, 64), bool),
            time_mask=jnp.ones((1, 2), bool),
        )
        text = TextBatch(jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), bool))
        init = jax.jit(
            lambda rng: model.init(rng, video, text, train=False)
        )(jax.random.PRNGKey(0))
        partial, loaded = convert_mdetr_warmstart(
            sd,
            enc_layers=gcfg.enc_layers,
            dec_layers=gcfg.dec_layers,
            resnet_depths={"resnet50": (3, 4, 6, 3)}.get(
                gcfg.resnet.replace("-gn", ""), (3, 4, 23, 3)
            ),
            roberta_layers=gcfg.text.num_layers,
        )
        tree, n_loaded, skipped = merge_partial_params(init, partial)
        print(f"warm-started components: {loaded}")
        print(f"leaves loaded: {n_loaded}, shape-skipped: {len(skipped)}")
        if skipped:
            print("skipped:", skipped[:10])
        _save(tree, args.dst)
        return
    if args.cmd == "grounding":
        # strip a "backbone." prefix some releases carry on the Swin subtree
        from vgqa_tpu.models.convert_grounding import convert_grounding_reference

        tree = convert_grounding_reference(sd)
    elif args.cmd == "resnet":
        from vgqa_tpu.models.convert import convert_resnet

        depths = (3, 4, 6, 3) if "--resnet50" in sys.argv else (3, 4, 23, 3)
        tree = convert_resnet(sd, depths)
    elif args.cmd == "roberta":
        from vgqa_tpu.models.convert import convert_roberta

        tree = convert_roberta(sd)
    elif args.cmd == "video_swin":
        from vgqa_tpu.models.convert import convert_video_swin

        if any(k.startswith("backbone.") for k in sd):
            sd = {k[len("backbone.") :]: v for k, v in sd.items()
                  if k.startswith("backbone.")}
        tree = convert_video_swin(sd)
    _save(tree, args.dst)


if __name__ == "__main__":
    main()
