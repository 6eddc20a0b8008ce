"""Convert pretrained torch checkpoints into vgqa_tpu parameter trees.

Subcommands:
  grounding  — a reference-framework VSTGNet checkpoint (e.g. the TA-STVG
               vidstg.pth release) -> full model params (orbax dir)
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
    for name in ("grounding", "resnet", "roberta", "video_swin", "qa"):
        p = sub.add_parser(name)
        p.add_argument("--src", required=True, help="torch checkpoint path")
        p.add_argument("--dst", required=True, help="output orbax dir")
        if name == "qa":
            p.add_argument("--quantize", action="store_true",
                           help="int8 weight-only quantize the LLM")
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

        tree = convert_internvideo(
            sd, LLMConfig.internlm2_5_7b(), ViTConfig.internvit_300m()
        )
        if args.quantize:
            from vgqa_tpu.qa.quant import quantize_llm_params

            tree["llm"] = quantize_llm_params(tree["llm"])
        _save(tree, args.dst)
        return

    sd = _load_torch_sd(args.src)
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
