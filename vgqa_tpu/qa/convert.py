"""QA-model weight converters: InternVL-family torch checkpoints -> the
native TPU engine's parameter trees.

The reference loads InternVideo2.5-Chat-8B via HF remote code
(/root/reference/vgqa/inference/qa.py:176-182). That checkpoint family is
InternViT-300M (vision) + InternLM2.5-7B (language) + an MLP projector;
these functions map its state dict onto qa/vit.py + qa/llm.py. Handles both
InternLM2's grouped-interleaved fused ``wqkv`` layout and llama-style
separate q/k/v projections.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..models.convert import StateDict, _dense, _linear, _ln
from .llm import LLMConfig
from .vit import ViTConfig


def split_internlm2_wqkv(
    w: np.ndarray, num_heads: int, num_kv_heads: int, head_dim: int
):
    """InternLM2 fused wqkv [(H + 2*KVH)*hd, D] -> (wq, wk, wv).

    Layout: per kv-group [group_q_heads..., k_head, v_head] interleaved —
    reshape to (KVH, group+2, hd, D)."""
    group = num_heads // num_kv_heads
    d = w.shape[1]
    w = w.reshape(num_kv_heads, group + 2, head_dim, d)
    wq = w[:, :group].reshape(num_kv_heads * group * head_dim, d)
    wk = w[:, group].reshape(num_kv_heads * head_dim, d)
    wv = w[:, group + 1].reshape(num_kv_heads * head_dim, d)
    return wq, wk, wv


def convert_internlm2(sd: StateDict, cfg: LLMConfig) -> Dict:
    """``language_model.*``-stripped InternLM2 dict -> (llm, embed) params."""
    llm: Dict = {}
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}"
        if f"{p}.attention.wqkv.weight" in sd:
            wq, wk, wv = split_internlm2_wqkv(
                sd[f"{p}.attention.wqkv.weight"],
                cfg.num_heads, cfg.num_kv_heads, cfg.head_dim,
            )
            o = sd[f"{p}.attention.wo.weight"]
            gate = sd[f"{p}.feed_forward.w1.weight"]
            up = sd[f"{p}.feed_forward.w3.weight"]
            down = sd[f"{p}.feed_forward.w2.weight"]
            attn_norm = sd[f"{p}.attention_norm.weight"]
            ffn_norm = sd[f"{p}.ffn_norm.weight"]
        else:  # llama/qwen naming
            wq = sd[f"{p}.self_attn.q_proj.weight"]
            wk = sd[f"{p}.self_attn.k_proj.weight"]
            wv = sd[f"{p}.self_attn.v_proj.weight"]
            o = sd[f"{p}.self_attn.o_proj.weight"]
            gate = sd[f"{p}.mlp.gate_proj.weight"]
            up = sd[f"{p}.mlp.up_proj.weight"]
            down = sd[f"{p}.mlp.down_proj.weight"]
            attn_norm = sd[f"{p}.input_layernorm.weight"]
            ffn_norm = sd[f"{p}.post_attention_layernorm.weight"]
        llm[f"layer_{i}"] = {
            "q_proj": {"kernel": _linear(wq)},
            "k_proj": {"kernel": _linear(wk)},
            "v_proj": {"kernel": _linear(wv)},
            "o_proj": {"kernel": _linear(o)},
            "gate_proj": {"kernel": _linear(gate)},
            "up_proj": {"kernel": _linear(up)},
            "down_proj": {"kernel": _linear(down)},
            "attn_norm": {"scale": attn_norm},
            "mlp_norm": {"scale": ffn_norm},
        }
    llm["final_norm"] = {"scale": sd["model.norm.weight"]}
    if "output.weight" in sd:
        llm["lm_head"] = {"kernel": _linear(sd["output.weight"])}
    else:
        llm["lm_head"] = {"kernel": _linear(sd["lm_head.weight"])}
    tok_key = (
        "model.tok_embeddings.weight"
        if "model.tok_embeddings.weight" in sd
        else "model.embed_tokens.weight"
    )
    embed = {"tok_embeddings": {"embedding": sd[tok_key]}}
    return llm, embed


def convert_internvit(sd: StateDict, cfg: ViTConfig, mlp1: StateDict) -> Dict:
    """``vision_model.*``-stripped InternViT dict + ``mlp1.*`` projector ->
    VisionTower params."""
    params: Dict = {
        "cls_token": sd["embeddings.class_embedding"].reshape(1, 1, -1),
        "pos_embed": sd["embeddings.position_embedding"].reshape(
            1, -1, cfg.hidden_size
        ),
        "patch_embed": {
            "kernel": np.transpose(
                sd["embeddings.patch_embedding.weight"], (2, 3, 1, 0)
            ),
            "bias": sd["embeddings.patch_embedding.bias"],
        },
    }
    for i in range(cfg.num_layers):
        p = f"encoder.layers.{i}"
        params[f"block_{i}"] = {
            "qkv": _dense(sd, f"{p}.attn.qkv"),
            "proj": _dense(sd, f"{p}.attn.proj"),
            "ls1": sd[f"{p}.ls1"],
            "ls2": sd[f"{p}.ls2"],
            "norm1": _ln(sd, f"{p}.norm1"),
            "norm2": _ln(sd, f"{p}.norm2"),
            "fc1": _dense(sd, f"{p}.mlp.fc1"),
            "fc2": _dense(sd, f"{p}.mlp.fc2"),
        }
    # mlp1 projector: [0]=LayerNorm, [1]=Linear, [3]=Linear (InternVL)
    params["proj_norm"] = _ln(mlp1, "0")
    params["proj_fc1"] = _dense(mlp1, "1")
    params["proj_fc2"] = _dense(mlp1, "3")
    return params


def convert_internvideo(sd: StateDict, llm_cfg: LLMConfig, vit_cfg: ViTConfig):
    """Full InternVideo2.5/InternVL chat checkpoint -> engine params
    {llm, embed, vision}."""

    def strip(prefix):
        return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    llm, embed = convert_internlm2(strip("language_model."), llm_cfg)
    vision = convert_internvit(
        strip("vision_model."), vit_cfg, strip("mlp1.")
    )
    return {"llm": llm, "embed": embed, "vision": vision}
