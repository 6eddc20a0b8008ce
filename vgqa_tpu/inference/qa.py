"""Video Question Answering inference API (TPU serving).

Parity with /root/reference/vgqa/inference/qa.py:192-248: sample frames
from the (optionally bounded) video segment, tile to 448px, run the
multimodal model, return ``{"answer": str}``.

The reference loads InternVideo2.5-Chat-8B via HF remote code on GPUs
(qa.py:156-189); here the model is the native TPU stack (qa/vit.py,
qa/llm.py, qa/engine.py). ``model_dir`` may contain converted weights
(tools/convert_weights.py); a missing dir raises like the reference, and
``model_dir="__tiny__"`` builds a small random model for hermetic tests.
"""

from __future__ import annotations

import json
import os
from functools import lru_cache
from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp

from ..qa.engine import GenerationConfig, QAEngine
from ..qa.llm import LLMConfig
from ..qa.preprocess import load_video_tiles, load_video_tiles_yuv
from ..qa.vit import ViTConfig


def _load_tiles(video_path, bound, input_size, max_num, num_segments):
    """Tile loader for serving: I420 planes when the native decoder can
    emit them (half the upload bytes; engine converts on device —
    VGQA_QA_YUV=0 forces RGB), RGB tiles otherwise. The YUV path covers
    only the max_num=1 video protocol (one stretched tile per frame)."""
    if max_num == 1 and os.environ.get("VGQA_QA_YUV", "1") != "0":
        out = load_video_tiles_yuv(
            video_path, bound=bound, input_size=input_size,
            num_segments=num_segments,
        )
        if out is not None:
            return out
    return load_video_tiles(
        video_path, bound=bound, input_size=input_size, max_num=max_num,
        num_segments=num_segments,
    )

DEFAULT_MODEL_DIR = "checkpoints/qa/InternVideo2_5_Chat_8B"


@lru_cache(maxsize=1)
def _load_engine(model_dir: str) -> QAEngine:
    if model_dir == "__tiny__":
        return QAEngine.init_random(LLMConfig.tiny(), ViTConfig.tiny())
    if not os.path.exists(model_dir):
        raise FileNotFoundError(
            f"QA model local directory not found: {model_dir}"
        )
    cfg_path = os.path.join(model_dir, "vgqa_tpu_config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            raw = json.load(f)
        llm_cfg = LLMConfig(**raw.get("llm", {}))
        vit_cfg = ViTConfig(**raw.get("vit", {}))
    else:
        llm_cfg = LLMConfig.internlm2_5_7b()
        vit_cfg = ViTConfig.internvit_300m()
    tokenizer = None
    sp_model = os.path.join(model_dir, "tokenizer.model")
    if os.path.exists(sp_model):
        from ..qa.sp_tokenizer import SentencePieceBPE

        tokenizer = SentencePieceBPE(sp_model)
    engine = QAEngine.init_random(
        llm_cfg, vit_cfg, tokenizer=tokenizer, dtype=jnp.bfloat16
    )
    weights = os.path.join(model_dir, "params")
    if os.path.exists(weights):
        # Converted orbax checkpoint (tools/convert_weights.py qa).
        # Restore in the checkpoint's OWN structure: a --quantize dir holds
        # kernel_q/kernel_q4+scales where the raw template has kernel, so a
        # template-driven restore would reject it. Float weights are then
        # cast to the engine dtype (bf16) — except quantization scales,
        # whose f32 precision the int8/int4 matmuls depend on.
        from ..training.checkpoint import CheckpointManager

        mgr = CheckpointManager(model_dir, save_to_disk=False)
        restored = mgr.load_saved(weights)
        if restored is not None:
            import jax

            keep_f32 = {"scale", "scale4"}

            def _cast(path, x):
                if x.dtype != jnp.float32:
                    return x
                if any(getattr(k, "key", None) in keep_f32 for k in path):
                    return x
                return x.astype(engine.dtype)

            engine.params = jax.tree_util.tree_map_with_path(_cast, restored)
    else:
        # raw HF torch checkpoint dir -> convert in place
        bins = [
            f for f in os.listdir(model_dir)
            if f.endswith(".bin") or f.endswith(".pth")
        ]
        if bins:
            import torch

            from ..models.convert import torch_state_dict_to_numpy
            from ..qa.convert import convert_internvideo

            sd = {}
            for f in sorted(bins):
                part = torch.load(
                    os.path.join(model_dir, f), map_location="cpu",
                    weights_only=False,
                )
                sd.update(torch_state_dict_to_numpy(part))
            converted = convert_internvideo(sd, llm_cfg, vit_cfg)
            import jax

            engine.params = jax.tree.map(
                lambda x: jnp.asarray(x, jnp.bfloat16), converted
            )
    return engine


def predict(
    video_path: str,
    question: str,
    bound: Optional[Tuple[float, float]] = None,
    model_dir: str = DEFAULT_MODEL_DIR,
    num_frames: int = 32,
    max_new_tokens: int = 128,
    temperature: float = 0.2,
    top_p: float = 0.9,
    input_size: int = 448,
    max_num: int = 1,
) -> Dict[str, Any]:
    """Run offline VideoQA (signature parity with qa.py:192-203)."""
    if not os.path.exists(video_path):
        raise FileNotFoundError(f"Video not found: {video_path}")

    engine = _load_engine(model_dir)
    tile_size = engine.vit_cfg.image_size  # tiny engine uses small tiles
    tiles, num_patches_list = _load_tiles(
        video_path,
        bound,
        tile_size if input_size == 448 else input_size,
        max_num,
        num_frames,
    )
    gen = GenerationConfig(
        max_new_tokens=max_new_tokens,
        temperature=max(temperature, 0.01),
        top_p=top_p,
        do_sample=temperature > 0,
    )
    answer = engine.chat(
        tiles, question, gen, num_patches_list=num_patches_list
    )
    return {"answer": str(answer)}


def predict_many(
    requests: List[Dict[str, Any]],
    model_dir: str = DEFAULT_MODEL_DIR,
) -> List[Any]:
    """Serve N VideoQA requests with ONE lockstep batched decode.

    ``requests``: dicts with ``video_path`` and ``question`` plus optional
    ``bound`` / ``num_frames`` / ``max_new_tokens`` / ``input_size`` /
    ``max_num`` (same meanings as :func:`predict`). Returns a list aligned
    with ``requests``: each slot is ``{"answer": str}`` or the exception
    raised while preparing that request — a bad video fails its own slot
    only, never the batch.

    Net-new over the reference, whose server runs strictly one
    ``model.chat`` at a time behind a single-flight lock
    (/root/reference/app/server.py:149-150,236-246): vision encode and
    prefill run per request into rows of a shared KV cache, then all rows
    decode together (``QAEngine.chat_batch``), so aggregate decode
    throughput scales with the coalesced batch. Each row keeps its own
    ``max_new_tokens`` / ``temperature`` / ``top_p`` (same defaults as
    :func:`predict`) with an independent RNG stream, so coalescing does
    not change any request's generation behavior.
    """
    engine = _load_engine(model_dir)
    tile_size = engine.vit_cfg.image_size
    out: List[Any] = [None] * len(requests)
    prepped, slots, gens = [], [], []
    for i, req in enumerate(requests):
        try:
            path = req["video_path"]
            if not os.path.exists(path):
                raise FileNotFoundError(f"Video not found: {path}")
            input_size = int(req.get("input_size", 448))
            tiles, num_patches_list = _load_tiles(
                path,
                req.get("bound"),
                tile_size if input_size == 448 else input_size,
                int(req.get("max_num", 1)),
                int(req.get("num_frames", 32)),
            )
            # pre-validate the prompt so an over-long request fails its own
            # slot here rather than raising out of chat_batch and failing
            # every coalesced request (engine.chat_batch re-derives the ids;
            # tokenization is negligible next to the decode)
            ids, _ = engine.build_prompt_ids(
                req["question"], num_patches_list)
            if len(ids) > engine.max_seq_len:
                raise ValueError(
                    f"prompt is {len(ids)} tokens but the model's context "
                    f"is {engine.max_seq_len}; reduce num_frames or tiles"
                )
            prepped.append((tiles, req["question"], num_patches_list))
            slots.append(i)
            temp = float(req.get("temperature", 0.2))
            gens.append(GenerationConfig(
                max_new_tokens=int(req.get("max_new_tokens", 128)),
                temperature=max(temp, 0.01),
                top_p=float(req.get("top_p", 0.9)),
                do_sample=temp > 0,
            ))
        except Exception as e:  # noqa: BLE001 - per-slot failure isolation
            out[i] = e
    if prepped:
        answers = engine.chat_batch(prepped, gens=gens)
        for i, ans in zip(slots, answers):
            out[i] = {"answer": str(ans)}
    return out
