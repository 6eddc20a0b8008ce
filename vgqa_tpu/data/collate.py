"""Static-shape batch collation.

Replaces the reference collator (/root/reference/vgqa/data/
video_batch_collator.py:7-17 + NestedTensor.from_tensor_list): samples are
packed onto fixed [V, T_pad, res, res, 3] canvases with explicit masks, and
targets become dense per-frame tensors (GT boxes scattered onto their span
instead of the variable-length list + dynamic slice the reference's loss
performs, loss.py:213-221).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax.numpy as jnp
import numpy as np

from ..utils.containers import TextBatch, VideoBatch
from .tokenizer import batch_encode


def collate(
    samples: Sequence[Dict[str, Any]],
    tokenizer,
    pad_t: int,
    max_query_len: int,
    app_num: int,
    mot_num: int,
) -> Dict[str, Any]:
    """Returns {video: VideoBatch, text: TextBatch, targets: {...}, info: [...]}"""
    v = len(samples)
    res_h, res_w = samples[0]["frames"].shape[1:3]

    # dtype follows the transform tail: uint8 under TPU.UINT8_FEED (the
    # jitted step normalizes on device), f32 otherwise
    frames = np.zeros((v, pad_t, res_h, res_w, 3),
                      samples[0]["frames"].dtype)
    pixel_mask = np.zeros((v, res_h, res_w), bool)
    time_mask = np.zeros((v, pad_t), bool)
    boxes = np.zeros((v, pad_t, 4), np.float32)
    actioness = np.zeros((v, pad_t), np.float32)
    sted = np.zeros((v, 2), np.int32)
    attr = np.zeros((v, app_num), np.float32)
    verb = np.zeros((v, mot_num), np.float32)
    texts: List[str] = []
    info: List[Dict[str, Any]] = []

    for i, s in enumerate(samples):
        t = s["frames"].shape[0]
        assert t <= pad_t, (t, pad_t)
        frames[i, :t] = s["frames"]
        pixel_mask[i] = s.get("pixel_mask", np.ones((res_h, res_w), bool))
        time_mask[i, :t] = True
        act = np.asarray(s["actioness"], np.float32)
        actioness[i, :t] = act
        span = np.where(act > 0)[0]
        if span.size == 0:
            # corrupted/edge annotation: fail loudly with the sample identity
            # instead of an opaque IndexError inside the prefetch worker
            raise ValueError(
                "collate: sample has no positive actioness frame "
                f"(vid={s.get('vid', '?')!r}, item_id={s.get('item_id', i)!r})"
            )
        s0, s1 = int(span[0]), int(span[-1])
        sted[i] = (s0, s1)
        boxes[i, s0 : s1 + 1] = np.asarray(s["boxes"], np.float32)
        for idx in s.get("adj_index_list", []):
            if 0 <= idx < app_num:
                attr[i, idx] = 1.0
        for idx in s.get("verb_index_list", []):
            if 0 <= idx < mot_num:
                verb[i, idx] = 1.0
        texts.append(s["text"])
        info.append(
            {
                "item_id": s.get("item_id", i),
                "vid": s.get("vid", ""),
                "frame_ids": s.get("frame_ids", list(range(t))),
                "qtype": s.get("qtype", "none"),
                "ori_size": s.get("ori_size", (res_h, res_w)),
                # ori-pixels -> canvas-pixels affine (sx, sy, ox, oy); the
                # default (frames fill the canvas exactly) reproduces the
                # plain x*ori rescale for square-stretched inputs
                "letterbox": [float(v) for v in s["letterbox"]]
                if s.get("letterbox") is not None
                else [
                    res_w / s.get("ori_size", (res_h, res_w))[1],
                    res_h / s.get("ori_size", (res_h, res_w))[0],
                    0.0,
                    0.0,
                ],
                "duration": t,
            }
        )

    ids, tmask = batch_encode(tokenizer, texts, max_query_len)
    return {
        "video": VideoBatch(
            frames=jnp.asarray(frames),
            pixel_mask=jnp.asarray(pixel_mask),
            time_mask=jnp.asarray(time_mask),
        ),
        "text": TextBatch(token_ids=jnp.asarray(ids), mask=jnp.asarray(tmask)),
        "targets": {
            "boxes": jnp.asarray(boxes),
            "actioness": jnp.asarray(actioness),
            "time_mask": jnp.asarray(time_mask),
            "sted": jnp.asarray(sted),
            "attr_labels": jnp.asarray(attr),
            "verb_labels": jnp.asarray(verb),
        },
        "info": info,
    }
