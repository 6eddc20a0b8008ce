"""Prediction post-processing (pure jnp).

Parity with ``PostProcess`` (/root/reference/vgqa/core/postprocessor.py:10-50):
boxes are rescaled cxcywh->xyxy into original pixel space, and the temporal
span is the argmax of the start+end log-softmax map restricted to the
lower-triangle-excluded (start < end) and valid-frame region. The reference
builds the map with a Python loop over batch; here it is one masked batched
computation.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..utils.boxes import box_cxcywh_to_xyxy

NEG = -1e32


def postprocess(
    pred_boxes: jnp.ndarray,   # [V, T, 4] cxcywh in [0, 1]
    pred_sted: jnp.ndarray,    # [V, T, 2] logits
    target_sizes: jnp.ndarray,  # [V, 2] (h, w) original pixels
    time_mask: jnp.ndarray,    # [V, T] bool
    letterbox: jnp.ndarray | None = None,  # [V, 4] (sx, sy, ox, oy)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (boxes_xyxy [V, T, 4], start_idx [V], end_idx [V]).

    ``letterbox`` inverts the static-canvas letterbox the data pipeline
    applied: normalized canvas coord ``n`` maps back to original pixels as
    ``(n - o) / s`` per axis (the reference's plain ``n * ori`` rescale,
    postprocessor.py:27-35, is exact only for its unpadded variable-size
    frames; with a letterboxed canvas the pad offset and content scale must
    come out first). This path also clips to the image bounds — on a
    letterboxed canvas the model can place box edges inside the pad band,
    which would otherwise invert to coordinates beyond the original frame
    (deliberately stricter than the reference's clamp(min=0)-only). All
    production callers pass a letterbox (single_forward synthesizes an
    identity-offset one when the data pipeline recorded none); ``None``
    keeps the reference's literal clamp(min=0) rescale for parity tests."""
    boxes = box_cxcywh_to_xyxy(pred_boxes)
    h = target_sizes[:, 0:1]
    w = target_sizes[:, 1:2]
    if letterbox is not None:
        s = letterbox[:, None, [0, 1, 0, 1]]
        o = letterbox[:, None, [2, 3, 2, 3]]
        upper = jnp.concatenate([w, h, w, h], axis=-1)[:, None, :]
        boxes = jnp.clip((boxes - o) / s, 0.0, upper)
    else:
        # reference parity: clamp(min=0) only (postprocessor.py:23)
        scale = jnp.concatenate([w, h, w, h], axis=-1)[:, None, :]
        boxes = jnp.clip(boxes * scale, 0.0)

    V, T, _ = pred_sted.shape
    sted = jnp.where(time_mask[..., None], pred_sted.astype(jnp.float32), NEG)
    start_lp = jax.nn.log_softmax(sted[..., 0], axis=-1)  # [V, T]
    end_lp = jax.nn.log_softmax(sted[..., 1], axis=-1)
    prob_map = start_lp[:, :, None] + end_lp[:, None, :]   # [V, Ts, Te]

    idx = jnp.arange(T)
    valid = (idx[:, None] < idx[None, :])                  # start < end
    valid = valid & time_mask[:, :, None] & time_mask[:, None, :]
    prob_map = jnp.where(valid, prob_map, NEG)

    flat = prob_map.reshape(V, T * T)
    best = jnp.argmax(flat, axis=-1)
    return boxes, best // T, best % T
