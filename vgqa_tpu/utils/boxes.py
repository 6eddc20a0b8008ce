"""Box geometry ops (JAX + NumPy).

Functional equivalents of /root/reference/vgqa/utils/box_ops.py:44-97 (torch)
and :10-38 (numpy). The torch loss path computes a full NxM GIoU matrix and
takes its diagonal (/root/reference/vgqa/core/loss.py:36-38); here the paired
(elementwise) form is provided directly, which is what a TPU wants — no N^2
intermediate.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# format conversions
# ---------------------------------------------------------------------------
def box_cxcywh_to_xyxy(x: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (x_min, y_min, x_max, y_max); last-dim 4."""
    cx, cy, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(x: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1
    )


# ---------------------------------------------------------------------------
# paired (elementwise) IoU / GIoU — used by the grounding loss
# ---------------------------------------------------------------------------
def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes, any leading shape."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def paired_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Elementwise IoU of aligned xyxy boxes. Returns (iou, union)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    tl = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    br = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(br - tl, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    return inter / jnp.maximum(union, 1e-6), union


def paired_generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise GIoU of aligned xyxy boxes.

    Matches diag(generalized_box_iou(b1, b2)) of the reference
    (/root/reference/vgqa/utils/box_ops.py:91-97) without the NxM matrix.
    """
    iou, union = paired_box_iou(boxes1, boxes2)
    enc_tl = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    enc_br = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    enc_wh = jnp.clip(enc_br - enc_tl, 0.0)
    enc_area = enc_wh[..., 0] * enc_wh[..., 1]
    return iou - (enc_area - union) / jnp.maximum(enc_area, 1e-6)


# ---------------------------------------------------------------------------
# pairwise (NxM) IoU — used by matrix-style callers
# ---------------------------------------------------------------------------
def box_iou_matrix(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix [N, M] for xyxy boxes."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    tl = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    br = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(br - tl, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return inter / jnp.maximum(union, 1e-6)


# ---------------------------------------------------------------------------
# NumPy helpers for the host-side evaluator
# (parity with /root/reference/vgqa/utils/box_ops.py:10-38)
# ---------------------------------------------------------------------------
def np_box_area(boxes: np.ndarray) -> np.ndarray:
    assert boxes.ndim == 2 and boxes.shape[-1] == 4
    return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])


def np_box_iou(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    """IoU matrix [N, M] for xyxy numpy boxes."""
    area1 = np_box_area(boxes1)
    area2 = np_box_area(boxes2)
    tl = np.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    br = np.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = np.clip(br - tl, 0, None)
    inter = wh[:, :, 0] * wh[:, :, 1]
    union = area1[:, None] + area2[None, :] - inter
    return inter / np.maximum(union, 1e-12)
