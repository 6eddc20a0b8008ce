"""VideoSTGLoss — grounding training losses, fully masked/static.

Functional parity with /root/reference/vgqa/core/loss.py:13-262 under the
reference's regime (batch=1 exact-duration clips). Structural differences:

* GT-span box slicing (``gt_bbox_slice`` dynamic gather, loss.py:213-221)
  becomes a per-frame ``box_mask`` = actioness & time_mask; boxes come
  pre-aligned per frame from the data pipeline.
* ``num_boxes`` is all-reduced across data-parallel shards with
  ``lax.psum`` when an axis name is given (replacing
  ``torch.distributed.all_reduce``, loss.py:226-228).
* Verb/attribute targets arrive as multi-hot vectors (the reference builds
  them from index lists on the fly, loss.py:69-71,84-86).

Target dict layout (all [V, ...] jnp arrays):
  boxes       [V, T, 4] cxcywh in [0,1], valid where actioness
  actioness   [V, T]    float 0/1
  time_mask   [V, T]    bool
  sted        [V, 2]    int start/end frame indices within the clip
  attr_labels [V, APP]  float multi-hot
  verb_labels [V, MOT]  float multi-hot
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from ..utils.boxes import box_cxcywh_to_xyxy, paired_generalized_box_iou


def _bce_logits(logits, targets, weight=None):
    """Elementwise binary cross-entropy on logits (stable form)."""
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    if weight is not None:
        loss = loss * weight
    return loss


def _global_num_boxes(actioness, time_mask, axis_name):
    num = (actioness * time_mask).sum()
    if axis_name is not None:
        num = jax.lax.psum(num, axis_name)
        world = jax.lax.psum(jnp.ones(()), axis_name)
    else:
        world = 1.0
    return jnp.maximum(num / world, 1.0)


class VideoSTGLoss:
    """Callable loss bundle. ``losses`` selects terms, parity with
    build_model's list (/root/reference/vgqa/core/__init__.py:41-45)."""

    def __init__(
        self,
        sigma: float = 2.0,
        eos_coef: float = 0.1,
        losses: Optional[List[str]] = None,
        use_aux_loss: bool = True,
        axis_name: Optional[str] = None,
    ):
        self.sigma = sigma
        self.eos_coef = eos_coef
        self.losses = losses or [
            "boxes", "sted", "logits_f_m", "logits_f_a",
            "logits_r_a", "logits_r_m", "actioness",
        ]
        self.use_aux_loss = use_aux_loss
        self.axis_name = axis_name

    # -- individual terms -------------------------------------------------
    def loss_boxes(self, outputs, targets, num_boxes):
        """L1 + GIoU over GT-span frames (loss.py:23-40)."""
        box_mask = (targets["actioness"] > 0) & targets["time_mask"]
        m = box_mask.astype(jnp.float32)
        pred = outputs["pred_boxes"].astype(jnp.float32)
        tgt = targets["boxes"].astype(jnp.float32)
        l1 = jnp.abs(pred - tgt).sum(-1) * m
        giou = paired_generalized_box_iou(
            box_cxcywh_to_xyxy(pred), box_cxcywh_to_xyxy(tgt)
        )
        return {
            "loss_bbox": l1.sum() / num_boxes,
            "loss_giou": ((1.0 - giou) * m).sum() / num_boxes,
        }

    def loss_sted(self, outputs, targets, num_boxes):
        """KL divergence vs quantized Gaussian start/end targets
        (loss.py:110-156)."""
        sted = outputs["pred_sted"].astype(jnp.float32)  # [V, T, 2]
        tm = targets["time_mask"]
        V, T, _ = sted.shape
        eps = 1e-6
        sted = jnp.where(tm[..., None], sted, -1e32)
        frames = jnp.arange(T, dtype=jnp.float32)[None, :]

        def kl(pred_logits, target_center):
            dist = jnp.exp(
                -((frames - target_center[:, None].astype(jnp.float32)) ** 2)
                / (2 * self.sigma**2)
            )
            dist = dist + eps
            dist = dist / dist.sum(-1, keepdims=True)
            prob = jax.nn.softmax(pred_logits, axis=-1)
            loss = prob * jnp.log((prob + eps) / dist)
            return loss * tm

        loss = kl(sted[..., 0], targets["sted"][:, 0]) + kl(
            sted[..., 1], targets["sted"][:, 1]
        )
        # reference means over every (b, t) cell (loss.py:155)
        return {"loss_sted": loss.sum() / (V * T)}

    def loss_actioness(self, outputs, targets, num_boxes):
        """Foreground-weighted BCE (loss.py:90-108)."""
        pred = outputs["pred_actioness"][..., 0].astype(jnp.float32)
        act = targets["actioness"].astype(jnp.float32)
        tm = targets["time_mask"].astype(jnp.float32)
        T = pred.shape[1]
        frames = jnp.arange(T)[None, :]
        inside = (frames >= targets["sted"][:, :1]) & (frames <= targets["sted"][:, 1:2])
        weight = jnp.where(inside, 1.0, self.eos_coef)
        loss = _bce_logits(pred, act, weight) * tm
        return {"loss_actioness": loss.mean()}

    def _temporal_bce(self, logits, targets):
        act = targets["actioness"].astype(jnp.float32)
        tm = targets["time_mask"].astype(jnp.float32)
        loss = _bce_logits(logits.astype(jnp.float32), act) * tm
        # mean over valid frames (== reference's plain mean for exact clips)
        return loss.sum() / jnp.maximum(tm.sum(), 1.0)

    def loss_logits_f_m(self, outputs, targets, num_boxes):
        return {"logits_f_m": self._temporal_bce(outputs["logits_f_m"], targets)}

    def loss_logits_f_a(self, outputs, targets, num_boxes):
        return {"logits_f_a": self._temporal_bce(outputs["logits_f_a"], targets)}

    def loss_logits_r_a(self, outputs, targets, num_boxes):
        loss = _bce_logits(
            outputs["logits_r_a"].astype(jnp.float32), targets["attr_labels"]
        )
        return {"logits_r_a": loss.mean()}

    def loss_logits_r_m(self, outputs, targets, num_boxes):
        loss = _bce_logits(
            outputs["logits_r_m"].astype(jnp.float32), targets["verb_labels"]
        )
        return {"logits_r_m": loss.mean()}

    # -- driver -----------------------------------------------------------
    def __call__(self, outputs: Dict, targets: Dict) -> Dict[str, jnp.ndarray]:
        num_boxes = _global_num_boxes(
            targets["actioness"], targets["time_mask"], self.axis_name
        )
        term_map = {
            "boxes": self.loss_boxes,
            "sted": self.loss_sted,
            "actioness": self.loss_actioness,
            "logits_f_m": self.loss_logits_f_m,
            "logits_f_a": self.loss_logits_f_a,
            "logits_r_a": self.loss_logits_r_a,
            "logits_r_m": self.loss_logits_r_m,
        }
        losses: Dict[str, jnp.ndarray] = {}
        for name in self.losses:
            losses.update(term_map[name](outputs, targets, num_boxes))

        if self.use_aux_loss and "aux_outputs" in outputs:
            for i, aux in enumerate(outputs["aux_outputs"]):
                # logits_* heads are not per-layer (loss.py:255-256)
                for name in self.losses:
                    if name.startswith("logits"):
                        continue
                    for k, v in term_map[name](aux, targets, num_boxes).items():
                        losses[f"{k}_{i}"] = v
        return losses


def build_weight_dict(cfg) -> Dict[str, float]:
    """Loss weights, parity with /root/reference/vgqa/core/__init__.py:19-39."""
    s = cfg.SOLVER
    wd = {
        "loss_bbox": s.BBOX_COEF,
        "loss_giou": s.GIOU_COEF,
        "loss_sted": s.TEMP_COEF,
        "logits_f_m": s.CONF_COEF,
        "logits_f_a": s.CONF2_COEF,
        "logits_r_a": s.CONF3_COEF,
        "logits_r_m": s.CONF4_COEF,
    }
    if cfg.MODEL.VSTG.USE_ACTION:
        wd["loss_actioness"] = s.ACTIONESS_COEF
    if s.USE_AUX_LOSS:
        aux = {}
        for i in range(cfg.MODEL.VSTG.DEC_LAYERS - 1):
            aux.update({f"{k}_{i}": v for k, v in wd.items()})
        wd.update(aux)
    return wd
