"""Model library for the grounding family.

``build_model(cfg)`` mirrors the reference factory
(/root/reference/vgqa/core/__init__.py:8-49): returns the model, the loss
bundle, and the loss-weight dict.
"""

from .loss import VideoSTGLoss, build_weight_dict
from .postprocess import postprocess
from .vstgnet import GroundingConfig, VSTGNet


def build_model(cfg, axis_name=None):
    gcfg = GroundingConfig.from_cfg(cfg)
    model = VSTGNet(gcfg)
    losses = ["boxes", "sted", "logits_f_m", "logits_f_a", "logits_r_a", "logits_r_m"]
    if cfg.MODEL.VSTG.USE_ACTION:
        losses.append("actioness")
    loss = VideoSTGLoss(
        sigma=cfg.SOLVER.SIGMA,
        eos_coef=cfg.SOLVER.EOS_COEF,
        losses=losses,
        use_aux_loss=cfg.SOLVER.USE_AUX_LOSS,
        axis_name=axis_name,
    )
    return model, loss, build_weight_dict(cfg)


__all__ = [
    "build_model",
    "VSTGNet",
    "GroundingConfig",
    "VideoSTGLoss",
    "build_weight_dict",
    "postprocess",
]
