"""Video Swin numerics parity against the reference's ACTUAL torch module.

Loads /root/reference/vgqa/core/vision/video_swin_transformer.py (timm is
absent in this environment; a 2-symbol stub supplies DropPath /
trunc_normal_), builds a tiny VideoSwinTransformerBackbone, converts its
random-init weights through the REAL checkpoint converter
(convert_video_swin — the same mapping used for K400 / TA-STVG .pth
files), and asserts the flax backbone reproduces every per-stage pyramid
output (video_swin_transformer.py:666-686).

Shape choice exercises every structural branch:
  stage 0 (4x4 @ T=4, window 2): full 3D SW-MSA shift (temporal+spatial);
  stage 1 (2x2): window == spatial extent -> spatial shift dropped,
    temporal shift kept (get_window_size, :55-68);
  stages 2-3 (1x1): window clamped below the configured size, rel-pos
    index sliced [:N, :N] (:133-135);
  PatchMerging at stages 0-2 incl. the odd-extent pad at 1x1 (:276-290).
"""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

REF_SWIN = "/root/reference/vgqa/core/vision/video_swin_transformer.py"

B, T, HW = 2, 4, 16
DEPTHS = (2, 2, 1, 1)
HEADS = (2, 2, 2, 2)
EMBED = 8
WINDOW = (2, 2, 2)


def _install_timm_stub():
    if "timm" in sys.modules:
        return
    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    class DropPath(torch.nn.Module):
        # identity: the test runs drop_path_rate=0 in eval mode, where the
        # real timm DropPath is an identity too
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    layers.DropPath = DropPath
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    models.layers = layers
    timm.models = models
    sys.modules.update(
        {"timm": timm, "timm.models": models, "timm.models.layers": layers}
    )


@pytest.fixture(scope="module")
def ref_swin():
    _install_timm_stub()
    spec = importlib.util.spec_from_file_location("ref_video_swin", REF_SWIN)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_video_swin"] = mod
    spec.loader.exec_module(mod)
    yield mod
    for name in ("ref_video_swin", "timm", "timm.models",
                 "timm.models.layers"):
        sys.modules.pop(name, None)


def test_video_swin_backbone_matches_reference(ref_swin):
    import jax.numpy as jnp

    from vgqa_tpu.models.convert import convert_video_swin
    from vgqa_tpu.models.video_swin import VideoSwinBackbone, VideoSwinConfig

    torch.manual_seed(0)
    ref = ref_swin.VideoSwinTransformerBackbone(
        False, None, False,
        patch_size=(1, 4, 4), embed_dim=EMBED, depths=list(DEPTHS),
        num_heads=list(HEADS), window_size=WINDOW, mlp_ratio=4.0,
        qkv_bias=True, drop_rate=0.0, attn_drop_rate=0.0,
        drop_path_rate=0.0, patch_norm=True,
    ).eval()

    rng = np.random.RandomState(0)
    frames = rng.randn(B, T, HW, HW, 3).astype(np.float32)

    with torch.no_grad():
        samples = torch.from_numpy(
            frames.reshape(B * T, HW, HW, 3).transpose(0, 3, 1, 2)
        )
        ref_out = ref(samples, num_frames=T)

    # wrapper state dict -> the K400 checkpoint layout the converter reads:
    # the wrapper hoists each stage's downsample out of its BasicLayer
    # (video_swin_transformer.py:654-659); undo that rename
    sd = {}
    for k, v in ref.state_dict().items():
        if k.startswith("downsamples."):
            stage = k.split(".")[1]
            k = f"layers.{stage}.downsample." + k.split(".", 2)[2]
        sd[k] = v.detach().numpy()
    params = convert_video_swin(sd, DEPTHS)

    model = VideoSwinBackbone(VideoSwinConfig(
        embed_dim=EMBED, depths=DEPTHS, num_heads=HEADS, window=WINDOW,
        drop_path_rate=0.0, patch_norm=True,
    ))
    out = model.apply({"params": params}, jnp.asarray(frames),
                      deterministic=True)

    assert set(out) == set(ref_out)
    for stage in sorted(out):
        got = np.asarray(out[stage])                      # [B, T, h, w, C]
        Bt, C, h, w = ref_out[stage].shape
        want = (
            ref_out[stage].numpy()
            .reshape(B, T, C, h, w)
            .transpose(0, 1, 3, 4, 2)
        )
        assert got.shape == want.shape, stage
        np.testing.assert_allclose(
            got, want, atol=2e-5, rtol=1e-4,
            err_msg=f"stage {stage} diverges from the torch reference",
        )
