"""ResNet backbone with frozen BatchNorm (flax, NHWC).

TPU-native re-design of the reference's torchvision backbone
(/root/reference/vgqa/core/vision/backbone.py:13-156):

* NHWC layout end-to-end — the natural TPU conv layout (torch is NCHW).
* ``FrozenBatchNorm2d`` (backbone.py:13-57) keeps 4 buffers and recomputes
  ``scale``/``bias`` every forward; here the affine is *folded into two
  parameters* at conversion time — a pure multiply-add XLA fuses into the
  convolution.
* Layer freezing follows the reference rule (backbone.py:70-77): the stem and
  layer1 are always frozen; layer2-4 train unless ``FREEZE``. Freezing is
  enforced by the optimizer param-group mask (training/optimizer.py), not by
  detaching, so the same module works for both modes.
* Returns the layer4 feature map (stride 32, 2048ch) like the reference's
  ``return_interm_layers=False`` path (backbone.py:79-82), plus a mask
  downsampled to the feature resolution.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class FrozenAffine(nn.Module):
    """Per-channel scale/bias standing in for inference-mode BatchNorm.

    Initialized to identity; the weight converter writes
    scale = gamma / sqrt(var + eps), bias = beta - mean * scale.
    """

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale + bias


def _conv(features, kernel, stride=1, dilation=1, name=None):
    pad = dilation * (kernel - 1) // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        kernel_dilation=(dilation, dilation),
        use_bias=False,
        name=name,
    )


def _make_norm(norm: str, features: int, name: str):
    """"frozen" = folded inference BatchNorm affine; "group" = trainable
    32-group GroupNorm (reference GroupNorm32, backbone.py:118-122)."""
    if norm == "group":
        # 32 groups for every real channel width (min width is 64 on
        # resnet50/101); the min() only engages for the tiny test trunk
        # epsilon matches torch nn.GroupNorm (1e-5); flax defaults to 1e-6
        return nn.GroupNorm(num_groups=min(32, features), epsilon=1e-5,
                            name=name)
    return FrozenAffine(features, name=name)


class Bottleneck(nn.Module):
    """ResNet v1.5 bottleneck (stride on the 3x3, as torchvision)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    norm: str = "frozen"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        identity = x
        out = _conv(self.planes, 1, name="conv1")(x)
        out = _make_norm(self.norm, self.planes, "bn1")(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, self.stride, self.dilation, name="conv2")(out)
        out = _make_norm(self.norm, self.planes, "bn2")(out)
        out = nn.relu(out)
        out = _conv(self.planes * 4, 1, name="conv3")(out)
        out = _make_norm(self.norm, self.planes * 4, "bn3")(out)
        if self.downsample:
            identity = _conv(self.planes * 4, 1, self.stride, name="downsample_conv")(x)
            identity = _make_norm(self.norm, self.planes * 4, "downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNetBackbone(nn.Module):
    """ResNet-50/101 trunk returning the final stage feature map.

    depths: blocks per stage — (3, 4, 23, 3) for resnet101, (3, 4, 6, 3)
    for resnet50. ``dilation`` implements the DC5 option
    (replace_stride_with_dilation on layer4, backbone.py:109-113).
    """

    depths: Sequence[int] = (3, 4, 23, 3)
    dilation: bool = False
    width: int = 64
    norm: str = "frozen"  # "frozen" (folded BN) | "group" (GroupNorm32)
    remat: bool = False   # per-bottleneck gradient checkpointing

    @property
    def num_channels(self) -> int:
        return self.width * 8 * 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [N, H, W, 3] -> [N, H/32 (or /16 for DC5), W/32, 2048]"""
        x = _conv(self.width, 7, 2, name="conv1")(x)
        x = _make_norm(self.norm, self.width, "bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        # per-block remat: backward keeps only each bottleneck's input and
        # recomputes its interior — the activation footprint that OOMs HBM
        # on long-clip/high-res training steps
        block_cls = nn.remat(Bottleneck) if self.remat else Bottleneck
        for stage, blocks in enumerate(self.depths):
            planes = self.width * (2**stage)
            first_stride = 1 if stage == 0 else 2
            dil = 1
            if stage == 3 and self.dilation:
                first_stride, dil = 1, 2
            for b in range(blocks):
                x = block_cls(
                    planes,
                    stride=first_stride if b == 0 else 1,
                    dilation=dil,
                    downsample=(b == 0),
                    norm=self.norm,
                    name=f"layer{stage + 1}_{b}",
                )(x)
        return x


def build_resnet(name: str, dilation: bool = False,
                 remat: bool = False) -> ResNetBackbone:
    """Backbone zoo; "-gn" suffix selects trainable GroupNorm32 normalization
    (reference GroupNormBackbone, backbone.py:124-141)."""
    norm = "frozen"
    if name.endswith("-gn"):
        norm = "group"
        name = name[: -len("-gn")]
    depths = {
        "resnet50": (3, 4, 6, 3),
        "resnet101": (3, 4, 23, 3),
        # tiny variant for unit tests (not in the reference)
        "resnet_test": (1, 1, 1, 1),
    }[name]
    width = 64 if name != "resnet_test" else 8
    return ResNetBackbone(depths=depths, dilation=dilation, width=width,
                          norm=norm, remat=remat)


def downsample_mask(pixel_mask: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Downsample a [., H, W] validity mask to the feature resolution.

    Equivalent to the reference's F.interpolate of the (inverted) mask
    (backbone.py:94) — nearest sampling at stride centers."""
    H, W = pixel_mask.shape[-2:]
    h, w = out_hw
    ys = (jnp.arange(h) * H) // h
    xs = (jnp.arange(w) * W) // w
    return pixel_mask[..., ys, :][..., :, xs]
