"""InternViT-style vision encoder + pixel-shuffle projector (flax).

The visual half of the InternVideo2.5/InternVL stack the reference loads as
remote code (/root/reference/vgqa/inference/qa.py:176-182): a plain ViT over
448px tiles (patch 14 -> 32x32 tokens + CLS), whose patch tokens are
pixel-unshuffled 2x (-> 16x16 = 256 tokens per tile) and projected through
an MLP into the LLM's embedding space. NHWC, static shapes, one batched
program per tile batch.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import dot_product_attention


@dataclass(frozen=True)
class ViTConfig:
    image_size: int = 448
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    llm_hidden_size: int = 4096
    downsample_ratio: float = 0.5
    layer_norm_eps: float = 1e-6
    qkv_bias: bool = True
    # flash (streaming-softmax) attention: never materializes the
    # [tiles, H, L, L] probability tensor (1025 tokens x 32 tiles at the
    # 32-frame QA protocol). Off by default — enabled by QAEngine on TPU
    # (and under VGQA_PALLAS_INTERPRET=1 for CPU parity tests); does not
    # change the parameter tree.
    flash: bool = False

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @classmethod
    def internvit_300m(cls) -> "ViTConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "ViTConfig":
        return cls(image_size=32, patch_size=8, hidden_size=32, num_layers=2,
                   num_heads=4, intermediate_size=64, llm_hidden_size=64)


class ViTBlock(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="norm1")(x)
        qkv = nn.Dense(3 * c.hidden_size, use_bias=c.qkv_bias, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if c.flash:
            import os

            from ..ops.pallas.flash_attention import flash_mha

            # 384 divides round_up(1025, 128) = 1152 exactly: 3x3 tiles per
            # (tile, head) instead of 9x9 at the default 128 blocks — fewer
            # grid programs, bigger MXU matmuls, no padded-tile work
            L = q.shape[-2]
            blk = 384 if (L + 127) // 128 * 128 % 384 == 0 else 128
            attn = flash_mha(
                q, k, v, c.num_heads, blk_q=blk, blk_k=blk,
                interpret=os.environ.get("VGQA_PALLAS_INTERPRET") == "1",
            )
        else:
            attn = dot_product_attention(q, k, v, c.num_heads)
        # learned per-layer residual scales (InternViT's ls1/ls2)
        ls1 = self.param("ls1", nn.initializers.ones, (c.hidden_size,))
        x = x + nn.Dense(c.hidden_size, name="proj")(attn) * ls1
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="norm2")(x)
        h = nn.gelu(nn.Dense(c.intermediate_size, name="fc1")(h), approximate=False)
        ls2 = self.param("ls2", nn.initializers.ones, (c.hidden_size,))
        return x + nn.Dense(c.hidden_size, name="fc2")(h) * ls2


def pixel_shuffle_tokens(x: jnp.ndarray, ratio: float) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H*r, W*r, C/r^2] token downsample (InternVL)."""
    B, H, W, C = x.shape
    r = int(1 / ratio)
    x = x.reshape(B, H // r, r, W // r, r, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // r, W // r, C * r * r)


class VisionTower(nn.Module):
    """ViT + pixel shuffle + 2-layer MLP projector -> LLM token embeddings.

    Input tiles [B, S, S, 3] -> [B, (grid*ratio)^2, llm_hidden]."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, tiles: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        B = tiles.shape[0]
        g = c.grid
        x = nn.Conv(
            c.hidden_size, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), padding="VALID",
            name="patch_embed",
        )(tiles)                                  # [B, g, g, D]
        x = x.reshape(B, g * g, c.hidden_size)
        cls = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02),
            (1, 1, c.hidden_size),
        )
        pos = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (1, g * g + 1, c.hidden_size),
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, c.hidden_size)), x], 1)
        x = x + pos
        for i in range(c.num_layers):
            x = ViTBlock(c, name=f"block_{i}")(x)

        patch_tokens = x[:, 1:].reshape(B, g, g, c.hidden_size)
        shuffled = pixel_shuffle_tokens(patch_tokens, c.downsample_ratio)
        gg = shuffled.shape[1]
        tokens = shuffled.reshape(B, gg * gg, shuffled.shape[-1])

        # mlp1 projector: LN -> dense -> gelu -> dense (InternVL)
        # mlp1's LayerNorm is a plain torch nn.LayerNorm (eps=1e-5), unlike
        # the ViT trunk norms which use the config's 1e-6
        h = nn.LayerNorm(epsilon=1e-5, name="proj_norm")(tokens)
        h = nn.gelu(nn.Dense(c.llm_hidden_size, name="proj_fc1")(h),
                    approximate=False)
        return nn.Dense(c.llm_hidden_size, name="proj_fc2")(h)
