"""Video Swin Transformer 3D (flax, from scratch).

TPU-native re-design of the reference's Video Swin
(/root/reference/vgqa/core/vision/video_swin_transformer.py:70-752):
3D shifted-window attention (W-MSA / SW-MSA) with relative position bias,
patch size (1, 4, 4) so the temporal axis keeps per-frame resolution
(video_swin_transformer.py:634-635), window (8, 7, 7), stages [2, 2, 6, 2].

Layout is channels-last [B, D, H, W, C] throughout (the reference shuttles
between NCDHW and NDHWC per stage). All shapes are static: window partition,
shift masks, and padding are computed at trace time from Python ints, so the
whole backbone compiles to one XLA program with every window matmul batched
onto the MXU. The shifted-window region mask is built with numpy at trace
time (the reference lru_caches a torch tensor per shape, :302-315).

The backbone wrapper returns per-stage pyramid features *before* each
downsample (matching VideoSwinTransformerBackbone.forward, :668-686); the
grounding model consumes stage '3' (768ch at stride 32).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


Tuple3 = Tuple[int, int, int]


def _adjust_window(
    dims: Tuple3, window: Tuple3, shift: Tuple3
) -> Tuple[Tuple3, Tuple3]:
    """Clamp window to the input extent and drop shift where window covers it
    (parity with get_window_size, video_swin_transformer.py:55-68)."""
    w, s = list(window), list(shift)
    for i in range(3):
        if dims[i] <= window[i]:
            w[i] = dims[i]
            s[i] = 0
    return tuple(w), tuple(s)


def window_partition(x: jnp.ndarray, window: Tuple3) -> jnp.ndarray:
    """[B, D, H, W, C] -> [B*nW, wd*wh*ww, C]"""
    B, D, H, W, C = x.shape
    wd, wh, ww = window
    x = x.reshape(B, D // wd, wd, H // wh, wh, W // ww, ww, C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, wd * wh * ww, C)


def window_reverse(
    windows: jnp.ndarray, window: Tuple3, B: int, D: int, H: int, W: int
) -> jnp.ndarray:
    wd, wh, ww = window
    x = windows.reshape(B, D // wd, H // wh, W // ww, wd, wh, ww, -1)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(B, D, H, W, -1)


def _relative_position_index(window: Tuple3) -> jnp.ndarray:
    """Pairwise relative-position bias index [N, N].

    Built with on-device iota arithmetic: a baked numpy constant of N^2 ints
    per block would bloat the serialized program (this environment streams
    HLO through a size-limited remote-compile tunnel)."""
    wd, wh, ww = window
    n = wd * wh * ww
    flat = jnp.arange(n)
    d = flat // (wh * ww)
    h = (flat // ww) % wh
    w = flat % ww

    def rel(c, extent):
        return c[:, None] - c[None, :] + (extent - 1)

    return (
        rel(d, wd) * (2 * wh - 1) * (2 * ww - 1)
        + rel(h, wh) * (2 * ww - 1)
        + rel(w, ww)
    )


def _region_ids(extent: int, window: int, shift: int) -> jnp.ndarray:
    """Per-coordinate SW-MSA region id along one axis (0/1/2)."""
    idx = jnp.arange(extent)
    if shift == 0:
        return jnp.zeros((extent,), jnp.int32)
    r = jnp.where(idx < extent - window, 0, jnp.where(idx < extent - shift, 1, 2))
    return r.astype(jnp.int32)


def compute_shift_mask(
    dims_padded: Tuple3, window: Tuple3, shift: Tuple3
) -> jnp.ndarray | None:
    """Region mask for SW-MSA: [nW, N, N] additive (-100 blocked / 0 pass).

    On-device equivalent of compute_mask
    (video_swin_transformer.py:302-315): region ids are composed from 1-D
    iotas and the pairwise inequality is computed in-graph, so the program
    carries no [nW, N, N] literal (which reaches hundreds of MB at the
    64-frame 224px scale)."""
    if not any(shift):
        return None
    Dp, Hp, Wp = dims_padded
    wd, wh, ww = window
    region = (
        _region_ids(Dp, wd, shift[0])[:, None, None] * 9
        + _region_ids(Hp, wh, shift[1])[None, :, None] * 3
        + _region_ids(Wp, ww, shift[2])[None, None, :]
    )
    region = region.reshape(Dp // wd, wd, Hp // wh, wh, Wp // ww, ww)
    region = region.transpose(0, 2, 4, 1, 3, 5).reshape(-1, wd * wh * ww)
    return (region[:, None, :] != region[:, :, None]).astype(jnp.float32) * -100.0


class WindowAttention3D(nn.Module):
    """W-MSA with learned relative position bias
    (parity with video_swin_transformer.py:70-155).

    ``window`` is the FULL configured window — the bias table is always
    sized for it; when the runtime window is clamped to a smaller input the
    index is sliced [:N, :N], exactly like the reference (:133-135), so
    checkpoint weights stay compatible at any input size."""

    dim: int
    window: Tuple3
    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None):
        """x: [B_, N, C]; mask: [nW, N, N] additive or None."""
        B_, N, C = x.shape
        wd, wh, ww = self.window
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * wd - 1) * (2 * wh - 1) * (2 * ww - 1), self.num_heads),
        )
        index = _relative_position_index(self.window)[:N, :N].reshape(-1)
        bias = table[index].reshape(N, N, self.num_heads).transpose(2, 0, 1)  # [H, N, N]

        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        # Inline attention with *separate* broadcast adds for bias and
        # shift mask: precombining them (bias[None,None] + mask[None,:,None])
        # would materialize an [nW, H, N, N] tensor (~1 GB at 64f/224px);
        # separate adds fuse into the softmax chain. Logits are stored in
        # the compute dtype (bf16 in serving) — softmax renormalizes, so the
        # reduced mantissa costs <1e-2 output error while halving the only
        # quadratic HBM traffic in the tower.
        hd = C // self.num_heads

        def heads(t):
            return t.reshape(B_, N, self.num_heads, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(q), heads(k), heads(v)
        logits = jnp.einsum(
            "bhnd,bhmd->bhnm", qh, kh, preferred_element_type=jnp.float32
        ).astype(x.dtype) * (hd**-0.5)
        logits = logits + bias.astype(x.dtype)[None]
        if mask is not None:
            nW = mask.shape[0]
            logits = (
                logits.reshape(B_ // nW, nW, self.num_heads, N, N)
                + mask.astype(x.dtype)[None, :, None]
            ).reshape(B_, self.num_heads, N, N)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum(
            "bhnm,bhmd->bhnd", probs, vh, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
        return nn.Dense(C, name="proj")(out)


class DropPath(nn.Module):
    """Per-sample stochastic depth."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class SwinBlock3D(nn.Module):
    """One (shifted-)window attention block
    (parity with SwinTransformerBlock3D, video_swin_transformer.py:157-259)."""

    dim: int
    num_heads: int
    window: Tuple3
    shift: Tuple3
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    use_flash: bool = False  # kept for config threading; the fused Pallas
    # path runs at the backbone level (fused_backbone_apply), not here

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B, D, H, W, C = x.shape
        window, shift = _adjust_window((D, H, W), self.window, self.shift)

        shortcut = x
        # epsilon matches torch nn.LayerNorm (1e-5) for converted-checkpoint
        # parity; flax's default is 1e-6
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)

        # pad to window multiples
        pad_d = (-D) % window[0]
        pad_h = (-H) % window[1]
        pad_w = (-W) % window[2]
        h = jnp.pad(h, ((0, 0), (0, pad_d), (0, pad_h), (0, pad_w), (0, 0)))
        Dp, Hp, Wp = D + pad_d, H + pad_h, W + pad_w

        if any(shift):
            h = jnp.roll(h, shift=(-shift[0], -shift[1], -shift[2]), axis=(1, 2, 3))
            mask = compute_shift_mask((Dp, Hp, Wp), window, shift)
        else:
            mask = None

        windows = window_partition(h, window)
        # pass the FULL configured window so the bias table keeps its
        # checkpoint-compatible size regardless of runtime clamping
        attn = WindowAttention3D(
            self.dim, self.window, self.num_heads, name="attn",
        )(windows, mask)
        h = window_reverse(attn, window, B, Dp, Hp, Wp)

        if any(shift):
            h = jnp.roll(h, shift=shift, axis=(1, 2, 3))
        h = h[:, :D, :H, :W]

        x = shortcut + DropPath(self.drop_path, name="drop_path1")(h, deterministic)

        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="mlp_fc2")(h)
        return x + DropPath(self.drop_path, name="drop_path2")(h, deterministic)


class PatchMerging(nn.Module):
    """2x spatial downsample: concat 2x2 neighbors, LN, linear 4C->2C
    (parity with video_swin_transformer.py:262-299)."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, D, H, W, C = x.shape
        x = jnp.pad(x, ((0, 0), (0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, :, 0::2, 0::2]
        x1 = x[:, :, 1::2, 0::2]
        x2 = x[:, :, 0::2, 1::2]
        x3 = x[:, :, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)


@dataclass(frozen=True)
class VideoSwinConfig:
    patch_size: Tuple3 = (1, 4, 4)
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: Tuple3 = (8, 7, 7)
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.2
    patch_norm: bool = True
    use_flash: bool = False  # fused Pallas window attention

    @property
    def stage_channels(self) -> Tuple[int, ...]:
        return tuple(self.embed_dim * 2**i for i in range(len(self.depths)))

    @classmethod
    def tiny_test(cls) -> "VideoSwinConfig":
        """Small config for unit tests (not in the reference). Keeps 4 stages
        so the final stage sits at stride 32, aligned with ResNet layer4."""
        return cls(embed_dim=8, depths=(1, 1, 1, 1), num_heads=(2, 2, 2, 2),
                   window=(2, 2, 2), drop_path_rate=0.0)


# parity with the reference model zoo (video_swin_transformer.py:688-734)
VIDEO_SWIN_CONFIGS: Dict[str, VideoSwinConfig] = {
    "video_swin_t_p4w7": VideoSwinConfig(),
    "video_swin_s_p4w7": VideoSwinConfig(depths=(2, 2, 18, 2)),
    "video_swin_b_p4w7": VideoSwinConfig(
        embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32)
    ),
    "video_swin_test": VideoSwinConfig.tiny_test(),
}


class VideoSwinBackbone(nn.Module):
    """Per-frame pyramid features from the Video Swin trunk.

    Input [B, T, H, W, 3] -> dict {'0'..} of [B, T, H/4/2^i, W/4/2^i, C_i],
    stage outputs taken before each downsample (parity with
    VideoSwinTransformerBackbone.forward, video_swin_transformer.py:668-686).
    """

    cfg: VideoSwinConfig = field(default_factory=VideoSwinConfig)

    @nn.compact
    def __call__(
        self, frames: jnp.ndarray, deterministic: bool = True
    ) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        pd, ph, pw = c.patch_size
        assert pd == 1, "patch_size[0]=1 keeps per-frame temporal resolution"
        # Non-overlapping patching (stride == kernel) as reshape + matmul —
        # a 3D convolution here maps poorly onto the TPU conv units, while
        # this form is one large MXU matmul. The parameter keeps the conv
        # kernel layout [pd, ph, pw, 3, C] for checkpoint compatibility.
        B, T, H, W, _ = frames.shape
        kernel = self.param(
            "patch_embed_kernel",
            nn.initializers.lecun_normal(),
            (pd, ph, pw, 3, c.embed_dim),
        )
        bias = self.param(
            "patch_embed_bias", nn.initializers.zeros, (c.embed_dim,)
        )
        gh, gw = H // ph, W // pw
        patches = frames.reshape(B, T, gh, ph, gw, pw, 3)
        patches = patches.transpose(0, 1, 2, 4, 3, 5, 6)
        patches = patches.reshape(B, T, gh, gw, ph * pw * 3)
        x = (
            jnp.einsum(
                "bthwp,pc->bthwc",
                patches,
                kernel.reshape(ph * pw * 3, c.embed_dim),
                preferred_element_type=jnp.float32,
            ).astype(frames.dtype)
            + bias
        )
        if c.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x)

        total_blocks = sum(c.depths)
        dpr = np.linspace(0, c.drop_path_rate, total_blocks)
        out: Dict[str, jnp.ndarray] = {}
        block_idx = 0
        for stage, depth in enumerate(c.depths):
            dim = c.embed_dim * 2**stage
            for b in range(depth):
                shift = (
                    (0, 0, 0)
                    if b % 2 == 0
                    else tuple(w // 2 for w in c.window)
                )
                x = SwinBlock3D(
                    dim,
                    c.num_heads[stage],
                    c.window,
                    shift,
                    c.mlp_ratio,
                    float(dpr[block_idx]),
                    c.use_flash,
                    name=f"stage{stage}_block{b}",
                )(x, deterministic)
                block_idx += 1
            out[str(stage)] = x
            if stage < len(c.depths) - 1:
                x = PatchMerging(dim, name=f"downsample{stage}")(x)
        return out


def build_video_swin(name: str) -> VideoSwinBackbone:
    return VideoSwinBackbone(VIDEO_SWIN_CONFIGS[name])


# ---------------------------------------------------------------------------
# Fused serving path (Pallas megakernel per block).
#
# Pure functions over the SAME parameter tree the flax module creates, so
# checkpoints/converters are shared. Used for inference only (the kernel has
# no VJP); the flax module remains the differentiable path.
# ---------------------------------------------------------------------------

def _region_partition(dims_padded: Tuple3, window: Tuple3,
                      shift: Tuple3) -> jnp.ndarray:
    """SW-MSA region ids per window: [nW, N] int32 (cf. compute_shift_mask —
    same construction, stopping before the pairwise compare, which the
    kernel performs per window in VMEM)."""
    Dp, Hp, Wp = dims_padded
    wd, wh, ww = window
    region = (
        _region_ids(Dp, wd, shift[0])[:, None, None] * 9
        + _region_ids(Hp, wh, shift[1])[None, :, None] * 3
        + _region_ids(Wp, ww, shift[2])[None, None, :]
    )
    region = region.reshape(Dp // wd, wd, Hp // wh, wh, Wp // ww, ww)
    return region.transpose(0, 2, 4, 1, 3, 5).reshape(-1, wd * wh * ww)


def _valid_partition(dims: Tuple3, dims_padded: Tuple3, window: Tuple3,
                     shift: Tuple3) -> Optional[jnp.ndarray]:
    """Per-window validity (1=real token, 0=pad) in ROLLED coordinates, or
    None when no padding exists. The XLA path pads zeros after LN1; the
    kernel multiplies LN1 output by this mask to reproduce that exactly."""
    D, H, W = dims
    Dp, Hp, Wp = dims_padded
    if (D, H, W) == (Dp, Hp, Wp):
        return None
    wd, wh, ww = window
    v = (
        (jnp.arange(Dp) < D)[:, None, None]
        & (jnp.arange(Hp) < H)[None, :, None]
        & (jnp.arange(Wp) < W)[None, None, :]
    ).astype(jnp.float32)
    if any(shift):
        v = jnp.roll(v, shift=(-shift[0], -shift[1], -shift[2]),
                     axis=(0, 1, 2))
    v = v.reshape(Dp // wd, wd, Hp // wh, wh, Wp // ww, ww)
    return v.transpose(0, 2, 4, 1, 3, 5).reshape(-1, wd * wh * ww)


def fused_block_apply(
    x: jnp.ndarray,            # [B, D, H, W, C]
    p: Dict,                   # SwinBlock3D param subtree
    full_window: Tuple3,
    shift: Tuple3,
    num_heads: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """One Swin block via the fused kernel; window layout handled here
    (pad/roll/partition are XLA copies that fuse into one pass each way).
    The full-backbone serving path (``fused_backbone_apply``) instead calls
    ``swin_block_canvas`` directly, which keeps the padded canvas resident
    across a whole stage."""
    from ..ops.pallas.swin_block import swin_block_fused

    B, D, H, W, C = x.shape
    Dt, Ht, Wt = D, H, W
    window, shift = _adjust_window((D, H, W), full_window, shift)
    pad_d = (-D) % window[0]
    pad_h = (-H) % window[1]
    pad_w = (-W) % window[2]
    Dp, Hp, Wp = D + pad_d, H + pad_h, W + pad_w
    h = jnp.pad(x, ((0, 0), (0, pad_d), (0, pad_h), (0, pad_w), (0, 0)))
    N = window[0] * window[1] * window[2]

    if any(shift):
        h = jnp.roll(h, shift=(-shift[0], -shift[1], -shift[2]),
                     axis=(1, 2, 3))
        region = _region_partition((Dp, Hp, Wp), window, shift)
    else:
        region = None
    valid = _valid_partition((Dt, Ht, Wt), (Dp, Hp, Wp), window, shift)
    windows = window_partition(h, window)    # [B*nW, N, C]

    index = _relative_position_index(full_window)[:N, :N].reshape(-1)
    table = p["attn"]["relative_position_bias_table"]
    # bias stays in the parameter dtype (bf16 in serving): it is upcast on
    # use in-kernel, and the halved VMEM footprint matters at 24 heads
    bias = table[index].reshape(N, N, num_heads).transpose(2, 0, 1)

    out = swin_block_fused(
        windows,
        p["norm1"]["scale"], p["norm1"]["bias"],
        p["attn"]["qkv"]["kernel"], p["attn"]["qkv"]["bias"],
        p["attn"]["proj"]["kernel"], p["attn"]["proj"]["bias"],
        p["norm2"]["scale"], p["norm2"]["bias"],
        p["mlp_fc1"]["kernel"], p["mlp_fc1"]["bias"],
        p["mlp_fc2"]["kernel"], p["mlp_fc2"]["bias"],
        bias, num_heads, region=region, valid=valid, interpret=interpret,
    )

    h = window_reverse(out, window, B, Dp, Hp, Wp)
    if any(shift):
        h = jnp.roll(h, shift=shift, axis=(1, 2, 3))
    return h[:, :D, :H, :W]


def _ln_apply(x: jnp.ndarray, p: Dict) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = jnp.square(x32 - mu).mean(-1, keepdims=True)
    out = (x32 - mu) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]
    return out.astype(x.dtype)


def fused_backbone_apply(
    params: Dict,              # VideoSwinBackbone "params" collection
    frames: jnp.ndarray,       # [B, T, H, W, 3]
    cfg: VideoSwinConfig,
    interpret: bool = False,
    drop_path_gates: Optional[jnp.ndarray] = None,  # [total_blocks, B, 2]
) -> Dict[str, jnp.ndarray]:
    """Backbone forward over the fused block kernel; consumes the flax
    module's own parameter tree.

    Deterministic (``drop_path_gates=None``) mirrors
    VideoSwinBackbone.__call__ op-for-op. With gates, each block applies
    per-sample stochastic-depth branch scaling (0 or 1/keep, sampled by the
    caller) — the TRAINING forward for a frozen tower, where the reference
    keeps DropPath active but takes no gradients
    (video_swin_transformer.py:195 + grounding_net.py:73-75)."""
    from ..ops.pallas.swin_block import swin_block_canvas

    c = cfg
    pd, ph, pw = c.patch_size
    B, T, H, W, _ = frames.shape
    kernel = params["patch_embed_kernel"]
    bias = params["patch_embed_bias"]
    gh, gw = H // ph, W // pw
    patches = frames.reshape(B, T, gh, ph, gw, pw, 3)
    patches = patches.transpose(0, 1, 2, 4, 3, 5, 6)
    patches = patches.reshape(B, T, gh, gw, ph * pw * 3)
    x = (
        jnp.einsum(
            "bthwp,pc->bthwc", patches,
            kernel.reshape(ph * pw * 3, c.embed_dim),
            preferred_element_type=jnp.float32,
        ).astype(frames.dtype)
        + bias
    )
    if c.patch_norm:
        x = _ln_apply(x, params["patch_norm"])

    out: Dict[str, jnp.ndarray] = {}
    blk_base = 0
    for stage, depth in enumerate(c.depths):
        dim = c.embed_dim * 2**stage
        # pad ONCE per stage to window multiples and keep the canvas padded
        # across the stage's blocks (each block re-zeroes pad tokens after
        # LN1); one slice at stage end replaces a pad+slice per block
        B_, D_, H_, W_, _ = x.shape
        window, _ = _adjust_window((D_, H_, W_), c.window, (0, 0, 0))
        pads = ((-D_) % window[0], (-H_) % window[1], (-W_) % window[2])
        if any(pads):
            x = jnp.pad(x, ((0, 0), (0, pads[0]), (0, pads[1]),
                            (0, pads[2]), (0, 0)))
        padded = (D_ + pads[0], H_ + pads[1], W_ + pads[2])
        N = window[0] * window[1] * window[2]
        # the canvas kernel reads windows of roll(x, -shift) and writes in
        # that rolled frame; consecutive blocks' rolls compose into one
        # BlockSpec index offset, and the frame unrolls once at stage end
        frame = (0, 0, 0)
        for b in range(depth):
            shift = (
                (0, 0, 0) if b % 2 == 0
                else tuple(w // 2 for w in c.window)
            )
            _, shift = _adjust_window((D_, H_, W_), c.window, shift)
            rel = tuple((s - f) % p for s, f, p in zip(shift, frame, padded))
            region = (_region_partition(padded, window, shift)
                      if any(shift) else None)
            valid = _valid_partition((D_, H_, W_), padded, window, shift)
            p = params[f"stage{stage}_block{b}"]
            index = _relative_position_index(c.window)[:N, :N].reshape(-1)
            table = p["attn"]["relative_position_bias_table"]
            bias = table[index].reshape(N, N, c.num_heads[stage])
            bias = bias.transpose(2, 0, 1)
            x = swin_block_canvas(
                x,
                p["norm1"]["scale"], p["norm1"]["bias"],
                p["attn"]["qkv"]["kernel"], p["attn"]["qkv"]["bias"],
                p["attn"]["proj"]["kernel"], p["attn"]["proj"]["bias"],
                p["norm2"]["scale"], p["norm2"]["bias"],
                p["mlp_fc1"]["kernel"], p["mlp_fc1"]["bias"],
                p["mlp_fc2"]["kernel"], p["mlp_fc2"]["bias"],
                bias, c.num_heads[stage], window, rel,
                region=region, valid=valid,
                gates=(None if drop_path_gates is None
                       else drop_path_gates[blk_base + b]),
                interpret=interpret,
            )
            frame = shift
        if any(frame):
            x = jnp.roll(x, shift=frame, axis=(1, 2, 3))
        x = x[:, :D_, :H_, :W_]
        blk_base += depth
        out[str(stage)] = x
        if stage < len(c.depths) - 1:
            p = params[f"downsample{stage}"]
            B_, D_, H_, W_, C_ = x.shape
            x = jnp.pad(x, ((0, 0), (0, 0), (0, H_ % 2), (0, W_ % 2), (0, 0)))
            x = jnp.concatenate(
                [x[:, :, 0::2, 0::2], x[:, :, 1::2, 0::2],
                 x[:, :, 0::2, 1::2], x[:, :, 1::2, 1::2]], axis=-1
            )
            x = _ln_apply(x, p["norm"])
            x = (x @ p["reduction"]["kernel"].astype(x.dtype))
    return out
