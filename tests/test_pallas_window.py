"""Fused window-attention / Swin-block kernel numerics vs the XLA path
(interpret mode on the CPU mesh; the same kernels run natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from vgqa_tpu.ops.pallas.window_attention import window_attention


def _reference(q, k, v, bias, region, num_heads):
    """einsum window attention: q/k/v [W, N, C] heads packed in C."""
    W, N, C = q.shape
    D = C // num_heads
    qh = q.reshape(W, N, num_heads, D).transpose(0, 2, 1, 3)
    kh = k.reshape(W, N, num_heads, D).transpose(0, 2, 1, 3)
    vh = v.reshape(W, N, num_heads, D).transpose(0, 2, 1, 3)
    logits = jnp.einsum("whnd,whmd->whnm", qh, kh) * (D**-0.5)
    logits = logits + bias[None]
    if region is not None:
        if region.shape[0] != W:
            region = jnp.tile(region, (W // region.shape[0], 1))
        rm = jnp.where(
            region[:, None, :, None] != region[:, None, None, :], -1e30, 0.0
        )
        logits = logits + rm
    p = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("whnm,whmd->whnd", p, vh)
    return o.transpose(0, 2, 1, 3).reshape(W, N, C)


def test_window_attention_no_mask():
    rng = np.random.RandomState(0)
    W, N, H, D = 3, 24, 2, 16
    C = H * D
    q = jnp.asarray(rng.randn(W, N, C).astype(np.float32))
    k = jnp.asarray(rng.randn(W, N, C).astype(np.float32))
    v = jnp.asarray(rng.randn(W, N, C).astype(np.float32))
    bias = jnp.asarray(rng.randn(H, N, N).astype(np.float32))
    ref = _reference(q, k, v, bias, None, H)
    out = window_attention(q, k, v, bias, num_heads=H, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_window_attention_with_region_ids():
    rng = np.random.RandomState(1)
    W, N, H, D = 4, 18, 3, 8
    C = H * D
    q = jnp.asarray(rng.randn(W, N, C).astype(np.float32))
    k = jnp.asarray(rng.randn(W, N, C).astype(np.float32))
    v = jnp.asarray(rng.randn(W, N, C).astype(np.float32))
    bias = jnp.asarray(rng.randn(H, N, N).astype(np.float32))
    # region pattern covering half the windows: wrapper tiles it to W
    region = jnp.asarray(rng.randint(0, 3, (2, N)).astype(np.int32))
    ref = _reference(q, k, v, bias, region, H)
    out = window_attention(
        q, k, v, bias, region=region, num_heads=H, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_window_attention_swin_shapes():
    """The real Swin tile: N=392 (8x7x7 window), 3 heads of 32."""
    rng = np.random.RandomState(2)
    W, N, H, D = 2, 392, 3, 32
    C = H * D
    q = jnp.asarray(rng.randn(W, N, C).astype(np.float32) * 0.1)
    k = jnp.asarray(rng.randn(W, N, C).astype(np.float32) * 0.1)
    v = jnp.asarray(rng.randn(W, N, C).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(H, N, N).astype(np.float32) * 0.1)
    ref = _reference(q, k, v, bias, None, H)
    out = window_attention(q, k, v, bias, num_heads=H, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_fused_block_matches_module():
    """fused_block_apply (megakernel) must match SwinBlock3D, including a
    shifted block (region mask path)."""
    from vgqa_tpu.models.video_swin import SwinBlock3D, fused_block_apply

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 4, 6, 6, 8).astype(np.float32))
    for shift in ((0, 0, 0), (1, 1, 1)):
        block = SwinBlock3D(dim=8, num_heads=2, window=(2, 2, 2), shift=shift)
        params = block.init(jax.random.PRNGKey(0), x)
        out_m = block.apply(params, x)
        out_f = fused_block_apply(
            x, params["params"], (2, 2, 2), shift, 2, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(out_f), np.asarray(out_m), atol=5e-5, rtol=1e-4
        )


def test_fused_block_with_padding_matches_module():
    """Odd spatial dims force window padding: the kernel's validity-mask
    handling must reproduce the module's pad-after-LN zeros exactly."""
    from vgqa_tpu.models.video_swin import SwinBlock3D, fused_block_apply

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 3, 5, 7, 8).astype(np.float32))
    for shift in ((0, 0, 0), (1, 1, 1)):
        block = SwinBlock3D(dim=8, num_heads=2, window=(2, 2, 2), shift=shift)
        params = block.init(jax.random.PRNGKey(0), x)
        out_m = block.apply(params, x)
        out_f = fused_block_apply(
            x, params["params"], (2, 2, 2), shift, 2, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(out_f), np.asarray(out_m), atol=5e-5, rtol=1e-4
        )


def test_fused_backbone_matches_module():
    """Whole-backbone fused forward vs VideoSwinBackbone.apply on the tiny
    config with non-multiple spatial dims."""
    from vgqa_tpu.models.video_swin import (
        VideoSwinBackbone,
        VideoSwinConfig,
        fused_backbone_apply,
    )

    cfg = VideoSwinConfig.tiny_test()
    model = VideoSwinBackbone(cfg)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 3, 20, 12, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    out_m = model.apply(params, x)
    out_f = fused_backbone_apply(params["params"], x, cfg, interpret=True)
    assert set(out_f) == set(out_m)
    for k in out_m:
        np.testing.assert_allclose(
            np.asarray(out_f[k]), np.asarray(out_m[k]), atol=1e-4, rtol=1e-3
        )


def test_window_attention_key_valid_no_bias():
    """Column (padding) mask + biasless mode: must equal masked softmax
    attention that excludes invalid keys for every query."""
    rng = np.random.RandomState(6)
    W, N, H, D = 4, 16, 2, 8
    C = H * D
    q = jnp.asarray(rng.randn(W, N, C).astype(np.float32))
    k = jnp.asarray(rng.randn(W, N, C).astype(np.float32))
    v = jnp.asarray(rng.randn(W, N, C).astype(np.float32))
    key_valid = jnp.asarray((rng.rand(W, N) > 0.3).astype(np.float32))
    key_valid = key_valid.at[:, 0].set(1.0)  # at least one valid key

    qh = q.reshape(W, N, H, D).transpose(0, 2, 1, 3)
    kh = k.reshape(W, N, H, D).transpose(0, 2, 1, 3)
    vh = v.reshape(W, N, H, D).transpose(0, 2, 1, 3)
    logits = jnp.einsum("whnd,whmd->whnm", qh, kh) * (D**-0.5)
    logits = jnp.where(key_valid[:, None, None, :] > 0, logits, -1e30)
    p = jax.nn.softmax(logits, axis=-1)
    ref = jnp.einsum("whnm,whmd->whnd", p, vh).transpose(0, 2, 1, 3).reshape(W, N, C)

    out = window_attention(q, k, v, key_valid=key_valid, num_heads=H,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_fused_backbone_row_batched_grid():
    """Shapes where the canvas kernel batches R>1 window-rows per grid step
    (small late-stage canvases) must still match the module, including
    SW-MSA shifts and window padding."""
    from vgqa_tpu.models.video_swin import (
        VideoSwinBackbone,
        VideoSwinConfig,
        fused_backbone_apply,
    )

    cfg = VideoSwinConfig.tiny_test()
    model = VideoSwinBackbone(cfg)
    rng = np.random.RandomState(11)
    # 32x16 patches -> stage0 grid 8x4 rows of 2-wide windows: R engages
    x = jnp.asarray(rng.randn(1, 4, 32, 16, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(2), x)
    out_m = model.apply(params, x)
    out_f = fused_backbone_apply(params["params"], x, cfg, interpret=True)
    for k in out_m:
        np.testing.assert_allclose(
            np.asarray(out_f[k]), np.asarray(out_m[k]), atol=1e-4, rtol=1e-3
        )


def test_fused_backbone_drop_path_gates():
    """Per-sample stochastic-depth gates inside the canvas kernel: all-ones
    gates reproduce the deterministic forward exactly; zero gates on every
    block make each block an identity (output == patch-embed features), the
    limiting DropPath semantic (vgqa_tpu frozen-train path; the reference
    keeps DropPath active in its frozen tower, grounding_net.py:73-75)."""
    from vgqa_tpu.models.video_swin import (
        VideoSwinBackbone,
        VideoSwinConfig,
        fused_backbone_apply,
    )

    cfg = VideoSwinConfig.tiny_test()
    model = VideoSwinBackbone(cfg)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 3, 20, 12, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    total = sum(cfg.depths)

    base = fused_backbone_apply(params["params"], x, cfg, interpret=True)
    ones = jnp.ones((total, 2, 2), jnp.float32)
    gated = fused_backbone_apply(
        params["params"], x, cfg, interpret=True, drop_path_gates=ones
    )
    for k in base:
        np.testing.assert_allclose(
            np.asarray(gated[k]), np.asarray(base[k]), atol=1e-5, rtol=1e-5
        )

    # zero gates: every block's two residual branches are dropped, so the
    # whole stage-0 output equals its input (patch embed + LN only)
    zeros = jnp.zeros((total, 2, 2), jnp.float32)
    dropped = fused_backbone_apply(
        params["params"], x, cfg, interpret=True, drop_path_gates=zeros
    )
    # recompute the patch-embed features (stage-0 input) independently
    import vgqa_tpu.models.video_swin as vs

    pd, ph, pw = cfg.patch_size
    B, T, H, W, _ = x.shape
    gh, gw = H // ph, W // pw
    patches = x.reshape(B, T, gh, ph, gw, pw, 3)
    patches = patches.transpose(0, 1, 2, 4, 3, 5, 6)
    patches = patches.reshape(B, T, gh, gw, ph * pw * 3)
    emb = (
        jnp.einsum(
            "bthwp,pc->bthwc", patches,
            params["params"]["patch_embed_kernel"].reshape(
                ph * pw * 3, cfg.embed_dim
            ),
        )
        + params["params"]["patch_embed_bias"]
    )
    if cfg.patch_norm:
        emb = vs._ln_apply(emb, params["params"]["patch_norm"])
    np.testing.assert_allclose(
        np.asarray(dropped["0"]), np.asarray(emb), atol=1e-4, rtol=1e-3
    )

    # per-sample independence: gating only sample 0 leaves sample 1's
    # output identical to the ungated forward
    mixed = ones.at[:, 0, :].set(0.0)
    half = fused_backbone_apply(
        params["params"], x, cfg, interpret=True, drop_path_gates=mixed
    )
    for k in base:
        np.testing.assert_allclose(
            np.asarray(half[k][1]), np.asarray(base[k][1]),
            atol=1e-5, rtol=1e-5,
        )
        assert not np.allclose(np.asarray(half[k][0]), np.asarray(base[k][0]))
