import jax
import jax.numpy as jnp
import numpy as np

from vgqa_tpu.models.resnet import build_resnet, downsample_mask
from vgqa_tpu.models.video_swin import (
    VideoSwinConfig,
    VideoSwinBackbone,
    compute_shift_mask,
    window_partition,
    window_reverse,
    _adjust_window,
)


def test_resnet_tiny_output_shape():
    model = build_resnet("resnet_test")
    x = jnp.zeros((2, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (2, 2, 2, model.num_channels)


def test_resnet101_param_count():
    """ResNet-101 trunk (no fc) must match torchvision's parameter count:
    conv weights + per-BN (scale, bias) folded pairs."""
    model = build_resnet("resnet101")
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    # torchvision resnet101: 42,500,160 conv params; BN folded = 2*channels
    # per BN (104 BN layers). weight+bias+mean+var would be 4x; we carry 2x.
    bn_channels = 0
    conv = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = [getattr(k, "key", "") for k in path]
        if "scale" in keys or "bias" in keys:
            bn_channels += int(np.prod(leaf.shape))
        else:
            conv += int(np.prod(leaf.shape))
    # torchvision resnet101 trunk = 42,500,160 params of which 105,344 are
    # BN weight+bias (folded here into scale/bias) and the rest convs
    assert conv == 42_394_816, conv
    assert bn_channels == 105_344, bn_channels
    assert n == conv + bn_channels


def test_resnet_gn_variant_shapes_and_norm():
    """-gn suffix selects GroupNorm (reference GroupNormBackbone,
    backbone.py:124-141): params carry GroupNorm scale/bias, no FrozenAffine."""
    model = build_resnet("resnet_test-gn")
    assert model.norm == "group"
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (2, 2, 2, model.num_channels)
    assert np.isfinite(np.asarray(y)).all()
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = {"/".join(str(k) for k in path) for path, _ in flat}
    assert any("bn1" in n and "scale" in n for n in names)

    # gn output differs from frozen-affine output under identical convs
    frozen = build_resnet("resnet_test")
    assert frozen.norm == "frozen"


def test_resnet50_gn_builds():
    model = build_resnet("resnet50-gn")
    assert model.depths == (3, 4, 6, 3) and model.norm == "group"


def test_groupnorm_matches_torch():
    """flax GroupNorm(num_groups) on NHWC must equal torch GroupNorm32 on
    NCHW (reference backbone.py:118-122)."""
    import pytest

    torch = pytest.importorskip("torch")
    from flax import linen as nn

    rng = np.random.RandomState(1)
    x = rng.randn(2, 5, 5, 64).astype(np.float32)
    gamma = rng.rand(64).astype(np.float32) + 0.5
    beta = rng.randn(64).astype(np.float32)

    mod = nn.GroupNorm(num_groups=32)
    params = {"params": {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)}}
    y = np.asarray(mod.apply(params, jnp.asarray(x)))

    t = torch.nn.GroupNorm(32, 64)
    with torch.no_grad():
        t.weight.copy_(torch.from_numpy(gamma))
        t.bias.copy_(torch.from_numpy(beta))
        yt = t(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
    np.testing.assert_allclose(y, yt.numpy(), atol=1e-4)


def test_downsample_mask():
    m = jnp.zeros((1, 8, 8), dtype=bool).at[:, :4, :6].set(True)
    out = downsample_mask(m, (2, 2))
    assert out.shape == (1, 2, 2)
    assert bool(out[0, 0, 0]) and not bool(out[0, 1, 1])


def test_window_partition_roundtrip():
    x = jnp.arange(1 * 4 * 4 * 4 * 2, dtype=jnp.float32).reshape(1, 4, 4, 4, 2)
    w = (2, 2, 2)
    windows = window_partition(x, w)
    assert windows.shape == (8, 8, 2)
    back = window_reverse(windows, w, 1, 4, 4, 4)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_adjust_window_clamps():
    w, s = _adjust_window((4, 2, 9), (8, 7, 7), (4, 3, 3))
    assert w == (4, 2, 7) and s == (0, 0, 3)


def test_shift_mask_blocks_cross_region():
    mask = compute_shift_mask((4, 4, 4), (2, 2, 2), (1, 1, 1))
    assert mask.shape == (8, 8, 8)
    assert (mask <= 0).all() and (mask < 0).any()
    assert compute_shift_mask((4, 4, 4), (2, 2, 2), (0, 0, 0)) is None


def test_video_swin_tiny_pyramid_shapes():
    cfg = VideoSwinConfig.tiny_test()
    model = VideoSwinBackbone(cfg)
    x = jnp.zeros((1, 4, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out["0"].shape == (1, 4, 4, 4, 8)
    assert out["1"].shape == (1, 4, 2, 2, 16)
    assert out["3"].shape == (1, 4, 1, 1, 64)  # stride 32, matches ResNet


def test_video_swin_odd_spatial_dims():
    """Window padding must handle non-multiples (e.g. 420px -> 105 patches)."""
    cfg = VideoSwinConfig.tiny_test()
    model = VideoSwinBackbone(cfg)
    x = jnp.ones((1, 3, 20, 12, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out["0"].shape == (1, 3, 5, 3, 8)
    assert np.isfinite(np.asarray(out["1"])).all()


def test_video_swin_t_full_config_builds():
    from vgqa_tpu.models.video_swin import build_video_swin

    model = build_video_swin("video_swin_t_p4w7")
    x = jnp.zeros((1, 8, 56, 56, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out["3"].shape == (1, 8, 2, 2, 768)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    # Swin-T trunk ~28M params
    assert 27_000_000 < n < 29_000_000, n


def test_patch_embed_matmul_equals_conv3d():
    """The reshape+matmul patch embedding must equal the 3D convolution it
    replaces (stride == kernel, VALID padding)."""
    from vgqa_tpu.models.video_swin import VideoSwinBackbone, VideoSwinConfig

    cfg = VideoSwinConfig.tiny_test()
    model = VideoSwinBackbone(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 2, 16, 16, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)

    kernel = params["params"]["patch_embed_kernel"]  # [1, 4, 4, 3, C]
    bias = params["params"]["patch_embed_bias"]
    conv = jax.lax.conv_general_dilated(
        x,
        jnp.asarray(kernel),
        window_strides=(1, 4, 4),
        padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + bias

    # reproduce the module's patching math
    B, T, H, W, _ = x.shape
    gh, gw = H // 4, W // 4
    patches = x.reshape(B, T, gh, 4, gw, 4, 3).transpose(0, 1, 2, 4, 3, 5, 6)
    patches = patches.reshape(B, T, gh, gw, 48)
    matmul = patches @ jnp.asarray(kernel).reshape(48, -1) + bias
    np.testing.assert_allclose(np.asarray(matmul), np.asarray(conv), atol=2e-5)
