import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vgqa_tpu.models import GroundingConfig, VSTGNet, VideoSTGLoss, postprocess
from vgqa_tpu.utils.containers import TextBatch, VideoBatch


V, T, H, W, L = 1, 6, 64, 64, 8


@pytest.fixture(scope="module")
def tiny_model_and_batch():
    cfg = GroundingConfig.tiny_test()
    model = VSTGNet(cfg)
    rng = np.random.RandomState(0)
    video = VideoBatch(
        frames=jnp.asarray(rng.randn(V, T, H, W, 3).astype(np.float32)),
        pixel_mask=jnp.ones((V, H, W), bool),
        time_mask=jnp.ones((V, T), bool),
    )
    text = TextBatch(
        token_ids=jnp.asarray(rng.randint(4, 100, (V, L)).astype(np.int32)),
        mask=jnp.ones((V, L), bool).at[0, 6:].set(False),
    )
    params = model.init(jax.random.PRNGKey(0), video, text, train=False)
    return cfg, model, params, video, text


def _targets():
    act = np.zeros((V, T), np.float32)
    act[0, 2:5] = 1
    boxes = np.zeros((V, T, 4), np.float32)
    boxes[0, :, :] = [0.5, 0.5, 0.2, 0.3]
    return {
        "boxes": jnp.asarray(boxes),
        "actioness": jnp.asarray(act),
        "time_mask": jnp.ones((V, T), bool),
        "sted": jnp.asarray([[2, 4]], dtype=jnp.int32),
        "attr_labels": jnp.zeros((V, 5)).at[0, 1].set(1.0),
        "verb_labels": jnp.zeros((V, 7)).at[0, 3].set(1.0),
    }


def test_forward_shapes_eval(tiny_model_and_batch):
    cfg, model, params, video, text = tiny_model_and_batch
    out = model.apply(params, video, text, train=False)
    assert out["pred_boxes"].shape == (V, T, 4)
    assert out["pred_sted"].shape == (V, T, 2)
    assert out["pred_actioness"].shape == (V, T, 1)
    assert out["logits_f_m"].shape == (V, T)
    assert out["logits_r_a"].shape == (V, cfg.app_num)
    assert out["logits_r_m"].shape == (V, cfg.mot_num)
    assert len(out["aux_outputs"]) == cfg.dec_layers - 1
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()
    # boxes in sigmoid space
    b = np.asarray(out["pred_boxes"])
    assert (b >= 0).all() and (b <= 1).all()


def test_forward_train_mode_runs_with_dropout(tiny_model_and_batch):
    cfg, model, params, video, text = tiny_model_and_batch
    out = model.apply(
        params, video, text, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert out["pred_boxes"].shape == (V, T, 4)


def test_loss_terms_finite_and_complete(tiny_model_and_batch):
    cfg, model, params, video, text = tiny_model_and_batch
    out = model.apply(params, video, text, train=False)
    loss_fn = VideoSTGLoss(use_aux_loss=True)
    losses = loss_fn(out, _targets())
    expected = {
        "loss_bbox", "loss_giou", "loss_sted", "loss_actioness",
        "logits_f_m", "logits_f_a", "logits_r_a", "logits_r_m",
    }
    assert expected.issubset(losses.keys())
    # aux terms for each non-final layer
    assert "loss_bbox_0" in losses and "loss_sted_0" in losses
    assert "logits_f_m_0" not in losses  # logits heads have no aux terms
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_loss_grads_flow(tiny_model_and_batch):
    cfg, model, params, video, text = tiny_model_and_batch
    loss_fn = VideoSTGLoss(use_aux_loss=False)
    targets = _targets()

    def total(p):
        out = model.apply(
            p, video, text, train=True, rngs={"dropout": jax.random.PRNGKey(0)}
        )
        losses = loss_fn(out, targets)
        return sum(losses.values())

    grads = jax.grad(total)(params)
    gnorm = sum(float(jnp.sum(g**2)) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
    # the decoder must receive gradient
    dec = grads["params"]["ground_decoder"]
    dn = sum(float(jnp.sum(g**2)) for g in jax.tree.leaves(dec))
    assert dn > 0


def test_masked_equals_unmasked_for_full_clip():
    """Padding frames must not change valid-frame predictions."""
    cfg = GroundingConfig.tiny_test()
    model = VSTGNet(cfg)
    rng = np.random.RandomState(3)
    frames = rng.randn(V, 4, H, W, 3).astype(np.float32)
    text_ids = rng.randint(4, 100, (V, L)).astype(np.int32)

    full = VideoBatch(
        frames=jnp.asarray(frames),
        pixel_mask=jnp.ones((V, H, W), bool),
        time_mask=jnp.ones((V, 4), bool),
    )
    padded_frames = np.concatenate(
        [frames, rng.randn(V, 2, H, W, 3).astype(np.float32)], axis=1
    )
    padded = VideoBatch(
        frames=jnp.asarray(padded_frames),
        pixel_mask=jnp.ones((V, H, W), bool),
        time_mask=jnp.asarray(np.array([[1, 1, 1, 1, 0, 0]], bool)),
    )
    text = TextBatch(jnp.asarray(text_ids), jnp.ones((V, L), bool))
    params = model.init(jax.random.PRNGKey(0), full, text, train=False)
    out_full = model.apply(params, full, text, train=False)
    out_pad = model.apply(params, padded, text, train=False)
    # NOTE: the Swin tower mixes frames across time windows, so exact
    # equality is not expected there; but temporal-mask-sensitive heads
    # should stay finite and selection must ignore padded frames.
    assert not np.asarray(out_pad["select_mask"])[0, 4:].any()
    assert np.isfinite(np.asarray(out_pad["pred_boxes"])).all()
    assert out_full["pred_boxes"].shape[1] == 4
    assert out_pad["pred_boxes"].shape[1] == 6


def test_postprocess_span_and_boxes():
    boxes = jnp.asarray(np.tile([[0.5, 0.5, 0.5, 0.5]], (1, 4, 1)), jnp.float32)[None][0]
    boxes = boxes.reshape(1, 4, 4)
    sted = np.full((1, 4, 2), -5.0, np.float32)
    sted[0, 1, 0] = 5.0  # start at 1
    sted[0, 3, 1] = 5.0  # end at 3
    out_boxes, s, e = postprocess(
        boxes, jnp.asarray(sted),
        jnp.asarray([[100.0, 200.0]]), jnp.ones((1, 4), bool),
    )
    assert int(s[0]) == 1 and int(e[0]) == 3
    np.testing.assert_allclose(
        np.asarray(out_boxes[0, 0]), [50.0, 25.0, 150.0, 75.0], atol=1e-3
    )


def test_postprocess_respects_time_mask():
    sted = np.zeros((1, 6, 2), np.float32)
    sted[0, 4, 0] = 9.0  # attractive but masked start
    sted[0, 5, 1] = 9.0
    tm = np.array([[1, 1, 1, 1, 0, 0]], bool)
    _, s, e = postprocess(
        jnp.zeros((1, 6, 4)), jnp.asarray(sted), jnp.asarray([[10.0, 10.0]]),
        jnp.asarray(tm),
    )
    assert int(s[0]) < 4 and int(e[0]) < 4 and int(s[0]) < int(e[0])


@pytest.mark.parametrize("pos_enc", ["sineHW", "learned"])
def test_pos_enc_variants_forward(pos_enc):
    """POS_ENC knob parity (reference build_position_encoding,
    position_encoding.py:131-144): sineHW and learned variants must build
    and produce the same output schema as the default sine."""
    import dataclasses

    cfg = dataclasses.replace(GroundingConfig.tiny_test(), pos_enc=pos_enc)
    model = VSTGNet(cfg)
    rng = np.random.RandomState(1)
    video = VideoBatch(
        frames=jnp.asarray(rng.randn(V, T, H, W, 3).astype(np.float32)),
        pixel_mask=jnp.ones((V, H, W), bool),
        time_mask=jnp.ones((V, T), bool),
    )
    text = TextBatch(
        token_ids=jnp.asarray(rng.randint(4, 100, (V, L)).astype(np.int32)),
        mask=jnp.ones((V, L), bool),
    )
    params = model.init(jax.random.PRNGKey(0), video, text, train=False)
    if pos_enc == "learned":
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        names = {"/".join(str(k) for k in p) for p, _ in flat}
        assert any("pos_embed_2d" in n for n in names)
    out = model.apply(params, video, text, train=False)
    assert out["pred_boxes"].shape == (V, T, 4)
    assert np.isfinite(np.asarray(out["pred_sted"])).all()


def test_pos_enc_unknown_raises():
    import dataclasses

    cfg = dataclasses.replace(GroundingConfig.tiny_test(), pos_enc="nope")
    model = VSTGNet(cfg)
    video = VideoBatch(
        frames=jnp.zeros((V, T, H, W, 3)),
        pixel_mask=jnp.ones((V, H, W), bool),
        time_mask=jnp.ones((V, T), bool),
    )
    text = TextBatch(
        token_ids=jnp.zeros((V, L), jnp.int32), mask=jnp.ones((V, L), bool)
    )
    with pytest.raises(ValueError, match="POS_ENC"):
        model.init(jax.random.PRNGKey(0), video, text, train=False)
