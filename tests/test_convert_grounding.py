"""Full-checkpoint converter test: build a synthetic state dict shaped like
the reference VSTGNet's (tiny dims), convert, and require an exact
structure/shape match with our model's parameter tree, then a finite
forward through the converted weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vgqa_tpu.models import GroundingConfig, VSTGNet
from vgqa_tpu.models.convert_grounding import convert_grounding_reference
from vgqa_tpu.models.convert import check_tree_shapes
from vgqa_tpu.utils.containers import TextBatch, VideoBatch


from vgqa_tpu.models.reference_shapes import build_reference_state_dict

_build_reference_state_dict = build_reference_state_dict


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = GroundingConfig.tiny_test()
    model = VSTGNet(cfg)
    video = VideoBatch(
        frames=jnp.zeros((1, 4, 64, 64, 3)),
        pixel_mask=jnp.ones((1, 64, 64), bool),
        time_mask=jnp.ones((1, 4), bool),
    )
    text = TextBatch(jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), bool))
    params = model.init(jax.random.PRNGKey(0), video, text, train=False)
    return cfg, model, params, video, text


def test_reference_checkpoint_maps_exactly(tiny_setup):
    cfg, model, params, video, text = tiny_setup
    sd = _build_reference_state_dict()
    converted = convert_grounding_reference(
        sd, enc_layers=2, dec_layers=2,
        resnet_depths=(1, 1, 1, 1), swin_depths=(1, 1, 1, 1),
        roberta_layers=2,
    )
    check_tree_shapes(converted["params"], params["params"])

    out = model.apply(
        jax.tree.map(jnp.asarray, converted), video, text, train=False
    )
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()
    assert np.isfinite(np.asarray(out["pred_sted"])).all()


def test_every_reference_key_is_consumed_or_known_dead(tiny_setup):
    """No silent drops: track reads and require unread keys to be on the
    documented dead list."""
    sd = _build_reference_state_dict()
    read = set()

    def make_tracking(data, prefix=""):
        class Tracking(dict):
            def __getitem__(self, k):
                read.add(prefix + k)
                return dict.__getitem__(self, k)

        return Tracking(data)

    import vgqa_tpu.models.convert_grounding as cg

    orig_sub = cg._sub

    def tracking_sub(d, prefix):
        return make_tracking(orig_sub(d, prefix), prefix)

    cg._sub = tracking_sub
    try:
        convert_grounding_reference(
            make_tracking(sd), enc_layers=2, dec_layers=2,
            resnet_depths=(1, 1, 1, 1), swin_depths=(1, 1, 1, 1),
            roberta_layers=2,
        )
    finally:
        cg._sub = orig_sub
    unread = set(sd) - read
    assert not unread, f"converter silently ignored: {sorted(unread)[:10]}"


def _reference_to_mdetr_sd(sd):
    """Inverse-rename a reference-style state dict into MDETR/TubeDETR
    naming (the reference's load_mapping targets,
    checkpoint_manager.py:118-164)."""
    out = {}
    for k, v in sd.items():
        if k.startswith("vis_encoder.0.body."):
            out["backbone.0.body." + k[len("vis_encoder.0.body."):]] = v
        elif k.startswith("text_encoder.body."):
            out["transformer.text_encoder." + k[len("text_encoder.body."):]] = v
        elif k.startswith("text_encoder.resizer."):
            out["transformer.resizer." + k[len("text_encoder.resizer."):]] = v
        elif k.startswith("input_proj."):
            out[k] = v
        elif k.startswith("ground_encoder.encoder.spatial_layers."):
            out["transformer.encoder.layers."
                + k[len("ground_encoder.encoder.spatial_layers."):]] = v
        elif k.startswith("ground_decoder."):
            out["transformer." + k[len("ground_decoder."):]] = v
        # everything else (swin, classifiers, heads) has no MDETR counterpart
    return out


def test_mdetr_warmstart_remap(tiny_setup):
    """MDETR-format warm start: remapped components must carry the source
    weights; components absent from the checkpoint keep initialization."""
    import jax.numpy as jnp

    from vgqa_tpu.models.convert_grounding import (
        convert_mdetr_warmstart,
        merge_partial_params,
    )

    cfg, model, params, video, text = tiny_setup
    ref_sd = _build_reference_state_dict()
    mdetr_sd = _reference_to_mdetr_sd(ref_sd)
    full = convert_grounding_reference(
        ref_sd, enc_layers=2, dec_layers=2,
        resnet_depths=(1, 1, 1, 1), swin_depths=(1, 1, 1, 1),
        roberta_layers=2,
    )

    partial, loaded = convert_mdetr_warmstart(
        mdetr_sd, enc_layers=2, dec_layers=2,
        resnet_depths=(1, 1, 1, 1), roberta_layers=2,
    )
    assert "vis_encoder" in loaded and "text_encoder" in loaded
    assert "input_proj" in loaded and "layer_0" in loaded

    merged, n_loaded, skipped = merge_partial_params(params, partial)
    assert n_loaded > 100 and not skipped, (n_loaded, skipped[:5])

    # warm-started leaves == full-converter leaves
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["input_proj"]["kernel"]),
        np.asarray(full["params"]["input_proj"]["kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(
            merged["params"]["ground_encoder"]["layer_1"]["ffn"]["linear1"]["kernel"]
        ),
        np.asarray(
            full["params"]["ground_encoder"]["layer_1"]["ffn"]["linear1"]["kernel"]
        ),
    )
    np.testing.assert_array_equal(
        np.asarray(
            merged["params"]["ground_decoder"]["decoder"]["bbox_embed"]
            ["layers_0"]["kernel"]
        ),
        np.asarray(
            full["params"]["ground_decoder"]["decoder"]["bbox_embed"]
            ["layers_0"]["kernel"]
        ),
    )
    # swin has no MDETR counterpart -> stays at init
    np.testing.assert_array_equal(
        np.asarray(
            jax.tree.leaves(merged["params"]["vid"])[0]
        ),
        np.asarray(jax.tree.leaves(params["params"]["vid"])[0]),
    )

    # merged tree must still run
    out = model.apply(
        jax.tree.map(jnp.asarray, merged), video, text, train=False
    )
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()


def test_mdetr_warmstart_plain_mdetr_subset(tiny_setup):
    """A plain-MDETR checkpoint (no TubeDETR time/pos decoder keys) loads
    backbone/text/encoder only and skips the rest without error."""
    from vgqa_tpu.models.convert_grounding import convert_mdetr_warmstart

    ref_sd = _build_reference_state_dict()
    mdetr_sd = {
        k: v for k, v in _reference_to_mdetr_sd(ref_sd).items()
        if not k.startswith(("transformer.decoder.", "transformer.time_decoder.",
                             "transformer.pos_fc.", "transformer.time_fc."))
    }
    partial, loaded = convert_mdetr_warmstart(
        mdetr_sd, enc_layers=2, dec_layers=2,
        resnet_depths=(1, 1, 1, 1), roberta_layers=2,
    )
    assert "vis_encoder" in loaded and "layer_0" in loaded
    assert "ground_decoder" not in partial["params"]
