"""Full-chain numerics at production width (hidden=256) against the
reference's ACTUAL torch modules (VERDICT r2 Missing #3).

Loads /root/reference/vgqa's CrossModalEncoder, QueryDecoder,
TemporalSampling, SpatialActivation, VideoSTGLoss and PostProcess, builds
the reference VSTGNet's head chain exactly as grounding_net.py:40-85 wires
it, replays the forward body (grounding_net.py:103-187) on random tower
features, converts the torch weights through the REAL checkpoint converter
(convert_grounding_head — the same mapping used for released .pth files),
and asserts the flax stack reproduces every output through to loss values
and postprocessed boxes/spans.

torchvision/easydict are absent here; tiny exact stubs supply
torchvision.ops.boxes.box_area and easydict.EasyDict (attribute-dict).
"""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

REF = "/root/reference/vgqa"

T, HW, L = 6, 5, 7          # frames, feature map side, text tokens
D = 256                      # production hidden width
APP, MOT = 20, 34
ENC_LAYERS = DEC_LAYERS = 6


def _install_stubs():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        ops = types.ModuleType("torchvision.ops")
        boxes = types.ModuleType("torchvision.ops.boxes")

        def box_area(b):
            return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

        boxes.box_area = box_area
        ops.boxes = boxes
        tv.ops = ops
        sys.modules.update(
            {"torchvision": tv, "torchvision.ops": ops,
             "torchvision.ops.boxes": boxes}
        )
    if "easydict" not in sys.modules:
        ed = types.ModuleType("easydict")

        class EasyDict(dict):
            def __init__(self, d=None, **kw):
                super().__init__()
                for k, v in dict(d or {}, **kw).items():
                    setattr(self, k, v)

            def __setattr__(self, k, v):
                if isinstance(v, dict) and not isinstance(v, EasyDict):
                    v = EasyDict(v)
                super().__setattr__(k, v)
                self[k] = v

        ed.EasyDict = EasyDict
        sys.modules["easydict"] = ed


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


class NS:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def _ref_cfg():
    return NS(
        MODEL=NS(
            VSTG=NS(
                HIDDEN=D, HEADS=8, FFN_DIM=2048, DROPOUT=0.0,
                ENC_LAYERS=ENC_LAYERS, DEC_LAYERS=DEC_LAYERS,
                QUERY_DIM=4, USE_LEARN_TIME_EMBED=False, USE_ACTION=True,
                FROM_SCRATCH=True,
            ),
            VISION_BACKBONE=NS(POS_ENC="sine"),
        ),
        INPUT=NS(MAX_VIDEO_LEN=200),
        SOLVER=NS(USE_ATTN=False, USE_AUX_LOSS=True, EOS_COEF=0.1, SIGMA=2.0),
        DATASET=NS(APP_NUM=APP, MOT_NUM=MOT),
    )


@pytest.fixture(scope="module")
def ref():
    _install_stubs()
    for pkg in ("vgqa", "vgqa.utils", "vgqa.core", "vgqa.core.decoder",
                "vgqa.core.language", "vgqa.core.vision"):
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = []
            sys.modules[pkg] = m
    _load("vgqa.utils.box_ops", f"{REF}/utils/box_ops.py")
    _load("vgqa.utils.distributed", f"{REF}/utils/distributed.py")
    _load("vgqa.utils.training_utils", f"{REF}/utils/training_utils.py")
    bb = _load("vgqa.utils.bounding_boxes", f"{REF}/utils/bounding_boxes.py")
    _load("vgqa.core.model_utils", f"{REF}/core/model_utils.py")
    _load("vgqa.core.language.bert_module",
          f"{REF}/core/language/bert_module.py")
    _load("vgqa.core.decoder.position_encoding",
          f"{REF}/core/decoder/position_encoding.py")
    _load("vgqa.core.decoder.attention", f"{REF}/core/decoder/attention.py")
    me = _load("vgqa.core.decoder.modal_encoder",
               f"{REF}/core/decoder/modal_encoder.py")
    qd = _load("vgqa.core.decoder.query_decoder",
               f"{REF}/core/decoder/query_decoder.py")
    cl = _load("vgqa.core.decoder.classifier",
               f"{REF}/core/decoder/classifier.py")
    vpe = _load("vgqa.core.vision.position_encoding",
                f"{REF}/core/vision/position_encoding.py")
    loss = _load("vgqa.core.loss", f"{REF}/core/loss.py")
    pp = _load("vgqa.core.postprocessor", f"{REF}/core/postprocessor.py")
    mu = sys.modules["vgqa.core.model_utils"]
    tu = sys.modules["vgqa.utils.training_utils"]
    yield NS(me=me, qd=qd, cl=cl, vpe=vpe, loss=loss, pp=pp, mu=mu,
             NestedTensor=tu.NestedTensor, BoxList=bb.BoxList)
    # uninstall the stubs: a lingering spec-less torchvision stub breaks
    # any later FIRST import of transformers (find_spec raises
    # "torchvision.__spec__ is None"), and its shape must not leak into
    # other reference-driving test modules that stub different submodules
    for name in list(sys.modules):
        if (name == "torchvision" or name.startswith("torchvision.")
                or name == "vgqa" or name.startswith("vgqa.")
                or name == "easydict"):
            sys.modules.pop(name, None)


def _build_ref_chain(ref, cfg):
    """The reference VSTGNet's head modules, wired exactly like
    grounding_net.py:56-85 (so state_dict keys match the checkpoint
    layout the converter was written for)."""
    torch.manual_seed(0)

    class RefChain(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.s_temporal_clas = ref.cl.TemporalSampling(D)
            self.t_temporal_clas = ref.cl.TemporalSampling(D)
            self.s_spatial_clas = ref.cl.SpatialActivation(D, APP)
            self.t_spatial_clas = ref.cl.SpatialActivation(D, MOT)
            self.ground_encoder = ref.me.CrossModalEncoder(cfg)
            self.ground_decoder = ref.qd.QueryDecoder(cfg)
            self.input_proj = torch.nn.Conv2d(2048, D, kernel_size=1)
            self.temp_embed = ref.mu.MLP(D, D, 2, 2, dropout=0.3)
            self.bbox_embed = ref.mu.MLP(D, D, 4, 3)
            self.input_proj2 = torch.nn.Conv2d(768, D, kernel_size=1)
            self.action_embed = ref.mu.MLP(D, D, 1, 2, dropout=0.3)
            self.ground_decoder.time_embed2 = self.action_embed
            self.ground_decoder.decoder.bbox_embed = self.bbox_embed

    chain = RefChain()
    chain.eval()
    return chain


def _ref_forward(ref, chain, res_feat, swin_raw, text_feat, text_mask):
    """Replay grounding_net.py:103-187 (inference branch) on tower
    features."""
    theta = 0.45
    vis_mask = torch.zeros(T, HW, HW, dtype=torch.bool)
    vis_features = chain.input_proj(res_feat)
    vis_outputs = ref.NestedTensor(vis_features, vis_mask.clone(), [T])
    vid_features = chain.input_proj2(swin_raw)
    pos_embed = ref.vpe.PositionEmbeddingSine(D // 2, normalize=True)
    vis_pos_embed = pos_embed(ref.NestedTensor(res_feat, vis_mask, [T]))

    encoded_info = chain.ground_encoder(
        videos=vis_outputs, vis_pos=vis_pos_embed,
        texts=(text_mask, text_feat, None), vid=vid_features,
    )
    l = HW * HW
    ef = encoded_info["encoded_feature"]
    f_vid = ef[-l:].permute(1, 2, 0).reshape(vid_features.size()).detach()
    f_vis = ef[:l].permute(1, 2, 0).reshape(vid_features.size()).detach()
    f_text_cls = ef[l:-l].mean(1).unsqueeze(0).detach()

    logits_f_m = chain.t_temporal_clas(f_vid, f_text_cls)
    logits_f_a = chain.s_temporal_clas(f_vis, f_text_cls)
    att_sequences = (logits_f_m.sigmoid() + logits_f_a.sigmoid()) / 2
    choose = torch.nonzero(att_sequences > theta).squeeze().tolist()
    choose = [choose] if isinstance(choose, int) else choose
    choose = choose or torch.nonzero(att_sequences > 0).squeeze().tolist()

    def act_and_queries(idx):
        logits_r_m, att_map_t = chain.t_spatial_clas(
            f_vid[idx], f_text_cls[:, :1]
        )
        logits_r_a, att_map_s = chain.s_spatial_clas(
            f_vis[idx], f_text_cls[:, :1]
        )
        itq = (ef[-l:].permute(1, 0, 2)[idx] * att_map_t.unsqueeze(2)).mean((0, 1))
        isq = (ef[:l].permute(1, 0, 2)[idx] * att_map_s.unsqueeze(2)).mean((0, 1))
        return logits_r_m, logits_r_a, itq, isq

    logits_r_m, logits_r_a, itq, isq = act_and_queries(choose)
    outputs_pos, outputs_time = chain.ground_decoder(
        encoded_info=encoded_info, vis_pos=vis_pos_embed, isq=isq, itq=itq
    )

    # inference re-selection + re-decode (grounding_net.py:143-163)
    choose2 = (
        torch.nonzero(
            (chain.action_embed(outputs_time)[-1].squeeze().sigmoid() > 0.5).int()
        ).squeeze().tolist()
    )
    choose2 = [choose2] if isinstance(choose2, int) else choose2
    choose2 = choose2 or torch.nonzero(att_sequences > 0).squeeze().tolist()
    logits_r_a, att_map_s = chain.s_spatial_clas(f_vis[choose2], f_text_cls[:, :1])
    logits_r_m, att_map_t = chain.t_spatial_clas(f_vid[choose2], f_text_cls[:, :1])
    itq = (ef[-l:].permute(1, 0, 2)[choose2] * att_map_t.unsqueeze(2)).mean((0, 1))
    isq = (ef[:l].permute(1, 0, 2)[choose2] * att_map_s.unsqueeze(2)).mean((0, 1))
    outputs_pos, outputs_time = chain.ground_decoder(
        encoded_info=encoded_info, vis_pos=vis_pos_embed, isq=isq, itq=itq
    )

    outputs_coord = outputs_pos.flatten(1, 2)
    sted = chain.temp_embed(outputs_time)
    actioness = chain.action_embed(outputs_time)
    out = {
        "pred_boxes": outputs_coord[-1],
        "logits_f_m": logits_f_m,
        "logits_f_a": logits_f_a,
        "logits_r_a": logits_r_a,
        "logits_r_m": logits_r_m,
        "pred_sted": sted[-1],            # [b, t, 2]
        "pred_actioness": actioness[-1],  # [b, t, 1]
        "att_sequences": att_sequences.unsqueeze(0),
        "aux_outputs": [
            {"pred_sted": a, "pred_boxes": b, "pred_actioness": c}
            for a, b, c in zip(sted[:-1], outputs_coord[:-1], actioness[:-1])
        ],
        "choose": choose2,
    }
    return out


@pytest.fixture(scope="module")
def both(ref):
    """Run reference chain and flax chain on identical inputs+weights."""
    import jax
    import jax.numpy as jnp

    from vgqa_tpu.models import GroundingConfig, VSTGNet
    from vgqa_tpu.models.convert_grounding import convert_grounding_head

    cfg = _ref_cfg()
    chain = _build_ref_chain(ref, cfg)

    g = torch.Generator().manual_seed(42)
    res_feat = torch.randn(T, 2048, HW, HW, generator=g) * 0.5
    swin_raw = torch.randn(T, 768, HW, HW, generator=g) * 0.5
    text_feat = torch.randn(L, 1, D, generator=g) * 0.5
    text_mask = torch.zeros(1, L, dtype=torch.bool)  # ref: True=pad

    with torch.no_grad():
        ref_out = _ref_forward(ref, chain, res_feat, swin_raw, text_feat,
                               text_mask)

    sd = {k: v.detach().numpy() for k, v in chain.state_dict().items()}
    head = convert_grounding_head(sd, ENC_LAYERS, DEC_LAYERS)

    ours_cfg = GroundingConfig(
        hidden=D, heads=8, enc_layers=ENC_LAYERS, dec_layers=DEC_LAYERS,
        ffn_dim=2048, dropout=0.0, app_num=APP, mot_num=MOT,
        video_max_len=200, pos_enc="sine", use_aux_loss=True,
    )
    model = VSTGNet(ours_cfg)
    params = jax.tree.map(jnp.asarray, head)

    res_j = jnp.asarray(res_feat.numpy().transpose(0, 2, 3, 1)[None])
    swin_j = jnp.asarray(swin_raw.numpy().transpose(0, 2, 3, 1)[None])
    text_j = jnp.asarray(text_feat.numpy().transpose(1, 0, 2))
    pixel_mask = jnp.ones((1, HW * 32, HW * 32), bool)
    tmask_j = jnp.asarray(~text_mask.numpy())
    time_mask = jnp.ones((1, T), bool)

    our_out = model.apply(
        {"params": params}, res_j, swin_j, text_j, pixel_mask, tmask_j,
        time_mask, train=False, method=VSTGNet.forward_from_towers,
    )
    return ref_out, our_out


def test_forward_outputs_match(both):
    ref_out, our_out = both
    ours = {k: np.asarray(v) for k, v in our_out.items()
            if k not in ("aux_outputs", "select_mask")}

    np.testing.assert_allclose(
        ours["att_sequences"][0], ref_out["att_sequences"][0].numpy(),
        atol=2e-4,
    )
    # second-pass frame selection decisions agree
    sel = np.where(np.asarray(our_out["select_mask"])[0])[0].tolist()
    assert sel == ref_out["choose"], (sel, ref_out["choose"])

    np.testing.assert_allclose(
        ours["pred_boxes"][0], ref_out["pred_boxes"].numpy(), atol=5e-4
    )
    np.testing.assert_allclose(
        ours["pred_sted"][0], ref_out["pred_sted"][0].numpy(), atol=2e-3
    )
    np.testing.assert_allclose(
        ours["pred_actioness"][0], ref_out["pred_actioness"][0].numpy(),
        atol=1e-3,
    )
    np.testing.assert_allclose(
        ours["logits_f_m"][0], ref_out["logits_f_m"].numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        ours["logits_f_a"][0], ref_out["logits_f_a"].numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        ours["logits_r_a"][0], ref_out["logits_r_a"][0].numpy(), atol=5e-4
    )
    np.testing.assert_allclose(
        ours["logits_r_m"][0], ref_out["logits_r_m"][0].numpy(), atol=5e-4
    )
    # every aux (intermediate decoder layer) output too
    for i, aux in enumerate(ref_out["aux_outputs"]):
        np.testing.assert_allclose(
            np.asarray(our_out["aux_outputs"][i]["pred_boxes"])[0],
            aux["pred_boxes"].numpy(), atol=5e-4, err_msg=f"aux {i}",
        )
        np.testing.assert_allclose(
            np.asarray(our_out["aux_outputs"][i]["pred_sted"])[0],
            aux["pred_sted"][0].numpy(), atol=2e-3, err_msg=f"aux {i}",
        )


def test_loss_values_match(ref, both):
    """The reference VideoSTGLoss on its outputs vs our VideoSTGLoss on
    ours: every shared loss component matches at the value level."""
    import jax.numpy as jnp

    from vgqa_tpu.models.loss import VideoSTGLoss as OurLoss

    ref_out, our_out = both
    span = (2, 4)
    act = torch.zeros(T)
    act[span[0] : span[1] + 1] = 1
    span_boxes = torch.rand(span[1] - span[0] + 1, 4) * 0.4 + 0.2
    attr_idx, verb_idx = [1, 3], [0, 5]

    targets = [{
        "actioness": act,
        "boxs": ref.BoxList(span_boxes, (HW * 32, HW * 32), mode="xyxy"),
    }]
    cfg = _ref_cfg()
    ref_loss_mod = ref.loss.VideoSTGLoss(
        cfg, ["boxes", "sted", "logits_f_m", "logits_f_a", "logits_r_a",
              "logits_r_m", "actioness"],
    )
    ro = {
        **{k: (v.clone() if torch.is_tensor(v) else v)
           for k, v in ref_out.items() if k != "aux_outputs"},
        "aux_outputs": [
            {k: v.clone() for k, v in aux.items()}
            for aux in ref_out["aux_outputs"]
        ],
        "attr_labels": attr_idx,
        "verb_labels": verb_idx,
    }
    with torch.no_grad():
        ref_losses = ref_loss_mod(ro, targets, durations=[T])

    boxes_full = torch.zeros(T, 4)
    boxes_full[span[0] : span[1] + 1] = span_boxes
    our_targets = {
        "boxes": jnp.asarray(boxes_full.numpy()[None]),
        "actioness": jnp.asarray(act.numpy()[None]),
        "time_mask": jnp.ones((1, T), bool),
        "sted": jnp.asarray([[span[0], span[1]]], jnp.int32),
        "attr_labels": jnp.zeros((1, APP)).at[0, jnp.asarray(attr_idx)].set(1.0),
        "verb_labels": jnp.zeros((1, MOT)).at[0, jnp.asarray(verb_idx)].set(1.0),
    }
    our_loss_mod = OurLoss(sigma=cfg.SOLVER.SIGMA, eos_coef=cfg.SOLVER.EOS_COEF)
    our_losses = our_loss_mod(our_out, our_targets)

    for k in ("loss_bbox", "loss_giou", "loss_sted", "loss_actioness",
              "logits_f_m", "logits_f_a", "logits_r_a", "logits_r_m"):
        assert k in our_losses, (k, sorted(our_losses))
        np.testing.assert_allclose(
            float(our_losses[k]), float(ref_losses[k]), atol=2e-3,
            err_msg=k,
        )
    # aux layer losses as well
    for i in range(DEC_LAYERS - 1):
        for k in ("loss_bbox", "loss_giou", "loss_sted"):
            np.testing.assert_allclose(
                float(our_losses[f"{k}_{i}"]), float(ref_losses[f"{k}_{i}"]),
                atol=2e-3, err_msg=f"{k}_{i}",
            )


def test_postprocess_matches(ref, both):
    """Reference PostProcess vs ours on the matching forward outputs."""
    import jax.numpy as jnp

    from vgqa_tpu.models.postprocess import postprocess

    ref_out, our_out = both
    ori_h, ori_w = 360, 480
    pp = ref.pp.PostProcess()
    with torch.no_grad():
        # the reference evaluator passes per-FRAME target sizes
        # (evaluator.py:66-72) and reshapes afterwards
        ref_boxes, _, ref_steds, _ = pp(
            {**ref_out, "pr": (0.0, 0.0)},
            torch.tensor([[ori_h, ori_w]] * T, dtype=torch.float32),
            [list(range(T))], [T],
        )
        ref_boxes = ref_boxes.view(T, 4)

    boxes, s_idx, e_idx = postprocess(
        our_out["pred_boxes"], our_out["pred_sted"],
        jnp.asarray([[ori_h, ori_w]], jnp.float32),
        jnp.ones((1, T), bool),
    )
    np.testing.assert_allclose(
        np.asarray(boxes)[0], ref_boxes.numpy(), atol=0.05
    )
    # reference sted convention: [start_frame, end_frame + 1]
    assert [int(s_idx[0]), int(e_idx[0]) + 1] == ref_steds[0]
