"""Hand-computed numerics for every loss term and evaluator metric —
the parity-critical math (reference: vgqa/core/loss.py, metrics/)."""

import jax.numpy as jnp
import numpy as np

from vgqa_tpu.models.loss import VideoSTGLoss, _bce_logits


def _np_bce(logits, targets):
    return np.maximum(logits, 0) - logits * targets + np.log1p(
        np.exp(-np.abs(logits))
    )


def test_bce_logits_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.randn(10).astype(np.float32) * 3
    t = (rng.rand(10) > 0.5).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(_bce_logits(jnp.asarray(x), jnp.asarray(t))),
        _np_bce(x, t), atol=1e-5,
    )


def _mk_targets(T=4):
    act = np.array([[0, 1, 1, 0]], np.float32)
    boxes = np.zeros((1, T, 4), np.float32)
    boxes[0, 1] = [0.5, 0.5, 0.2, 0.2]
    boxes[0, 2] = [0.4, 0.4, 0.2, 0.2]
    return {
        "boxes": jnp.asarray(boxes),
        "actioness": jnp.asarray(act),
        "time_mask": jnp.ones((1, T), bool),
        "sted": jnp.asarray([[1, 2]], jnp.int32),
        "attr_labels": jnp.asarray([[1.0, 0.0, 0.0]]),
        "verb_labels": jnp.asarray([[0.0, 1.0]]),
    }


def test_loss_boxes_exact():
    loss = VideoSTGLoss()
    targets = _mk_targets()
    pred = np.zeros((1, 4, 4), np.float32)
    pred[0, 1] = [0.5, 0.5, 0.2, 0.2]   # perfect -> l1 0, giou 1
    pred[0, 2] = [0.5, 0.5, 0.2, 0.2]   # offset by 0.1 in cx, cy
    out = loss.loss_boxes({"pred_boxes": jnp.asarray(pred)}, targets, 2.0)
    # L1: frame2 |0.1|+|0.1| = 0.2 summed, / num_boxes 2
    np.testing.assert_allclose(float(out["loss_bbox"]), 0.1, atol=1e-5)
    # GIoU frame1 = 1 -> term 0; frame2: boxes [0.4,0.4,0.6,0.6] vs
    # [0.3,0.3,0.5,0.5]: inter 0.1^2=0.01, union 0.07, enclose 0.09
    iou = 0.01 / 0.07
    giou = iou - (0.09 - 0.07) / 0.09
    np.testing.assert_allclose(
        float(out["loss_giou"]), (1 - giou) / 2.0, atol=1e-4
    )


def test_loss_sted_matches_manual_kl():
    loss = VideoSTGLoss(sigma=2.0)
    targets = _mk_targets()
    T = 4
    rng = np.random.RandomState(0)
    sted = rng.randn(1, T, 2).astype(np.float32)
    out = loss.loss_sted({"pred_sted": jnp.asarray(sted)}, targets, 1.0)

    def manual(pred_col, center):
        frames = np.arange(T)
        dist = np.exp(-((frames - center) ** 2) / (2 * 2.0**2)) + 1e-6
        dist /= dist.sum()
        p = np.exp(pred_col - pred_col.max())
        p /= p.sum()
        return (p * np.log((p + 1e-6) / dist)).sum()

    expected = (manual(sted[0, :, 0], 1) + manual(sted[0, :, 1], 2)) / T
    np.testing.assert_allclose(float(out["loss_sted"]), expected, atol=1e-5)


def test_loss_actioness_weighting():
    loss = VideoSTGLoss(eos_coef=0.1)
    targets = _mk_targets()
    logits = np.zeros((1, 4, 1), np.float32)
    out = loss.loss_actioness(
        {"pred_actioness": jnp.asarray(logits)}, targets, 1.0
    )
    # bce(0, t) = log(2) everywhere; weights [0.1, 1, 1, 0.1]
    expected = np.log(2) * (0.1 + 1 + 1 + 0.1) / 4
    np.testing.assert_allclose(float(out["loss_actioness"]), expected, atol=1e-5)


def test_temporal_bce_masks_padding():
    loss = VideoSTGLoss()
    targets = _mk_targets()
    targets["time_mask"] = jnp.asarray([[1, 1, 1, 0]], bool)
    big = np.array([[0.0, 0.0, 0.0, 100.0]], np.float32)  # junk in pad slot
    out = loss.loss_logits_f_m({"logits_f_m": jnp.asarray(big)}, targets, 1.0)
    # mean over 3 valid frames of bce(0, [0,1,1])
    expected = np.log(2)
    np.testing.assert_allclose(float(out["logits_f_m"]), expected, atol=1e-5)


def test_multilabel_bce():
    loss = VideoSTGLoss()
    targets = _mk_targets()
    logits = np.array([[10.0, -10.0, -10.0]], np.float32)  # near-perfect
    out = loss.loss_logits_r_a({"logits_r_a": jnp.asarray(logits)}, targets, 1.0)
    assert float(out["logits_r_a"]) < 1e-3


def test_evaluator_metrics_hand_example(tmp_path):
    """tIoU/vIoU on a worked example (reference vidstg_evaluator.py:62-130)."""
    import json
    import os

    from vgqa_tpu.data.metrics.evaluator import VidSTGEvaluator

    data_dir = str(tmp_path)
    os.makedirs(os.path.join(data_dir, "data_cache"))
    gt = [
        {
            "item_id": 0,
            "vid": "v",
            "bboxs": {str(f): [0.0, 0.0, 10.0, 10.0] for f in range(2, 6)},
            "description": "d",
            "qtype": "declar",
            "gt_temp_bound": [2, 5],
            "segment_bound": [0, 9],
        }
    ]
    with open(os.path.join(data_dir, "data_cache", "vidstg-test-anno.json"), "w") as f:
        json.dump(gt, f)

    ev = VidSTGEvaluator(None, data_dir, "test", [0.3, 0.5])
    # predicted span [3, 7): gt [2, 5] -> inter = min(5,7)-max(2,3)=2
    # union = (5-2)+(7-3)-2 = 5 -> tiou 0.4
    ev.video_update({0: {"sted": [3, 7], "qtype": "declar"}})
    # predicted boxes: perfect on frames 3,4; half-overlap frame 5
    pred = {3: [[0.0, 0.0, 10.0, 10.0]], 4: [[0.0, 0.0, 10.0, 10.0]],
            5: [[0.0, 5.0, 10.0, 15.0]]}
    ev.update({0: pred})
    ev.update_kf_pr({0: [0.5, 0.25]})
    res = ev.summarize()
    np.testing.assert_allclose(res["declar_tiou"], 0.4, atol=1e-6)
    # vIoU: frames in pred∩gt span [3,5): f3=1, f4=1; f5 outside inter.
    # union span [2,7) has 5 frames -> viou = 2/5
    np.testing.assert_allclose(res["declar_viou"], 0.4, atol=1e-6)
    # gt_viou = (1 + 1 + 1/3) / 4 gt frames (f2 missing, f5 iou=1/3)
    np.testing.assert_allclose(
        res["declar_gt_viou"], (1 + 1 + 1 / 3) / 4, atol=1e-4
    )
    assert res["declar_viou@0.3"] == 1.0 and res["declar_viou@0.5"] == 0.0
    np.testing.assert_allclose(res["declar_kf_p"], 0.5, atol=1e-6)
