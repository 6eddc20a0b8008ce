"""Evaluation driver: even/odd two-pass inference + interpolated merge.

Parity with /root/reference/vgqa/training/evaluator.py:10-151: 128-frame
test clips split into even/odd 64-frame halves, each decoded by a single
jitted forward, then merged on the host — boxes by linear interpolation,
confidences by hold-interpolation, temporal span by union. The model
forward + postprocess is ONE compiled XLA program per half; only the
dict bookkeeping stays on the host.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..models.postprocess import postprocess
from ..data.metrics.evaluator import precision_recall
from ..utils.containers import TextBatch, VideoBatch, normalize_uint8_video


def linear_interp(bbox_dict: Dict[int, List[List[float]]]):
    """Parity with /root/reference/vgqa/training/evaluator.py:11-35."""
    fids = sorted(bbox_dict.keys())
    if len(fids) < 2:
        return bbox_dict
    for i in range(len(fids) - 1):
        left, right = fids[i], fids[i + 1]
        if right - left > 1:
            interval = right - left
            lb = np.asarray(bbox_dict[left][0], dtype=np.float64)
            rb = np.asarray(bbox_dict[right][0], dtype=np.float64)
            step_v = (rb - lb) / interval
            for s in range(1, interval):
                bbox_dict[left + s] = [(lb + s * step_v).tolist()]
    fids = sorted(bbox_dict.keys())
    assert max(fids) - min(fids) + 1 == len(fids)
    return {f: bbox_dict[f] for f in fids}


def linear_interp_conf(conf_dict: Dict[int, Any]):
    """Hold-interpolation (parity with evaluator.py:38-54)."""
    fids = sorted(conf_dict.keys())
    if len(fids) < 2:
        return conf_dict
    for i in range(len(fids) - 1):
        left, right = fids[i], fids[i + 1]
        if right - left > 1:
            interval = right - left
            for s in range(1, interval):
                conf_dict[left + s] = (
                    conf_dict[left] if s <= interval // 2 else conf_dict[right]
                )
    fids = sorted(conf_dict.keys())
    return {f: conf_dict[f] for f in fids}


def make_eval_forward(model, pixel_stats=None):
    """Jitted eval forward + postprocess: the device-side half of
    single_forward (evaluator.py:57-92).

    Outputs are packed into two arrays: each host fetch is a full network
    round trip on remote-device tunnels, so [boxes|att|select] travel as one
    [V, T, 6] tensor and the span indices as one [V, 2] tensor.

    uint8 batches (TPU.UINT8_FEED loader output) are normalized on device
    with ``pixel_stats=(mean, std)``; letterbox and time padding are
    re-zeroed to match the host float pipeline."""

    @jax.jit
    def fwd(params, video: VideoBatch, text: TextBatch, ori_sizes, letterbox):
        if video.frames.dtype == jnp.uint8:
            video = normalize_uint8_video(video, pixel_stats)
        out = model.apply(params, video, text, train=False)
        boxes, s_idx, e_idx = postprocess(
            out["pred_boxes"], out["pred_sted"], ori_sizes, video.time_mask,
            letterbox=letterbox,
        )
        packed = jnp.concatenate(
            [
                boxes.astype(jnp.float32),
                out["att_sequences"].astype(jnp.float32)[..., None],
                out["select_mask"].astype(jnp.float32)[..., None],
            ],
            axis=-1,
        )
        span = jnp.stack([s_idx, e_idx], axis=-1).astype(jnp.int32)
        return packed, span

    return fwd


def dispatch_forward(
    fwd, params, video: VideoBatch, text: TextBatch, infos: List[Dict],
    canvas=None,
):
    """Dispatch one half-clip pass; returns DEVICE arrays (no host sync).

    JAX dispatch is asynchronous, so callers may keep doing host work
    (e.g. decoding the next video — inference/grounding.predict_many's
    pipelining) while the device executes; fetch later with
    :func:`convert_outputs`."""
    import jax.numpy as jnp

    ori = jnp.asarray([list(i["ori_size"]) for i in infos], jnp.float32)
    # fold the static canvas dims into the ori->canvas-pixel affine so the
    # device-side inversion works on normalized coords directly
    ch, cw = canvas if canvas is not None else (
        video.frames.shape[2], video.frames.shape[3])
    lb = np.asarray(
        [i.get("letterbox", [cw / i["ori_size"][1], ch / i["ori_size"][0], 0.0, 0.0])
         for i in infos], np.float32,
    )
    lb = lb / np.array([cw, ch, cw, ch], np.float32)
    return fwd(params, video, text, ori, jnp.asarray(lb))


def convert_outputs(packed_dev, span_dev, infos: List[Dict],
                    gt_actioness: np.ndarray):
    """Fetch a dispatched pass and convert to per-video dicts
    (host side of evaluator.py:57-92)."""
    packed = np.asarray(packed_dev)
    span = np.asarray(span_dev)
    boxes = packed[..., :4]
    att = packed[..., 4]
    select = packed[..., 5] > 0.5
    starts = span[..., 0]
    ends = span[..., 1]

    bbox_pred, att_pred, temp_pred, kf_pred = {}, {}, {}, {}
    for i, info in enumerate(infos):
        vid = info["item_id"]
        fids = info["frame_ids"]
        dur = info["duration"]
        bbox_pred[vid] = {fids[t]: [boxes[i, t].tolist()] for t in range(dur)}
        att_pred[vid] = {fids[t]: [float(att[i, t])] for t in range(dur)}
        temp_pred[vid] = {
            "sted": [fids[int(starts[i])], fids[int(ends[i])] + 1],
            "qtype": info.get("qtype", "none"),
        }
        chosen = [t for t in range(dur) if select[i, t]]
        gt_idx = [t for t in range(dur) if gt_actioness[i, t] > 0]
        kf_pred[vid] = list(precision_recall(chosen, gt_idx))
    return bbox_pred, att_pred, temp_pred, kf_pred


def single_forward(
    fwd, params, video: VideoBatch, text: TextBatch, infos: List[Dict],
    gt_actioness: np.ndarray, canvas=None,
):
    """dispatch_forward + convert_outputs in one synchronous call."""
    packed_dev, span_dev = dispatch_forward(
        fwd, params, video, text, infos, canvas=canvas
    )
    return convert_outputs(packed_dev, span_dev, infos, gt_actioness)


def do_eval(cfg, mode, logger, model, params, data_loader, evaluator,
            sharding=None):
    """Parity with do_eval (evaluator.py:96-151).

    ``sharding``: optional NamedSharding for the batch leaves — an eval
    loader built with ``global_batch=dp`` then spreads test clips across
    the data axis so no device idles during validation (the reference
    evaluates on every DDP rank)."""
    if logger:
        logger.info(f"Start evaluation on the {mode} split of {cfg.DATASET.NAME}")
    fwd = make_eval_forward(
        model, pixel_stats=(cfg.INPUT.PIXEL_MEAN, cfg.INPUT.PIXEL_STD)
    )

    for batch in data_loader:
        video: VideoBatch = batch["video"]
        text: TextBatch = batch["text"]
        infos = batch["info"]
        act = np.asarray(batch["targets"]["actioness"])
        if sharding is not None:
            video = jax.device_put(video, sharding)
            text = jax.device_put(text, sharding)

        halves = []
        for start in (0, 1):
            v_half = video.subsample(2, start)
            infos_half = [
                {
                    **info,
                    "frame_ids": info["frame_ids"][start::2],
                    "duration": len(info["frame_ids"][start::2]),
                }
                for info in infos
            ]
            act_half = act[:, start::2]
            halves.append(
                single_forward(fwd, params, v_half, text, infos_half, act_half)
            )

        (b1, a1, t1, k1), (b2, a2, t2, k2) = halves
        for vid in b1:
            b1[vid].update(b2[vid])
            a1[vid].update(a2[vid])
            evaluator.update({vid: linear_interp(b1[vid])})
            evaluator.update_att({vid: linear_interp_conf(a1[vid])})
            evaluator.update_kf_pr(
                {vid: [(k1[vid][0] + k2[vid][0]) / 2, (k1[vid][1] + k2[vid][1]) / 2]}
            )
            evaluator.video_update(
                {
                    vid: {
                        "sted": [
                            min(t1[vid]["sted"][0], t2[vid]["sted"][0]),
                            max(t1[vid]["sted"][1], t2[vid]["sted"][1]),
                        ],
                        "qtype": t1[vid].get("qtype", "none"),
                    }
                }
            )

    evaluator.synchronize_between_processes()
    if logger:
        logger.info(f"Complete the inference on {mode} split of {cfg.DATASET.NAME}")
    return evaluator.summarize()
