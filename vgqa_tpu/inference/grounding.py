"""Spatio-temporal video grounding inference API.

Parity with /root/reference/vgqa/inference/grounding.py:142-244: decode the
video, uniformly sample 2x TRAIN_SAMPLE_NUM frames, square-resize +
normalize, run the even/odd two-pass protocol, merge with linear
interpolation, and return ``{"temporal": {...}, "tube": [...]}`` with the
reference's exact schema.

The model forward + postprocess is one cached jitted program; repeat calls
with the same (cfg, ckpt) reuse the loaded model via a module-level cache
(the reference reloads weights on every predict call).
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import build_default_cfg
from ..data.tokenizer import batch_encode, build_tokenizer
from ..data.video_io import (
    read_frames,
    read_frames_yuv,
    uniform_sample_indices,
    video_info,
)
from ..models import GroundingConfig, VSTGNet
from ..training.checkpoint import CheckpointManager
from ..training.evaluator import (
    convert_outputs,
    dispatch_forward,
    linear_interp,
    linear_interp_conf,
    make_eval_forward,
    single_forward,
)
from ..utils.containers import TextBatch, VideoBatch

DEFAULT_CONFIG_PATH = "configs/grounding_vidstg.yaml"
DEFAULT_CHECKPOINT_PATH = "checkpoints/grounding/vidstg"


def _load_yaml_config(config_path: str):
    if not os.path.exists(config_path):
        raise FileNotFoundError(f"Config file not found: {config_path}")
    cfg = build_default_cfg()
    cfg.merge_from_file(config_path)
    cfg.freeze()
    return cfg


@lru_cache(maxsize=2)
def _load_model(config_path: str, ckpt_path: str):
    cfg = _load_yaml_config(config_path)
    model = VSTGNet(GroundingConfig.from_cfg(cfg))
    res = cfg.INPUT.RESOLUTION
    t_half = cfg.INPUT.TRAIN_SAMPLE_NUM
    video = VideoBatch(
        frames=jnp.zeros((1, t_half, res, res, 3)),
        pixel_mask=jnp.ones((1, res, res), bool),
        time_mask=jnp.ones((1, t_half), bool),
    )
    tokenizer = build_tokenizer(cfg.MODEL.TEXT_MODEL.VOCAB_DIR)
    ids, mask = batch_encode(tokenizer, ["warmup"], cfg.INPUT.MAX_QUERY_LEN)
    params = jax.jit(
        lambda rng: model.init(
            rng, video, TextBatch(jnp.asarray(ids), jnp.asarray(mask)), train=False
        )
    )(jax.random.PRNGKey(0))

    if ckpt_path and os.path.exists(ckpt_path):
        mgr = CheckpointManager(os.path.dirname(ckpt_path) or ".",
                                save_to_disk=False)
        restored = mgr.load(params, ckpt_path)
        if restored is None:
            raise ValueError(f"Unrecognized checkpoint format: {ckpt_path}")
        params = restored
    elif ckpt_path:
        import warnings

        warnings.warn(
            f"Checkpoint not found: {ckpt_path}; using random initialization"
        )

    # serve at the configured compute precision (bfloat16 by default)
    from ..utils.dtype import cast_floating, resolve_dtype

    dtype = resolve_dtype(cfg.TPU.COMPUTE_DTYPE)
    params = cast_floating(params, dtype)
    # one cached jitted forward per loaded model: rebuilding it per predict
    # call would recompile every request
    fwd = make_eval_forward(model)

    # serving wrapper taking RAW uint8 frames: pixels travel to the device
    # at 1 byte/channel (4x less upload than f32 — the upload dominates
    # per-request latency on remote-device links) and ImageNet
    # normalization runs fused on device
    mean = jnp.asarray(cfg.INPUT.PIXEL_MEAN, jnp.float32)
    std = jnp.asarray(cfg.INPUT.PIXEL_STD, jnp.float32)

    # Both wrappers take ALL sampled frames interleaved per video
    # ([N, T2, ...], N = videos in the coalesced batch) and do the even/odd
    # half split on device — the model sees V = 2N rows (video i's halves
    # at rows 2i, 2i+1): predict() uploads the frames in decode-order
    # chunks (jax.device_put serializes in the background, so chunk k+1's
    # host decode overlaps chunk k's upload), and a host-side stride-2
    # restack would force a host sync.
    @jax.jit
    def fwd_u8(params, frames_all, pixel_mask, time_mask, text: TextBatch,
               ori_sizes, letterbox):
        n, t2 = frames_all.shape[:2]
        both = jnp.stack([frames_all[:, 0::2], frames_all[:, 1::2]], axis=1)
        both = both.reshape(2 * n, t2 // 2, *frames_all.shape[2:])
        frames = (both.astype(jnp.float32) / 255.0 - mean) / std
        video = VideoBatch(frames.astype(dtype), pixel_mask, time_mask)
        return fwd(params, video, text, ori_sizes, letterbox)

    # YUV-upload variant: frames arrive as flat I420 planes
    # ([N, T2, h*w*3/2] uint8 — HALF the RGB bytes; host-to-device upload
    # is serialization-bound on remote links) and the BT.601 conversion +
    # chroma upsample run fused on device. ``full_range`` is a traced [N]
    # 0/1 vector selecting limited (MPEG) vs full (JPEG) range
    # coefficients PER VIDEO (a coalesced batch may mix sources).
    res_ = cfg.INPUT.RESOLUTION

    @jax.jit
    def fwd_yuv(params, frames_all, pixel_mask, time_mask,
                text: TextBatch, ori_sizes, letterbox, full_range):
        N, T2, _ = frames_all.shape
        npx = res_ * res_
        nc = (res_ // 2) * (res_ // 2)
        flat = frames_all
        y = flat[..., :npx].reshape(N, T2, res_, res_).astype(jnp.float32)
        u = flat[..., npx:npx + nc].reshape(
            N, T2, res_ // 2, res_ // 2).astype(jnp.float32)
        v = flat[..., npx + nc:].reshape(
            N, T2, res_ // 2, res_ // 2).astype(jnp.float32)
        # nearest 2x2 chroma upsample (matches swscale's unscaled
        # yuv420p->rgb block sharing)
        u = jnp.repeat(jnp.repeat(u, 2, axis=2), 2, axis=3) - 128.0
        v = jnp.repeat(jnp.repeat(v, 2, axis=2), 2, axis=3) - 128.0
        fr = (full_range > 0)[:, None, None, None]
        yl = jnp.where(fr, y, 1.1643835616 * (y - 16.0))
        r = yl + jnp.where(fr, 1.402, 1.5960267857) * v
        g = (yl - jnp.where(fr, 0.344136, 0.3917622768) * u
             - jnp.where(fr, 0.714136, 0.8129676339) * v)
        b = yl + jnp.where(fr, 1.772, 2.0172321429) * u
        rgb = jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)
        both = jnp.stack([rgb[:, 0::2], rgb[:, 1::2]], axis=1)
        both = both.reshape(2 * N, T2 // 2, res_, res_, 3)
        frames = (both / 255.0 - mean) / std
        video = VideoBatch(frames.astype(dtype), pixel_mask, time_mask)
        return fwd(params, video, text, ori_sizes, letterbox)

    return cfg, model, params, tokenizer, fwd_u8, fwd_yuv


def _decode_upload(video_path: str, frame_ids, res: int):
    """Decode the sampled frames and start their async device upload.

    Square resize to the model resolution happens DURING decode: the
    native decoder folds the scale into the same swscale pass that
    converts pixel format (grounding.py:77-87 uses a plain square Resize,
    not the letterbox train transform); normalization happens on device.
    When the native decoder is present, frames travel to the device as
    scaled I420 planes (half the RGB bytes — upload is the serving
    bottleneck on remote links) and the colorspace conversion runs fused
    on device; VGQA_SERVE_YUV=0 forces the RGB path. Decode happens in
    contiguous chunks, each handed to jax.device_put as soon as it is
    decoded: device_put serializes in a background thread, so chunk k's
    upload rides under chunk k+1's host decode and the end-to-end latency
    approaches max(decode, upload) + forward instead of their sum.
    VGQA_DECODE_CHUNKS=1 restores the sequential path.

    Returns ``(frames [T2, ...] on device, frame_ids, yuv, full_range)``
    with T2 made even (the even/odd split duplicates the last frame of an
    odd-count short video rather than dropping one)."""
    use_yuv = os.environ.get("VGQA_SERVE_YUV", "1") != "0"
    n_chunks = max(1, int(os.environ.get("VGQA_DECODE_CHUNKS", "4")))
    n_chunks = min(n_chunks, max(1, len(frame_ids)))
    full_range = 0.0
    parts = []
    yuv = use_yuv
    for cids in np.array_split(np.asarray(frame_ids), n_chunks):
        chunk = None
        if yuv:
            out = read_frames_yuv(video_path, [int(i) for i in cids],
                                  (res, res))
            if out is None:
                yuv = False   # native decoder absent: RGB for ALL chunks
            else:
                chunk, fr_flag = out
                full_range = float(fr_flag)
        if chunk is None:
            chunk = read_frames(video_path, [int(i) for i in cids],
                                size=(res, res))
        parts.append(jax.device_put(chunk))   # async upload
    if not yuv and len(parts) > 1 and parts[0].ndim != parts[-1].ndim:
        # first chunk(s) decoded as YUV before the fallback kicked in:
        # redecode those as RGB (native decoder failures are all-or-nothing
        # in practice; this is a correctness guard)
        parts = [
            jax.device_put(read_frames(video_path, [int(i) for i in cids],
                                       size=(res, res)))
            for cids in np.array_split(np.asarray(frame_ids), n_chunks)
        ]
    frames = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    if frames.shape[0] < 2:
        frames = jnp.concatenate([frames, frames], axis=0)
        frame_ids = list(frame_ids) * 2
    if frames.shape[0] % 2:
        frames = jnp.concatenate([frames, frames[-1:]], axis=0)
        frame_ids = list(frame_ids) + [frame_ids[-1]]
    return frames, np.asarray(frame_ids), yuv, full_range


def _merge_halves(b1, a1, t1, row: int, fps: float) -> Dict[str, Any]:
    """Merge one video's even/odd half predictions (rows ``row``/``row+1``
    of single_forward's outputs) into the reference's response schema."""
    b1[row].update(b1[row + 1])
    bbox_full = linear_interp(b1[row])
    a1[row].update(a1[row + 1])
    att_full = linear_interp_conf(a1[row])
    merged_sted = [
        min(t1[row]["sted"][0], t1[row + 1]["sted"][0]),
        max(t1[row]["sted"][1], t1[row + 1]["sted"][1]),
    ]

    temporal = {
        "start": float(merged_sted[0]) / max(fps, 1e-6),
        "end": float(merged_sted[1]) / max(fps, 1e-6),
        "score": 1.0,
    }
    tube = []
    for fid in sorted(bbox_full.keys()):
        bbox = bbox_full[fid][0]
        conf = att_full.get(fid, 1.0)
        score = float(conf[0] if isinstance(conf, list) else conf)
        tube.append(
            {
                "frame": int(fid),
                "bbox": [float(b) for b in bbox],
                "score": score,
            }
        )
    return {"temporal": temporal, "tube": tube}


def _group_inputs(loaded, group):
    """Build the V=2N batched forward inputs for videos sharing (yuv, T2).

    Returns ``(fwd, params, video, text, infos, gt_act, canvas)`` ready
    for dispatch_forward/single_forward."""
    cfg, model, params, tokenizer, fwd_u8, fwd_yuv = loaded
    res = cfg.INPUT.RESOLUTION
    n = len(group)
    frames = jnp.stack([g["frames"] for g in group])        # [N, T2, ...]
    t_half = frames.shape[1] // 2
    pixel_mask = jnp.ones((2 * n, res, res), bool)
    time_mask = jnp.ones((2 * n, t_half), bool)
    video = VideoBatch(frames=frames, pixel_mask=pixel_mask,
                       time_mask=time_mask)
    if group[0]["yuv"]:
        fr = jnp.asarray([g["full_range"] for g in group], jnp.float32)
        fwd = lambda p, v, t, o, lb: fwd_yuv(  # noqa: E731
            p, v.frames, v.pixel_mask, v.time_mask, t, o, lb, fr)
    else:
        fwd = lambda p, v, t, o, lb: fwd_u8(  # noqa: E731
            p, v.frames, v.pixel_mask, v.time_mask, t, o, lb)
    queries = []
    for g in group:
        queries += [g["query"], g["query"]]
    ids, mask = batch_encode(tokenizer, queries, cfg.INPUT.MAX_QUERY_LEN)
    text = TextBatch(jnp.asarray(ids), jnp.asarray(mask))
    infos = [
        {
            "item_id": 2 * i + half,
            "vid": f"video{i}",
            "frame_ids": group[i]["frame_ids"][half::2],
            "duration": t_half,
            "qtype": "declar",
            "ori_size": group[i]["ori_size"],
        }
        for i in range(n)
        for half in (0, 1)
    ]
    gt_act = np.ones((2 * n, t_half), np.float32)
    return fwd, params, video, text, infos, gt_act, (res, res)


def _run_group(loaded, group) -> None:
    """Run one coalesced forward over videos sharing (yuv, T2); fills
    each job's ``out``. (The V=2N single-dispatch path — see predict_many
    for when this is chosen over per-video pipelining.)"""
    fwd, params, video, text, infos, gt_act, canvas = _group_inputs(
        loaded, group)
    b1, a1, t1, _ = single_forward(fwd, params, video, text, infos, gt_act,
                                   canvas=canvas)
    for i, g in enumerate(group):
        g["out"] = _merge_halves(b1, a1, t1, 2 * i, g["fps"])


def predict(
    video_path: str,
    query: str,
    cfg_path: str = DEFAULT_CONFIG_PATH,
    ckpt_path: str = DEFAULT_CHECKPOINT_PATH,
    device_str: Optional[str] = None,
    batch_size: int = 32,
) -> Dict[str, Any]:
    """Run grounding on one video. Returns the reference's schema
    (grounding.py:227-244): temporal span in seconds + per-frame tube."""
    del device_str, batch_size  # device placement is implicit in JAX
    result = predict_many(
        [{"video_path": video_path, "query": query}], cfg_path, ckpt_path
    )[0]
    if isinstance(result, Exception):
        raise result
    return result


def predict_many(
    requests,
    cfg_path: str = DEFAULT_CONFIG_PATH,
    ckpt_path: str = DEFAULT_CHECKPOINT_PATH,
):
    """Serve N grounding requests with coalesced forwards.

    ``requests``: dicts with ``video_path`` and ``query``. Returns a list
    aligned with ``requests``: each slot is the reference-schema result
    dict or the exception raised preparing that request (a bad video
    fails its own slot only). Net-new vs the reference's single-flight
    lock (/root/reference/app/server.py:149).

    Default policy (**pipelined**): each video's V=2 (even/odd halves)
    forward is dispatched asynchronously the moment its frames are
    uploaded, so the device executes video i's forward WHILE the host
    decodes video i+1; results are fetched after the last dispatch. On
    decode-bound hosts this makes an N-video batch cost
    ~N x decode + one forward tail (measured ≤ N sequential solo calls —
    r3's decode-all-then-forward-all coalescing cost 3.28 s/pair vs
    2.46 s sequential on the 1-core bench host, tools/bench_serving.py),
    and on device-bound hosts it matches the coalesced V=2N forward
    because clip throughput plateaus beyond 2 clip-halves per dispatch
    (BASELINE.md: batch 2 -> 4 flat). ``VGQA_GROUND_COALESCE=1``
    restores the single V=2N-dispatch grouping for hosts where fewer,
    larger dispatches measure better (extreme dispatch-latency links)."""
    loaded = _load_model(cfg_path, ckpt_path)
    cfg = loaded[0]
    res = cfg.INPUT.RESOLUTION
    target_t = max(2, int(cfg.INPUT.TRAIN_SAMPLE_NUM) * 2)
    coalesce = os.environ.get("VGQA_GROUND_COALESCE", "0") == "1"

    jobs = [None] * len(requests)
    pending = []
    for i, req in enumerate(requests):
        try:
            path = req["video_path"]
            if not os.path.exists(path):
                raise FileNotFoundError(f"Video not found: {path}")
            total_frames, fps, w0, h0 = video_info(path)
            frame_ids = uniform_sample_indices(total_frames, target_t)
            frames, frame_ids, yuv, full_range = _decode_upload(
                path, frame_ids, res)
            jobs[i] = {
                "frames": frames, "frame_ids": frame_ids, "yuv": yuv,
                "full_range": full_range, "fps": fps,
                "ori_size": (h0, w0), "query": req["query"], "out": None,
            }
            if not coalesce:
                # dispatch this video's forward NOW (async): the device
                # works on it while the next request decodes on host
                fwd, params, video, text, infos, gt_act, canvas = (
                    _group_inputs(loaded, [jobs[i]]))
                dev = dispatch_forward(fwd, params, video, text, infos,
                                       canvas=canvas)
                pending.append((jobs[i], dev, infos, gt_act))
        except Exception as e:  # noqa: BLE001 - per-slot failure isolation
            jobs[i] = e

    if coalesce:
        # group by (decode format, frame count): a group shares one jitted
        # program shape; short videos with unusual T2 simply run solo
        groups: Dict[Tuple[bool, int], list] = {}
        for job in jobs:
            if isinstance(job, Exception):
                continue
            groups.setdefault(
                (job["yuv"], int(job["frames"].shape[0])), []
            ).append(job)
        for group in groups.values():
            _run_group(loaded, group)
    else:
        for job, dev, infos, gt_act in pending:
            b1, a1, t1, _ = convert_outputs(dev[0], dev[1], infos, gt_act)
            job["out"] = _merge_halves(b1, a1, t1, 0, job["fps"])

    return [j if isinstance(j, Exception) else j["out"] for j in jobs]
