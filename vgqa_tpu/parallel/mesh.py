"""Device mesh + sharding rules.

The reference's only parallelism is NCCL data-parallel DDP with one process
per GPU (/root/reference/tools/train.py:73-80,377-384). TPU-natively the
whole cluster runs ONE jitted program over a ``jax.sharding.Mesh`` with
three axes:

* ``dp`` — data parallel: the leading video axis of every batch shards here;
  gradient all-reduce is inserted by XLA over ICI (replacing DDP hooks).
* ``sp`` — sequence (frame) parallel: the temporal axis of a clip shards
  here (no reference counterpart — the reference handles long video only
  algorithmically, 64/128-frame subsampling). Almost all grounding FLOPs
  are per-frame (ResNet, cross-modal encoder) or local-window in time
  (Video Swin), so GSPMD keeps them sharded and inserts collectives only
  at the genuinely temporal ops (Swin shifted windows, time decoder,
  temporal pooling). Lets N chips split ONE video — latency scaling that
  dp (more videos) cannot give, and headroom past 128 frames per chip.
* ``tp`` — tensor parallel: Megatron-style column/row sharding of FFN and
  attention projection weights (no reference counterpart; enables scaling
  the QA LLM and high-resolution grounding).

Rules are path-based over the param pytree, so models need no annotations.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(dp: int = 0, tp: int = 1, sp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp <= 0:
        dp = n // (tp * sp)
    assert dp >= 1 and dp * sp * tp <= n, (
        f"mesh dp={dp} x sp={sp} x tp={tp} needs more than {n} devices"
    )
    arr = np.asarray(devices[: dp * sp * tp]).reshape(dp, sp, tp)
    return Mesh(arr, ("dp", "sp", "tp"))


# Dense kernels that grow to ffn-width (column parallel: shard output dim)
_COL_PARALLEL = (
    "linear1", "intermediate", "mlp_fc1", "q_proj", "k_proj", "v_proj",
    "qkv", "gate_proj", "up_proj", "fc1",
)
# Dense kernels that shrink from ffn-width (row parallel: shard input dim)
_ROW_PARALLEL = ("linear2", "output", "mlp_fc2", "out_proj", "o_proj",
                 "down_proj", "fc2")


def _pspec_for(path, leaf, tp: int) -> P:
    if tp <= 1:
        return P()
    keys = [getattr(k, "key", str(k)) for k in path]
    name = keys[-1]
    parent = keys[-2] if len(keys) >= 2 else ""
    if name == "kernel" and leaf.ndim == 2:
        if parent in _COL_PARALLEL and leaf.shape[1] % tp == 0:
            return P(None, "tp")
        if parent in _ROW_PARALLEL and leaf.shape[0] % tp == 0:
            return P("tp", None)
    if name == "bias" and parent in _COL_PARALLEL and leaf.ndim == 1 \
            and leaf.shape[0] % tp == 0:
        return P("tp")
    return P()


def param_shardings(mesh: Mesh, params):
    """NamedSharding tree for a param pytree under the mesh's tp axis."""
    tp = mesh.shape["tp"]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _pspec_for(path, leaf, tp)), params
    )


def batch_sharding(mesh: Mesh):
    """Leading-axis dp sharding for batch pytrees (VideoBatch/TextBatch/targets)."""
    return NamedSharding(mesh, P("dp"))


# Batch fields whose dim 1 is the clip's temporal (frame) axis. Everything
# else in a batch is per-video ([V, ...]) and shards on dp only.
_TIME_DIM1_FIELDS = frozenset(
    {"frames", "time_mask", "boxes", "actioness"}
)


def sp_batch_shardings(mesh: Mesh, video, text, targets=None):
    """Per-field shardings placing the frame axis on ``sp``.

    Returns ``(video_sh, text_sh, targets_sh)`` pytrees of NamedShardings
    matching ``(VideoBatch, TextBatch, targets-dict)`` for ``jax.device_put``:
    fields with a [V, T, ...] layout (frames, time_mask, boxes, actioness)
    shard dim 0 on ``dp`` and dim 1 on ``sp``; per-video fields (pixel_mask,
    token_ids, sted, attr/verb labels) shard dim 0 on ``dp`` only. With
    ``sp == 1`` this degenerates to :func:`batch_sharding` placement.
    """
    sp = mesh.shape["sp"]
    dp_only = NamedSharding(mesh, P("dp"))
    dp_sp = NamedSharding(mesh, P("dp", "sp"))

    def pick(name: str, leaf) -> NamedSharding:
        if sp > 1 and name in _TIME_DIM1_FIELDS and leaf.ndim >= 2:
            if leaf.shape[1] % sp == 0:
                return dp_sp
            # replicating across a reserved sp axis silently wastes sp-1
            # of every sp devices — surface the misconfiguration loudly
            import logging

            logging.getLogger(__name__).warning(
                "sp=%d does not divide the frame axis of %r (T=%d): "
                "falling back to dp-only sharding; the sp axis does no "
                "work for this field", sp, name, leaf.shape[1],
            )
        return dp_only

    video_sh = type(video)(
        frames=pick("frames", video.frames),
        pixel_mask=pick("pixel_mask", video.pixel_mask),
        time_mask=pick("time_mask", video.time_mask),
    )
    text_sh = jax.tree.map(lambda _: dp_only, text)
    targets_sh = None
    if targets is not None:
        targets_sh = {k: pick(k, v) for k, v in targets.items()}
    return video_sh, text_sh, targets_sh


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
