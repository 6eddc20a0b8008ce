"""Optimizer factory: per-module learning-rate groups + functional schedule.

Parity with /root/reference/vgqa/training/optimizer.py:18-58 (five param
groups selected by name-match) and the per-step functional schedule
adjust_learning_rate (/root/reference/vgqa/training/scheduler.py:188-226),
expressed as one ``optax.multi_transform``: the schedule lives inside each
group's AdamW as a step-callable, so the whole update is part of the jitted
train step (the reference mutates optimizer.param_groups on the host every
iteration).

Freezing is part of the same labeling: parameters the reference never
updates (Swin when FREEZE, RoBERTa when FREEZE, the ResNet stem+layer1 and
all FrozenBatchNorm stats — backbone.py:70-77) map to a ``set_to_zero``
transform instead of relying on stop_gradient.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax


GROUPS = ("rest", "vis", "text", "temp", "clas", "frozen")


def label_params(params, freeze_swin: bool = True, freeze_text: bool = False):
    """Assign each param leaf a group label by its tree path.

    Mirrors the name-matching of make_optimizer
    (/root/reference/vgqa/training/optimizer.py:21-30):
      vis_encoder -> 'vis', text_encoder -> 'text',
      ground_decoder.time_decoder -> 'temp', *_clas -> 'clas', else 'rest'.
    """

    def label_one(path) -> str:
        keys = [getattr(k, "key", str(k)) for k in path]
        top = keys[1] if keys and keys[0] == "params" else keys[0]
        joined = "/".join(keys)
        if top in ("vid", "vid_stub"):
            return "frozen" if freeze_swin else "rest"
        if top == "vis_encoder":
            # stem + layer1 always frozen; FrozenBN affine always frozen
            if any(k in ("conv1", "bn1") for k in keys[2:3]):
                return "frozen"
            if any(k.startswith("layer1_") for k in keys):
                return "frozen"
            if any(k.startswith("bn") or k == "downsample_bn" for k in keys):
                return "frozen"
            return "vis"
        if top == "text_encoder":
            return "frozen" if freeze_text else "text"
        if "time_decoder" in keys and top == "ground_decoder":
            return "temp"
        if top.endswith("_clas"):
            return "clas"
        del joined
        return "rest"

    return jax.tree_util.tree_map_with_path(lambda p, _: label_one(p), params)


def make_schedule(cfg, max_iter: int, group: str) -> Callable:
    """Per-step LR for one group, parity with adjust_learning_rate
    (/root/reference/vgqa/training/scheduler.py:188-226)."""
    s = cfg.SOLVER
    base = {
        "rest": s.BASE_LR,
        "vis": s.VIS_BACKBONE_LR,
        "text": s.TEXT_LR,
        "temp": s.TEMP_LR,
        "clas": s.VERB_LR,
    }[group]
    warmup = max(1, round(s.WARMUP_PROP * max_iter))
    iter_per_epoch = max(1, round(max_iter / s.MAX_EPOCH))
    drop_steps = jnp.asarray(list(s.SCHEDULE.DROP_STEP), jnp.int32)
    sched_type = s.SCHEDULE.TYPE

    def schedule(step):
        # optax passes the number of completed updates (0 on the first);
        # the reference steps once at the base LR and adjusts afterwards
        # with a 1-based counter (train.py:216-219), so shift by one.
        step = jnp.asarray(step, jnp.float32) + 1.0
        epoch = jnp.floor(step / iter_per_epoch)
        n_drops = jnp.sum(epoch >= drop_steps.astype(jnp.float32))
        multistep = 0.1 ** n_drops.astype(jnp.float32)
        warm = step / warmup
        lin_decay = jnp.maximum(
            0.0, (max_iter - step) / max(1, max_iter - warmup)
        )
        if sched_type == "multistep_with_warmup_all":
            gamma = jnp.where(step < warmup, warm, multistep)
        elif sched_type == "multistep_with_warmup":
            if group in ("text", "temp"):
                gamma = jnp.where(step < warmup, warm, lin_decay)
            else:
                gamma = multistep
        else:
            raise ValueError(f"Unsupported schedule type: {sched_type}")
        return base * gamma

    return schedule


def clip_by_global_norm_flat(max_norm: float) -> optax.GradientTransformation:
    """``optax.clip_by_global_norm`` with the norm computed over ONE
    concatenated vector.

    ``optax.global_norm`` emits a scalar sum-of-squares reduction per leaf
    — profiled at 64f@420 that is ~444 scalar-output fusions costing
    ~33 ms/step on TPU (each tiny-grid reduction underutilizes the chip).
    Concatenating the raveled f32 grads first costs one ~0.7 GB copy
    (~2 ms) and a single well-tiled reduction. Semantics match optax:
    updates are untouched when the norm is under ``max_norm``, otherwise
    scaled by ``max_norm / norm`` (scale = max_norm / max(norm, max_norm)
    — a zero norm yields scale 1, avoiding the 0/0)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        leaves = jax.tree.leaves(updates)
        flat = jnp.concatenate(
            [jnp.ravel(u).astype(jnp.float32) for u in leaves]
        )
        g_norm = jnp.sqrt(jnp.sum(flat * flat))
        scale = max_norm / jnp.maximum(g_norm, max_norm)
        updates = jax.tree.map(
            lambda u: u * scale.astype(u.dtype), updates
        )
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def clip_by_global_norm_bucketed(
    max_norm: float, small_bytes: int = 1 << 20
) -> optax.GradientTransformation:
    """Global-norm clip with a HYBRID squared-sum reduction.

    The r4 profile split the clip cost two ways: ~33 ms/step of 444
    per-leaf scalar reductions (each tiny grad's reduction underutilizes
    the chip) AND the measured flat-clip failure — concatenating ALL
    leaves into one 0.7 GB vector costs more in copies than the scalar
    reductions it removes (343 vs 272 ms/step, BASELINE.md). The copies
    are the big leaves' fault and the reduction count is the small
    leaves' fault, so split by size:

    * leaves whose f32 raveled form is <= ``small_bytes`` (the hundreds
      of biases/LN vectors/small projections) concatenate into ONE small
      vector — cheap copies, one well-tiled reduction;
    * the few large matmul grads keep per-leaf ``sum(x*x)`` reductions —
      no copies, and a big dense reduction is already efficient.

    The partial sums add into one scalar; scale semantics match optax
    (`max_norm / max(norm, max_norm)`, zero-norm safe)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        leaves = jax.tree.leaves(updates)
        small = [u for u in leaves if 4 * u.size <= small_bytes]
        big = [u for u in leaves if 4 * u.size > small_bytes]
        parts = [
            jnp.sum(jnp.square(u.astype(jnp.float32))) for u in big
        ]
        if small:
            flat = jnp.concatenate(
                [jnp.ravel(u).astype(jnp.float32) for u in small]
            )
            parts.append(jnp.sum(flat * flat))
        g_norm = jnp.sqrt(jnp.sum(jnp.stack(parts)))
        scale = max_norm / jnp.maximum(g_norm, max_norm)
        updates = jax.tree.map(
            lambda u: u * scale.astype(u.dtype), updates
        )
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    cfg, params, max_iter: int
) -> Tuple[optax.GradientTransformation, Any]:
    """Build the grouped optimizer. Returns (tx, labels_tree)."""
    s = cfg.SOLVER
    labels = label_params(
        params,
        freeze_swin=cfg.MODEL.VIDEO_SWIN.FREEZE,
        freeze_text=cfg.MODEL.TEXT_MODEL.FREEZE,
    )

    def group_tx(group: str) -> optax.GradientTransformation:
        if group == "frozen":
            return optax.set_to_zero()
        lr = make_schedule(cfg, max_iter, group)
        opt = s.OPTIMIZER
        if opt == "adamw":
            return optax.adamw(lr, weight_decay=s.WEIGHT_DECAY)
        if opt == "adam":
            return optax.adam(lr)
        if opt == "sgd":
            return optax.sgd(lr, momentum=s.MOMENTUM)
        if opt == "rmsprop":
            return optax.rmsprop(lr, momentum=s.MOMENTUM)
        raise ValueError(f"Unsupported optimizer type: {opt}")

    transforms = {g: group_tx(g) for g in GROUPS}
    tx = optax.multi_transform(transforms, labels)
    if s.MAX_GRAD_NORM > 0:
        # Clip over TRAINABLE leaves only. torch's clip_grad_norm_ skips
        # params whose .grad is None, and frozen params (requires_grad
        # False, backbone.py:70-77) never get one — so the reference norm
        # never sees frozen grads. Masking here restores that semantic AND
        # lets XLA dead-code-eliminate the entire frozen backward (the
        # full-tree norm was the only consumer of e.g. the frozen Video
        # Swin tower's gradients — worth ~100+ ms/step at 64f@420).
        trainable = jax.tree.map(lambda g: g != "frozen", labels)
        # VGQA_CLIP_IMPL selects the squared-sum reduction strategy
        # (VGQA_FLAT_CLIP=1 is the legacy spelling of "flat"):
        #   optax  — per-leaf scalar reductions (444 fusions, ~33 ms/step
        #            at 64f@420, r4 profile)
        #   flat   — ONE concatenated vector. MEASURED SLOWER: 343 vs
        #            272-274 ms/step (2026-08-19) — the 444-leaf 0.7 GB
        #            concatenate costs more than the reductions it
        #            removes. Kept for A/B only.
        #   bucket — hybrid: small leaves concat into one vector, big
        #            leaves keep per-leaf reductions (the copies were the
        #            big leaves' fault, the reduction count the small
        #            leaves') — bench_train --ab-bucket-clip.
        import os as _os

        impl = _os.environ.get("VGQA_CLIP_IMPL", "")
        if not impl:
            impl = "flat" if _os.environ.get("VGQA_FLAT_CLIP") == "1" \
                else "optax"
        clip = {
            "flat": clip_by_global_norm_flat,
            "bucket": clip_by_global_norm_bucketed,
            "optax": optax.clip_by_global_norm,
        }[impl](s.MAX_GRAD_NORM)
        tx = optax.chain(optax.masked(clip, trainable), tx)
    return tx, labels


def update_ema(params, ema_params, decay: float):
    """EMA of trainable weights (parity with update_ema,
    /root/reference/vgqa/training/optimizer.py:6-15)."""
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params,
        params,
    )
