"""Device mesh + sharding rules.

The reference's only parallelism is NCCL data-parallel DDP with one process
per GPU (/root/reference/tools/train.py:73-80,377-384). TPU-natively the
whole cluster runs ONE jitted program over a ``jax.sharding.Mesh`` with two
axes:

* ``dp`` — data parallel: the leading video axis of every batch shards here;
  gradient all-reduce is inserted by XLA over ICI (replacing DDP hooks).
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


def build_mesh(dp: int = 0, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp <= 0:
        dp = n // tp
    assert dp * tp <= n, f"mesh {dp}x{tp} needs more than {n} devices"
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


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


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
