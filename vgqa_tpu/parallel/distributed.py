"""Multi-host process helpers.

Replaces /root/reference/vgqa/utils/distributed.py:8-116 (NCCL process-group
rank/world helpers, barrier, pickle all_gather, loss reduce). Under JAX's
single-program model most of that disappears:

* in-step reductions are XLA collectives inserted by sharding — no explicit
  ``reduce_loss_dict`` (the metrics a host sees are already global),
* host-side object merge uses ``process_allgather``,
* barriers exist only around host-side filesystem races.
"""

from __future__ import annotations

import os
from typing import Any, List

import jax


def initialize_multihost() -> None:
    """Initialize JAX's distributed runtime when launched on a multi-host
    pod (env-driven, like the reference's env:// init at tools/train.py:382).

    MUST be called before any backend touch (``jax.devices()``,
    ``jax.process_count()``, any computation) — probing the backend first
    would finalize a single-process runtime. Safe to call on single-host
    (no env vars -> no-op; TPU pods auto-detect with a bare
    ``jax.distributed.initialize()``).

    Env contract (mirrors ``torchrun``'s env:// rendezvous):
      VGQA_COORDINATOR  host:port of process 0
      VGQA_NUM_PROCESSES / VGQA_PROCESS_ID
      VGQA_SHUTDOWN_TIMEOUT  seconds each rank waits at the exit-time
        shutdown barrier (default jax's 300). Raise it when ranks can
        skew by minutes — e.g. core-starved CI hosts where per-rank
        compile/exec serializes (a lagging rank otherwise trips the
        barrier and the coordination service kills the whole job).
    CPU meshes additionally need gloo collectives, selected here."""
    coord = os.environ.get("VGQA_COORDINATOR")
    if not coord:
        # No explicit rendezvous. Two cases still need the distributed
        # runtime, both auto-detected by a bare jax.distributed.initialize():
        # JAX's own env contract (JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/
        # JAX_PROCESS_ID), and multi-host Cloud TPU slices (worker list in
        # TPU_WORKER_HOSTNAMES — only multi-entry lists matter; a
        # single-host slice runs fine as one process).
        tpu_hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        if os.environ.get("JAX_COORDINATOR_ADDRESS") or "," in tpu_hosts:
            jax.distributed.initialize()
            _warm_all_device_communicator()
        return
    nproc = int(os.environ["VGQA_NUM_PROCESSES"])
    pid = int(os.environ["VGQA_PROCESS_ID"])
    if jax.config.jax_platforms == "cpu" or \
            os.environ.get("VGQA_PLATFORM") == "cpu":
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coord, num_processes=nproc, process_id=pid,
        shutdown_timeout_seconds=int(
            os.environ.get("VGQA_SHUTDOWN_TIMEOUT", "300")),
    )
    _warm_all_device_communicator()


def _warm_all_device_communicator() -> None:
    """Establish the ALL-devices collective context immediately after the
    rendezvous, while every process is synchronized to within milliseconds.

    Context initialization inside the first collective has a hard 30 s
    peer-exchange timeout (gloo GetKeyValue), and the first natural
    all-device collective is the sharded train step — which ranks can
    reach minutes apart (compile-time skew). Contexts are cached per
    device SET on the backend client, so this must psum across the exact
    global device set (``sync_global_devices`` only warms a per-process
    communicator, which does not cover the step's)."""
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if jax.process_count() <= 1:
        return
    mesh = Mesh(np.array(jax.devices()), ("all",))
    sh = NamedSharding(mesh, P("all"))
    local = np.ones(len(jax.local_devices()), np.float32)
    garr = jax.make_array_from_process_local_data(sh, local)
    total = jax.jit(lambda x: x.sum(),
                    out_shardings=NamedSharding(mesh, P()))(garr)
    np.asarray(total)  # block until the all-reduce ran


def warmup_mesh_communicators(mesh) -> None:
    """Pre-form every CROSS-PROCESS collective group of ``mesh``, one
    executable at a time.

    Root cause this works around (diagnosed r3, re-verified r4): XLA-CPU
    gloo deadlocks when two 2-member cross-process communicators
    initialize interleaved inside one executable — on a (dp=2, sp=2) mesh
    over 2 processes the dp axis has two cross-process pairs (e.g.
    {0, 2048} and {1, 2049}); their concurrent gloo context handshakes
    block each other at GetKeyValue until the 30 s timeout. Contexts are
    cached per device SET (see _warm_all_device_communicator), so forming
    each group in its OWN tiny psum — fetched to completion before the
    next starts — leaves the real program's collectives with warm
    contexts and nothing to race.

    Called after mesh construction on multi-process CPU runtimes
    (tools/train.py); harmless but unnecessary on TPU pods (ICI
    collectives, no gloo) where it is skipped unless
    VGQA_WARMUP_COLLECTIVES=1. Process-local groups never deadlock and
    are skipped."""
    if jax.process_count() <= 1:
        return
    if jax.default_backend() != "cpu" and os.environ.get(
            "VGQA_WARMUP_COLLECTIVES") != "1":
        return
    import itertools

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.asarray(mesh.devices)
    me = jax.process_index()
    seen = set()
    groups = []
    for axis in range(devs.ndim):
        if devs.shape[axis] <= 1:
            continue
        other = [range(s) for i, s in enumerate(devs.shape) if i != axis]
        for coords in itertools.product(*other):
            idx = list(coords)
            idx.insert(axis, slice(None))
            group = list(devs[tuple(idx)].ravel())
            pids = {d.process_index for d in group}
            if len(pids) <= 1:
                continue                      # process-local: no race
            key = tuple(sorted(d.id for d in group))
            if key in seen:
                continue
            seen.add(key)
            groups.append((group, pids))

    # deterministic global order: every member process visits shared
    # groups in the same relative order, so no cross-group wait inversion
    for group, pids in groups:
        if me not in pids:
            continue
        sub = Mesh(np.asarray(group), ("g",))
        sh = NamedSharding(sub, P("g"))
        n_local = sum(1 for d in group if d.process_index == me)
        garr = jax.make_array_from_process_local_data(
            sh, np.ones(n_local, np.float32))
        total = jax.jit(lambda x: x.sum(),
                        out_shardings=NamedSharding(sub, P()))(garr)
        np.asarray(total)   # complete THIS group before forming the next


def put_global_batch(tree: Any, sharding) -> Any:
    """Assemble a globally-sharded batch from each process's local slice.

    Single-process: a plain ``device_put`` (every shard is addressable).
    Multi-process: each process holds only its ``IterationBasedLoader``
    slice, so leaves are stitched into global ``jax.Array``s with
    ``make_array_from_process_local_data`` — the replacement for the
    reference's per-rank ``.cuda()`` upload (tools/train.py:201-216),
    which only ever sees rank-local tensors.

    ``sharding`` is a single Sharding applied to every leaf, or a pytree of
    Shardings matching ``tree`` (the sequence-parallel path, where the frame
    axis shards on ``sp`` for [V, T, ...] fields only)."""
    import numpy as np

    if jax.process_count() <= 1:
        return jax.device_put(tree, sharding)
    if isinstance(sharding, jax.sharding.Sharding):
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            tree,
        )
    return jax.tree.map(
        lambda s, x: jax.make_array_from_process_local_data(s, np.asarray(x)),
        sharding,
        tree,
    )


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def synchronize(tag: str = "barrier") -> None:
    """Cross-host barrier (used around dataset-cache writes, replacing
    dist.barrier at vgqa/utils/distributed.py:36-42)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def _json_default(o):
    """Encode numpy scalars/arrays and other iterables; everything else is
    the caller's responsibility (see all_gather_objects contract)."""
    import numpy as np

    if isinstance(o, np.generic):
        return o.item()
    if isinstance(o, np.ndarray):
        return o.tolist()
    return list(o)


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather a JSON-representable object from every process.

    Replaces the reference's padded pickle-tensor all_gather
    (vgqa/utils/distributed.py:45-80) with a size-negotiated exchange: each
    process broadcasts its payload length first, so arbitrarily large and
    per-process-different payloads gather correctly.

    Contract (JSON round-trip, NOT pickle): dict keys become strings,
    tuples/sets/np arrays become lists, np scalars become Python numbers.
    Callers must re-key/re-type on receipt (see
    VidSTGEvaluator._merge_gathered). Objects that are not JSON-encodable
    (after the numpy conversions above) raise TypeError at the sender."""
    if jax.process_count() <= 1:
        return [obj]
    import json

    import numpy as np
    from jax.experimental import multihost_utils

    payload = json.dumps(obj, default=_json_default).encode()
    size = np.array([len(payload)], np.int64)
    max_size = int(multihost_utils.process_allgather(size).max())
    buf = np.zeros(max_size, np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, np.uint8)
    gathered = multihost_utils.process_allgather(buf)
    out = []
    sizes = multihost_utils.process_allgather(size)
    for row, n in zip(np.asarray(gathered), np.asarray(sizes).ravel()):
        out.append(json.loads(bytes(row[: int(n)]).decode()))
    return out
