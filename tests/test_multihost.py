"""Real 2-process multi-host test over localhost ``jax.distributed`` (CPU).

The reference runs one process per GPU with NCCL DDP
(/root/reference/tools/train.py:377-384); here two localhost processes,
each owning 2 virtual CPU devices, form a dp=4 mesh and run the REAL
trainer: process-sharded loader slices, ``put_global_batch`` global-array
assembly, sharded train steps, checkpointing, per-rank validation, and the
size-negotiated evaluator merge — no monkeypatched collectives anywhere.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = str(Path(__file__).resolve().parent.parent)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize(
    "sp",
    [
        1,
        # sp=2 deadlocked through r3: XLA-CPU gloo hangs when the dp
        # axis's two cross-process 2-member communicators init interleaved
        # (pair {0,2048} times out at GetKeyValue; reproduced cache-warm).
        # Fixed r4 by warmup_mesh_communicators (parallel/distributed.py):
        # each cross-process group is pre-formed in its own serialized
        # tiny psum right after mesh construction, so the train step finds
        # every gloo context already cached.
        2,
    ],
    ids=["dp4", "dp2sp2"],
)
def test_two_process_train_and_eval(tmp_path, sp):
    """sp=2 additionally proves sequence parallelism under the REAL
    multi-process runtime: mesh (dp=2, sp=2), each video's frame axis
    split across a process-local sp pair (unskipped since r4 —
    warmup_mesh_communicators serializes gloo communicator formation,
    parallel/distributed.py)."""
    from vgqa_tpu.data.synthetic import make_synthetic_dataset

    data_dir = str(tmp_path / "data")
    make_synthetic_dataset(data_dir, num_videos=4, frames_per_video=24)

    port = _free_port()
    procs = []
    outs = []
    for rank in range(2):
        out = str(tmp_path / f"rank{rank}.json")
        outs.append(out)
        env = dict(os.environ)
        env.update(
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            VGQA_PLATFORM="cpu",
            VGQA_COORDINATOR=f"localhost:{port}",
            VGQA_NUM_PROCESSES="2",
            VGQA_PROCESS_ID=str(rank),
            VGQA_MH_SP=str(sp),
            VGQA_MH_OUT=out,
            VGQA_MH_DATA=data_dir,
            VGQA_MH_WORK=str(tmp_path / f"work{rank}"),
            # on a core-starved host the two ranks' compiles serialize and
            # can skew by minutes; the default 300 s shutdown barrier then
            # kills the job from the FASTER rank (observed under a full
            # contended suite run, 2026-08-18)
            VGQA_SHUTDOWN_TIMEOUT="850",
        )
        # both ranks share the checkpoint dir like a pod's shared fs
        env["VGQA_MH_WORK"] = str(tmp_path / "work")
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.join(REPO, "tests", "mh_worker.py")],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )

    logs = []
    for p in procs:
        try:
            # keep well above VGQA_SHUTDOWN_TIMEOUT=850 so the in-process
            # barrier (which produces a diagnosable error) governs, not
            # this harness kill (advisor r3)
            log, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(log)

    if any(p.returncode != 0 for p in procs):
        blob = "\n".join(
            f"===== rank {r} (exit {p.returncode}) =====\n{log[-6000:]}"
            for r, (p, log) in enumerate(zip(procs, logs))
        )
        raise AssertionError(f"multi-host worker failed:\n{blob}")

    dp = 4 // sp
    iters = 2 * (4 // dp)          # 2 epochs over 4 items
    results = [json.load(open(o)) for o in outs]
    for rank, r in enumerate(results):
        assert r["process_count"] == 2
        assert r["local_devices"] == 2 and r["global_devices"] == 4
        assert r["mesh"] == {"dp": dp, "sp": sp}
        assert r["max_iter"] == iters and r["final_step"] == iters
        # the loader handed this rank only its slice of the global batch
        assert r["local_batch"] == dp // 2
        assert r["params_finite"]
        # unfaked all_gather: both ranks see both payloads, size-negotiated
        assert r["gather_ranks"] == [0, 1]
        assert r["gather_sizes"] == [1000, 50000]
        # evaluator merged across processes: every rank reports the full
        # metric set over all 4 items
        assert r["eval_finite"]
        assert any(k.endswith("viou") for k in r["eval_keys"])
