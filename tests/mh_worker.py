"""Multi-host worker: one rank of the 2-process localhost CPU test.

Launched by tests/test_multihost.py with the VGQA_COORDINATOR /
VGQA_NUM_PROCESSES / VGQA_PROCESS_ID rendezvous env (the same contract
``tools/train.py`` uses on a real pod). Exercises, with a REAL
``jax.distributed`` runtime (no fakes):

* process-sharded data loading (each rank materializes only its slice),
* ``put_global_batch`` global-array assembly from process-local numpy,
* a dp=4 sharded train step across 2 processes x 2 local CPU devices,
* per-rank validation + the size-negotiated ``all_gather_objects``
  evaluator merge (replacing the monkeypatched simulation in
  tests/test_evaluator_merge.py).

Writes a JSON result blob to $VGQA_MH_OUT for the parent to assert.
"""

import json
import os
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import jax

jax.config.update("jax_platforms", "cpu")

from vgqa_tpu.parallel import initialize_multihost

initialize_multihost()


def main():
    out_path = os.environ["VGQA_MH_OUT"]
    data_dir = os.environ["VGQA_MH_DATA"]
    work_dir = os.environ["VGQA_MH_WORK"]
    rank = jax.process_index()
    result = {"rank": rank, "process_count": jax.process_count(),
              "local_devices": len(jax.local_devices()),
              "global_devices": len(jax.devices())}

    from train import Trainer  # tools/train.py

    from vgqa_tpu.config import build_default_cfg
    from vgqa_tpu.parallel.distributed import all_gather_objects
    from vgqa_tpu.utils.log_setup import setup_logger

    cfg = build_default_cfg()
    cfg.merge_from_file(os.path.join(REPO, "configs/grounding_vidstg_tiny.yaml"))
    cfg.DATA_DIR = data_dir
    cfg.OUTPUT_DIR = os.path.join(work_dir, "out")
    cfg.DATA_TRUNK = 4
    cfg.SOLVER.MAX_EPOCH = 2
    cfg.SOLVER.TO_VAL = False
    cfg.SOLVER.CHECKPOINT_PERIOD = 100
    # VGQA_MH_SP=2 exercises sequence parallelism under the real
    # multi-process runtime: mesh (dp=2, sp=2) over 2 processes x 2 local
    # devices — each video's sp pair stays process-local (the guard in
    # tools/train.py), frames shard on the clip's frame axis
    sp = int(os.environ.get("VGQA_MH_SP", "1"))
    cfg.TPU.MESH_SP = sp
    cfg.TPU.MESH_DP = 4 // sp      # 2 processes x 2 local devices
    cfg.MODEL.EMA = False

    logger = setup_logger(f"mh-rank{rank}", "", rank)
    trainer = Trainer(cfg, logger, seed=0)
    trainer.setup()
    result["mesh"] = {"dp": int(trainer.mesh.shape["dp"]),
                      "sp": int(trainer.mesh.shape["sp"])}
    result["max_iter"] = trainer.max_iter
    # each rank's loader must slice the global batch, not enumerate it
    result["local_batch"] = trainer.train_loader.local_batch
    trainer.fit()
    result["final_step"] = int(trainer.state.step)
    import numpy as np

    leaf0 = jax.tree.leaves(trainer.state.params)[0]
    result["params_finite"] = bool(
        np.isfinite(np.asarray(leaf0.addressable_data(0))).all()
    )

    # real (unfaked) size-negotiated object gather with per-rank sizes
    blob = {"rank": rank, "payload": "x" * (1000 if rank == 0 else 50000)}
    gathered = all_gather_objects(blob)
    result["gather_ranks"] = [g["rank"] for g in gathered]
    result["gather_sizes"] = [len(g["payload"]) for g in gathered]

    # per-rank eval + real evaluator merge across processes
    metrics = trainer.validate()
    result["eval_keys"] = sorted(k for k in metrics if k.endswith("iou"))
    result["eval_finite"] = all(
        bool(np.isfinite(v)) for v in metrics.values()
    )

    with open(out_path, "w") as f:
        json.dump(result, f)
    print(f"rank {rank} OK", flush=True)


if __name__ == "__main__":
    main()
