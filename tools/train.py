"""Training entrypoint for spatio-temporal video grounding.

TPU-native counterpart of /root/reference/tools/train.py:37-427. One Python
process drives all local devices through a single jitted train step over a
(dp, tp) mesh — there is no per-GPU process launch (torchrun env:// at
train.py:377-384); multi-host pods call ``jax.distributed.initialize``.
"""

import argparse
import datetime
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vgqa_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np

from vgqa_tpu.config import cfg
from vgqa_tpu.data.loader import make_data_loader
from vgqa_tpu.data.metrics import build_evaluator
from vgqa_tpu.models import build_model, build_weight_dict
from vgqa_tpu.parallel import (
    batch_sharding,
    build_mesh,
    initialize_multihost,
    put_global_batch,
    sp_batch_shardings,
)
from vgqa_tpu.training import (
    CheckpointManager,
    create_train_state,
    make_optimizer,
    make_train_step,
)
from vgqa_tpu.training.evaluator import do_eval
from vgqa_tpu.utils.log_setup import setup_logger
from vgqa_tpu.utils.metrics_logger import MetricLogger


class Trainer:
    def __init__(self, cfg, logger, seed: int = 2021):
        self.cfg = cfg
        self.logger = logger
        self.seed = seed

    def setup(self):
        c = self.cfg
        self.mesh = build_mesh(dp=c.TPU.MESH_DP, tp=c.TPU.MESH_TP,
                               sp=c.TPU.MESH_SP)
        dp = self.mesh.shape["dp"]
        self.logger.info(
            f"Mesh: dp={dp}, sp={self.mesh.shape['sp']}, "
            f"tp={self.mesh.shape['tp']}"
        )
        if jax.process_count() > 1:
            # the loader shards by video (dp); one video's sp x tp block
            # must stay process-local or make_array_from_process_local_data
            # cannot assemble it from per-process slices
            block = self.mesh.shape["sp"] * self.mesh.shape["tp"]
            assert jax.local_device_count() % block == 0, (
                f"sp*tp={block} must divide the {jax.local_device_count()} "
                "process-local devices: the sp/tp shards of one video live "
                "on one host; scale across hosts with dp"
            )
            # serialize gloo communicator formation on CPU multi-process
            # runtimes (interleaved 2-member group inits deadlock — see
            # warmup_mesh_communicators)
            from vgqa_tpu.parallel.distributed import (
                warmup_mesh_communicators,
            )

            warmup_mesh_communicators(self.mesh)

        self.model, self.loss_fn, self.weight_dict = build_model(c)

        self.train_loader = make_data_loader(c, "train", global_batch=dp)
        self.max_iter = len(self.train_loader)

        # init params from one example batch (init only needs shapes; a
        # uint8-feed batch is cast to f32 — normalization lives in step_fn)
        example = next(iter(make_data_loader(c, "train", global_batch=dp)))
        ex_video = example["video"]
        if ex_video.frames.dtype == jnp.uint8:
            from vgqa_tpu.utils.containers import VideoBatch

            ex_video = VideoBatch(
                ex_video.frames.astype(jnp.float32) / 255.0,
                ex_video.pixel_mask, ex_video.time_mask,
            )
        with self.mesh:
            params = jax.jit(
                lambda rng: self.model.init(
                    rng, ex_video, example["text"], train=False
                )
            )(jax.random.PRNGKey(self.seed))
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        self.logger.info(f"Model parameters: {n_params / 1e6:.1f}M")

        tx, _ = make_optimizer(c, params, self.max_iter)
        self.tx = tx
        state = create_train_state(params, tx, use_ema=c.MODEL.EMA)

        self.ckpt = CheckpointManager(c.OUTPUT_DIR or "output", logger=self.logger)
        restored = self.ckpt.load(state)
        if restored is not None:
            state = restored
            self.logger.info(f"Resumed at iteration {int(state.step)}")
        elif c.MODEL.WEIGHT and os.path.exists(c.MODEL.WEIGHT):
            # warm start from converted pretrained weights (parity with the
            # reference's MODEL.WEIGHT load, checkpoint_manager.py:79-93)
            loader_mgr = CheckpointManager(
                os.path.dirname(c.MODEL.WEIGHT) or ".", save_to_disk=False
            )
            warm = loader_mgr.load({"params": params["params"]}, c.MODEL.WEIGHT)
            if warm is not None:
                state = state.replace(
                    params={"params": warm["params"]},
                    ema_params=(
                        jax.tree.map(jnp.copy, {"params": warm["params"]})
                        if c.MODEL.EMA else None
                    ),
                )
                self.logger.info(f"Warm started from {c.MODEL.WEIGHT}")
        if jax.process_count() > 1:
            # every process computed identical host-local state (same seed,
            # same restore); lift it to globally-replicated jax.Arrays so
            # the sharded step can consume it together with the
            # put_global_batch inputs (multi-controller jit rejects arrays
            # committed to process-local devices)
            from vgqa_tpu.parallel.mesh import replicated

            rep = replicated(self.mesh)
            state = jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(
                    rep, np.asarray(x)
                ),
                state,
            )
        self.state = state

        ema_decay = c.MODEL.EMA_DECAY if c.MODEL.EMA else None
        step_fn = make_train_step(
            self.model, self.loss_fn, self.weight_dict, tx, ema_decay,
            remat=c.TPU.REMAT,
            compute_dtype=(jnp.bfloat16
                           if c.TPU.TRAIN_DTYPE == "bfloat16" else None),
            pixel_stats=(c.INPUT.PIXEL_MEAN, c.INPUT.PIXEL_STD),
        )
        donate = (0,) if c.TPU.DONATE else ()
        self.step_fn = jax.jit(step_fn, donate_argnums=donate)
        self.batch_shard = batch_sharding(self.mesh)
        self._sp_shards = None

    def fit(self):
        c = self.cfg
        meter = MetricLogger()
        from vgqa_tpu.utils.tensorboard import SummaryWriter

        writer = SummaryWriter(c.TENSORBOARD_DIR)
        rng = jax.random.key(self.seed, impl=c.TPU.TRAIN_PRNG)
        start_iter = int(self.state.step)
        loader = make_data_loader(c, "train", start_iter=start_iter,
                                  global_batch=self.mesh.shape["dp"])
        start_time = last = time.time()
        step = start_iter
        profiling = False
        for batch in loader:
            data_time = time.time() - last
            step = batch["iteration"] + 1
            if c.TPU.PROFILE_DIR:
                # capture a device trace over steps 10-14
                if step == 10 and not profiling:
                    jax.profiler.start_trace(c.TPU.PROFILE_DIR)
                    profiling = True
                elif step == 15 and profiling:
                    jax.profiler.stop_trace()
                    profiling = False
                    self.logger.info(f"Wrote profile to {c.TPU.PROFILE_DIR}")
            if self.mesh.shape["sp"] > 1:
                # sequence parallel: the clip's frame axis shards over sp
                # (batch shapes are static, so the sharding trees are built
                # once from the first batch)
                if self._sp_shards is None:
                    self._sp_shards = sp_batch_shardings(
                        self.mesh, batch["video"], batch["text"],
                        batch["targets"],
                    )
                v_sh, t_sh, tg_sh = self._sp_shards
            else:
                v_sh = t_sh = tg_sh = self.batch_shard
            video = put_global_batch(batch["video"], v_sh)
            text = put_global_batch(batch["text"], t_sh)
            targets = put_global_batch(batch["targets"], tg_sh)
            with self.mesh:
                self.state, metrics = self.step_fn(
                    self.state, video, text, targets, rng
                )
            batch_time = time.time() - last
            last = time.time()
            meter.update(time=batch_time, data=data_time)

            if step % 50 == 0 or step == self.max_iter:
                # fetch device metrics only on the logging cadence: a
                # per-step float() is a device->host sync that serializes
                # dispatch on remote links
                host_metrics = jax.device_get(metrics)
                # track the non-aux loss terms like the reference's verbose
                # set (tools/train.py:98-106)
                verbose = {
                    k: float(v) for k, v in host_metrics.items()
                    if k in self.weight_dict and not k[-1].isdigit()
                }
                meter.update(loss=float(host_metrics["loss"]), **verbose)
                eta = meter.time.global_avg * (self.max_iter - step)
                self.logger.info(
                    f"eta: {datetime.timedelta(seconds=int(eta))}  "
                    f"iter: {step} / {self.max_iter}  {meter}"
                )
                for k, v in host_metrics.items():
                    writer.add_scalar(k, float(v), step)
            if step % c.SOLVER.CHECKPOINT_PERIOD == 0:
                self.ckpt.save(f"model_{step:06d}", self.state)
                # params-only eval twin must NOT retake the resume tag
                self.ckpt.save(f"model_{step:06d}_params", self.eval_params(),
                               tag=False)
            if c.SOLVER.TO_VAL and step % c.SOLVER.VAL_PERIOD == 0:
                self.validate()
        self.ckpt.save("model_final", self.state)
        # params-only twin for inference/evaluation loaders (EMA weights)
        self.ckpt.save("model_final_params", self.eval_params(), tag=False)
        total = time.time() - start_time
        self.logger.info(
            f"Total training time: {datetime.timedelta(seconds=int(total))} "
            f"({total / max(1, self.max_iter - start_iter):.4f} s / it)"
        )

    def eval_params(self):
        # evaluate the EMA weights when enabled (train.py:307)
        return self.state.ema_params or self.state.params

    def validate(self):
        c = self.cfg
        evaluator = build_evaluator(c, self.logger, mode="test")
        # batch eval clips across the dp axis so no device idles during
        # VAL_PERIOD validation (the reference evaluates on every DDP rank,
        # /root/reference/vgqa/training/evaluator.py:96-151). Multi-host:
        # the loader hands each process its slice, which it evaluates on
        # its OWN devices (per-rank eval like the reference); the metric
        # merge happens in evaluator.synchronize_between_processes.
        dp = self.mesh.shape["dp"]
        loader = make_data_loader(c, "test", global_batch=dp)
        params = self.eval_params()
        if jax.process_count() == 1:
            shard = self.batch_shard
        else:
            # per-rank eval: each process drives its OWN devices, so the
            # dp-replicated global params are re-hosted as local arrays
            # (requires tp to fit on one host, like the reference's DDP)
            local = build_mesh(dp=dp // jax.process_count(), tp=1,
                               devices=jax.local_devices())
            shard = batch_sharding(local)
            # re-host the dp-replicated global params as local arrays, then
            # device_put ONCE replicated over the local mesh — leaving them
            # as numpy would re-upload the whole tree on every jitted
            # forward call in the eval loop
            from jax.sharding import NamedSharding, PartitionSpec

            replicated = NamedSharding(local, PartitionSpec())
            params = jax.tree.map(
                lambda x: jax.device_put(
                    np.asarray(x.addressable_data(0)), replicated
                ),
                params,
            )
        return do_eval(c, "test", self.logger, self.model, params,
                       loader, evaluator, sharding=shard)

    def test(self):
        return self.validate()


def main():
    parser = argparse.ArgumentParser(description="Spatio-Temporal Grounding Training")
    parser.add_argument("--config-file", default="", metavar="FILE", type=str)
    parser.add_argument("--seed", type=int, default=2021)
    parser.add_argument("--skip-test", action="store_true")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    initialize_multihost()  # before any backend touch

    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts or [])
    cfg.freeze()

    if cfg.OUTPUT_DIR:
        os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    logger = setup_logger("Video Grounding", cfg.OUTPUT_DIR, jax.process_index())
    logger.info(f"Devices: {len(jax.devices())} x {jax.devices()[0].device_kind}")
    if cfg.OUTPUT_DIR:
        with open(os.path.join(cfg.OUTPUT_DIR, "config.yml"), "w") as f:
            f.write(cfg.dump())

    trainer = Trainer(cfg, logger, seed=args.seed)
    trainer.setup()
    trainer.fit()
    if not args.skip_test:
        trainer.test()


if __name__ == "__main__":
    main()
