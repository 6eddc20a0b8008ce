"""Coverage for the auxiliary runtime utilities."""

import logging
import os

import numpy as np


def test_metric_logger_meters():
    from vgqa_tpu.utils.metrics_logger import MetricLogger, SmoothedValue

    sv = SmoothedValue(window_size=3)
    for v in (1.0, 2.0, 3.0, 4.0):
        sv.update(v)
    assert sv.avg == 3.0          # window of last 3
    assert sv.global_avg == 2.5   # all 4
    assert sv.median == 3.0

    m = MetricLogger()
    m.update(loss=1.0, acc=0.5)
    m.update(loss=3.0)
    assert m.loss.global_avg == 2.0
    assert "loss" in str(m) and "acc" in str(m)


def test_setup_logger_rank_silencing(tmp_path):
    from vgqa_tpu.utils.log_setup import setup_logger

    lg = setup_logger("t-rank0", str(tmp_path), rank=0)
    lg.info("hello-world")
    for h in lg.handlers:
        h.flush()
    assert "hello-world" in (tmp_path / "log.txt").read_text()

    lg1 = setup_logger("t-rank1", str(tmp_path), rank=1)
    assert all(isinstance(h, logging.NullHandler) for h in lg1.handlers)


def test_tensorboard_writer_writes_events(tmp_path):
    from vgqa_tpu.utils.tensorboard import SummaryWriter

    w = SummaryWriter(str(tmp_path))
    w.add_scalar("loss", 1.5, 1)
    w.close()
    files = os.listdir(tmp_path)
    # tf available in this env -> an events file must exist
    assert any("tfevents" in f for f in files) or not files


def test_distributed_single_process_paths():
    from vgqa_tpu.parallel import distributed as D

    assert D.get_world_size() == 1
    assert D.get_rank() == 0
    assert D.is_main_process()
    D.synchronize()  # no-op single process
    assert D.all_gather_objects({"a": 1}) == [{"a": 1}]


def test_dtype_cast_floating():
    import jax.numpy as jnp

    from vgqa_tpu.utils.dtype import cast_floating, resolve_dtype

    tree = {"w": jnp.ones((2,), jnp.float32), "i": jnp.ones((2,), jnp.int32)}
    out = cast_floating(tree, resolve_dtype("bfloat16"))
    assert out["w"].dtype == jnp.bfloat16
    assert out["i"].dtype == jnp.int32


def test_step_timer_and_trace(tmp_path):
    import jax.numpy as jnp

    from vgqa_tpu.utils.profiling import StepTimer, device_trace

    t = StepTimer()
    dt = t.lap(jnp.ones(()))
    assert dt >= 0
    with device_trace(""):  # no-op path
        pass


def test_boxlist_exported():
    from vgqa_tpu.utils.boxlist import BoxList

    assert len(BoxList([[0, 0, 1, 1]], (2, 2))) == 1
