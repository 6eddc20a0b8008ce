import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vgqa_tpu.config import build_default_cfg
from vgqa_tpu.models import GroundingConfig, VSTGNet, VideoSTGLoss, build_weight_dict
from vgqa_tpu.training import (
    create_train_state,
    label_params,
    make_optimizer,
    make_schedule,
    make_train_step,
    update_ema,
)
from vgqa_tpu.utils.containers import TextBatch, VideoBatch

V, T, H, W, L = 1, 4, 64, 64, 8


def _cfg():
    cfg = build_default_cfg()
    cfg.SOLVER.MAX_EPOCH = 2
    cfg.SOLVER.SCHEDULE.DROP_STEP = [1]
    return cfg


def _batch(v=V):
    rng = np.random.RandomState(0)
    video = VideoBatch(
        frames=jnp.asarray(rng.randn(v, T, H, W, 3).astype(np.float32) * 0.1),
        pixel_mask=jnp.ones((v, H, W), bool),
        time_mask=jnp.ones((v, T), bool),
    )
    text = TextBatch(
        token_ids=jnp.asarray(rng.randint(4, 100, (v, L)).astype(np.int32)),
        mask=jnp.ones((v, L), bool),
    )
    act = np.zeros((v, T), np.float32)
    act[:, 1:3] = 1
    boxes = np.zeros((v, T, 4), np.float32)
    boxes[:, :, :] = [0.5, 0.5, 0.2, 0.3]
    targets = {
        "boxes": jnp.asarray(boxes),
        "actioness": jnp.asarray(act),
        "time_mask": jnp.ones((v, T), bool),
        "sted": jnp.asarray(np.tile([[1, 2]], (v, 1)).astype(np.int32)),
        "attr_labels": jnp.zeros((v, 5)),
        "verb_labels": jnp.zeros((v, 7)),
    }
    return video, text, targets


@pytest.fixture(scope="module")
def model_and_params():
    model = VSTGNet(GroundingConfig.tiny_test())
    video, text, _ = _batch()
    params = model.init(jax.random.PRNGKey(0), video, text, train=False)
    return model, params


def test_param_labels(model_and_params):
    _, params = model_and_params
    labels = label_params(params, freeze_swin=True, freeze_text=False)
    flat = {
        "/".join(getattr(k, "key", str(k)) for k in path): lab
        for path, lab in jax.tree_util.tree_flatten_with_path(labels)[0]
    }
    assert any(v == "frozen" and "vid/" in k for k, v in flat.items())
    assert any(v == "vis" and "vis_encoder/layer3" in k for k, v in flat.items())
    # stem, layer1 and frozen-BN affines never train
    assert all(
        v == "frozen"
        for k, v in flat.items()
        if "vis_encoder/conv1" in k or "vis_encoder/layer1_" in k
    )
    assert all(v == "frozen" for k, v in flat.items() if "/bn1/" in k)
    assert any(v == "text" and "text_encoder" in k for k, v in flat.items())
    assert any(v == "temp" and "time_decoder" in k for k, v in flat.items())
    assert any(v == "clas" and "s_spatial_clas" in k for k, v in flat.items())
    assert any(v == "rest" and "ground_encoder" in k for k, v in flat.items())


def test_schedule_warmup_and_drops():
    cfg = _cfg()
    max_iter = 100  # 2 epochs x 50; warmup = 1 iter
    sched = make_schedule(cfg, max_iter, "rest")
    base = cfg.SOLVER.BASE_LR
    # first update runs at the full base LR (1-based counter, warmup=1 it)
    np.testing.assert_allclose(float(sched(0)), base, rtol=1e-6)
    np.testing.assert_allclose(float(sched(10)), base, rtol=1e-6)
    # epoch 1 >= DROP_STEP[0]=1 -> 0.1x
    np.testing.assert_allclose(float(sched(60)), base * 0.1, rtol=1e-6)
    # longer warmup ramps linearly
    cfg2 = _cfg()
    cfg2.SOLVER.WARMUP_PROP = 0.1  # 10 warmup iters
    sched2 = make_schedule(cfg2, max_iter, "rest")
    np.testing.assert_allclose(float(sched2(0)), base * 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(sched2(4)), base * 0.5, rtol=1e-6)


def test_train_step_updates_and_freezes(model_and_params):
    model, params = model_and_params
    cfg = _cfg()
    tx, labels = make_optimizer(cfg, params, max_iter=10)
    loss_fn = VideoSTGLoss(use_aux_loss=True)
    weight_dict = build_weight_dict(cfg)
    step_fn = jax.jit(make_train_step(model, loss_fn, weight_dict, tx, 0.9))
    state = create_train_state(params, tx, use_ema=True)
    video, text, targets = _batch()
    rng = jax.random.PRNGKey(0)

    state1, metrics = step_fn(state, video, text, targets, rng)
    assert int(state1.step) == 1
    assert np.isfinite(float(metrics["loss"]))

    # frozen leaves identical, trainable leaves moved
    p0 = params["params"]
    p1 = state1.params["params"]
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(p0["vid"])[0]),
        np.asarray(jax.tree.leaves(p1["vid"])[0]),
    )
    enc0 = np.concatenate([np.ravel(x) for x in jax.tree.leaves(p0["ground_encoder"])])
    enc1 = np.concatenate([np.ravel(x) for x in jax.tree.leaves(p1["ground_encoder"])])
    assert np.abs(enc0 - enc1).max() > 0

    # EMA moved toward new params but not equal to them
    ema1 = state1.ema_params["params"]["ground_encoder"]
    e1 = np.concatenate([np.ravel(x) for x in jax.tree.leaves(ema1)])
    assert np.abs(e1 - enc0).max() > 0 and np.abs(e1 - enc1).max() > 0

    # second step continues
    state2, metrics2 = step_fn(state1, video, text, targets, rng)
    assert int(state2.step) == 2


def test_train_step_sharded_dp(model_and_params):
    """The same jitted step over an 8-way dp mesh (one video per device)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vgqa_tpu.parallel import batch_sharding, build_mesh

    model, params = model_and_params
    cfg = _cfg()
    tx, _ = make_optimizer(cfg, params, max_iter=10)
    loss_fn = VideoSTGLoss(use_aux_loss=False)
    weight_dict = build_weight_dict(cfg)
    step_fn = make_train_step(model, loss_fn, weight_dict, tx, None)

    mesh = build_mesh(dp=8, tp=1)
    state = create_train_state(params, tx, use_ema=False)
    video, text, targets = _batch(v=8)
    shard = batch_sharding(mesh)
    video = jax.device_put(video, shard)
    text = jax.device_put(text, shard)
    targets = jax.device_put(targets, shard)
    repl = NamedSharding(mesh, P())
    state = jax.device_put(state, repl)

    jitted = jax.jit(step_fn)
    state1, metrics = jitted(state, video, text, targets, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state1.step) == 1


def test_train_step_sharded_dp_sp_tp(model_and_params):
    """Full 3-axis mesh (dp=2 x sp=2 x tp=2): the clip's FRAME axis shards
    over sp (sequence parallel — net-new vs the reference's DDP-only
    parallelism, SURVEY §2.6) and the step's loss matches the unsharded
    single-device step, proving GSPMD inserts the temporal collectives
    (Swin shifted windows, time decoder, temporal pooling) without changing
    the math."""
    from vgqa_tpu.parallel import build_mesh, param_shardings, sp_batch_shardings

    model, params = model_and_params
    cfg = _cfg()
    tx, _ = make_optimizer(cfg, params, max_iter=10)
    loss_fn = VideoSTGLoss(use_aux_loss=False)
    weight_dict = build_weight_dict(cfg)
    step_fn = make_train_step(model, loss_fn, weight_dict, tx, None)
    video, text, targets = _batch(v=2)
    rng = jax.random.PRNGKey(0)

    # unsharded reference
    state0 = create_train_state(params, tx, use_ema=False)
    _, ref_metrics = jax.jit(step_fn)(state0, video, text, targets, rng)
    ref_loss = float(ref_metrics["loss"])

    mesh = build_mesh(dp=2, sp=2, tp=2)
    assert dict(mesh.shape) == {"dp": 2, "sp": 2, "tp": 2}
    state = create_train_state(params, tx, use_ema=False)
    state = jax.device_put(state, param_shardings(mesh, state))
    v_sh, t_sh, tg_sh = sp_batch_shardings(mesh, video, text, targets)
    # frame axis genuinely on sp (T=4 splits 2-way); per-video fields dp-only
    assert "sp" in str(v_sh.frames.spec) and "sp" not in str(v_sh.pixel_mask.spec)
    video_s = jax.device_put(video, v_sh)
    text_s = jax.device_put(text, t_sh)
    targets_s = jax.device_put(targets, tg_sh)

    state1, metrics = jax.jit(step_fn)(state, video_s, text_s, targets_s, rng)
    assert int(state1.step) == 1
    np.testing.assert_allclose(float(metrics["loss"]), ref_loss, rtol=2e-3)


def test_ema_update_math():
    p = {"w": jnp.ones((2,))}
    e = {"w": jnp.zeros((2,))}
    out = update_ema(p, e, 0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1, atol=1e-6)


def test_flat_clip_matches_optax():
    """clip_by_global_norm_flat (one concatenated reduction — the optax
    per-leaf version emits ~444 scalar fusions costing ~33 ms/step at
    64f@420) must reproduce optax.clip_by_global_norm exactly, both when
    the norm exceeds the bound and when it does not."""
    import optax

    from vgqa_tpu.training.optimizer import clip_by_global_norm_flat

    rng = np.random.RandomState(0)
    for mag in (1e-4, 1.0, 100.0):  # norm below / near / above max_norm
        tree = {
            "a": jnp.asarray(rng.randn(3, 4) * mag, jnp.float32),
            "b": {"c": jnp.asarray(rng.randn(7) * mag, jnp.float32),
                  "d": jnp.asarray(rng.randn(2, 2, 2) * mag, jnp.float32)},
        }
        ref = optax.clip_by_global_norm(0.1)
        new = clip_by_global_norm_flat(0.1)
        r, _ = ref.update(tree, ref.init(tree))
        n, _ = new.update(tree, new.init(tree))
        for a, b in zip(jax.tree.leaves(r), jax.tree.leaves(n)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6
            )


def test_bucketed_clip_matches_optax():
    """clip_by_global_norm_bucketed (small leaves concatenated, big
    leaves per-leaf — the hybrid between optax's 444 scalar reductions
    and the measured-slower single 0.7 GB concat) must reproduce
    optax.clip_by_global_norm, with leaves on BOTH sides of the size
    split and in mixed dtypes."""
    import optax

    from vgqa_tpu.training.optimizer import clip_by_global_norm_bucketed

    rng = np.random.RandomState(1)
    for mag in (1e-4, 1.0, 100.0):
        tree = {
            "small_f32": jnp.asarray(rng.randn(7) * mag, jnp.float32),
            "small_bf16": jnp.asarray(rng.randn(3, 5) * mag, jnp.bfloat16),
            "big": jnp.asarray(rng.randn(600, 50) * mag, jnp.float32),
            "big2": {"w": jnp.asarray(rng.randn(40, 700) * mag,
                                      jnp.float32)},
        }
        ref = optax.clip_by_global_norm(0.1)
        # split at 100 KB so `big`/`big2` take the per-leaf path
        new = clip_by_global_norm_bucketed(0.1, small_bytes=100_000)
        r, _ = ref.update(tree, ref.init(tree))
        n, _ = new.update(tree, new.init(tree))
        for a, b in zip(jax.tree.leaves(r), jax.tree.leaves(n)):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-2 if a.dtype == jnp.bfloat16 else 1e-6,
            )


def test_remat_train_step_matches_no_remat():
    """Per-block remat must change memory, not math: one train step with
    TPU.REMAT on/off yields identical losses and parameters."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vgqa_tpu.config import build_default_cfg
    from vgqa_tpu.models import (
        GroundingConfig, VSTGNet, VideoSTGLoss, build_weight_dict,
    )
    from vgqa_tpu.training import create_train_state, make_optimizer, make_train_step
    from vgqa_tpu.utils.containers import TextBatch, VideoBatch

    cfg = build_default_cfg()
    cfg.DATASET.APP_NUM, cfg.DATASET.MOT_NUM = 5, 7
    rng = np.random.RandomState(0)
    t = 4
    video = VideoBatch(
        frames=jnp.asarray(rng.randn(1, t, 64, 64, 3).astype(np.float32) * 0.1),
        pixel_mask=jnp.ones((1, 64, 64), bool),
        time_mask=jnp.ones((1, t), bool),
    )
    text = TextBatch(jnp.asarray(rng.randint(4, 100, (1, 8)).astype(np.int32)),
                     jnp.ones((1, 8), bool))
    act = np.zeros((1, t), np.float32)
    act[:, 1:3] = 1
    targets = {
        "boxes": jnp.asarray(np.tile([0.5, 0.5, 0.2, 0.3], (1, t, 1)).astype(np.float32)),
        "actioness": jnp.asarray(act),
        "time_mask": jnp.ones((1, t), bool),
        "sted": jnp.asarray([[1, 2]], jnp.int32),
        "attr_labels": jnp.zeros((1, 5)),
        "verb_labels": jnp.zeros((1, 7)),
    }

    import dataclasses

    losses = {}
    leaves = {}
    for remat in (False, True):
        gcfg = dataclasses.replace(GroundingConfig.tiny_test(), remat=remat)
        model = VSTGNet(gcfg)
        params = model.init(jax.random.PRNGKey(0), video, text, train=False)
        tx, _ = make_optimizer(cfg, params, max_iter=10)
        state = create_train_state(params, tx, use_ema=False)
        step = jax.jit(make_train_step(
            model, VideoSTGLoss(use_aux_loss=True), build_weight_dict(cfg),
            tx, None))
        new_state, metrics = step(state, video, text, targets,
                                  jax.random.PRNGKey(0))
        losses[remat] = float(metrics["loss"])
        leaves[remat] = np.asarray(
            jax.tree.leaves(new_state.params)[0]
        )

    np.testing.assert_allclose(losses[False], losses[True], rtol=1e-5)
    np.testing.assert_allclose(leaves[False], leaves[True], atol=1e-6)


def test_train_step_mixed_precision(model_and_params):
    """compute_dtype=bf16: fwd/bwd in bf16, master params stay f32, loss
    finite and close to the f32 step's loss; params actually move."""
    import jax.numpy as jnp

    model, params = model_and_params
    cfg = _cfg()
    tx, _ = make_optimizer(cfg, params, max_iter=10)
    loss_fn = VideoSTGLoss(use_aux_loss=True)
    weight_dict = build_weight_dict(cfg)
    video, text, targets = _batch()
    rng = jax.random.PRNGKey(0)

    f32_step = jax.jit(make_train_step(model, loss_fn, weight_dict, tx, None))
    bf_step = jax.jit(make_train_step(model, loss_fn, weight_dict, tx, None,
                                      compute_dtype=jnp.bfloat16))
    s_f = create_train_state(params, tx, use_ema=False)
    s_b = create_train_state(params, tx, use_ema=False)
    s_f1, m_f = f32_step(s_f, video, text, targets, rng)
    s_b1, m_b = bf_step(s_b, video, text, targets, rng)

    lf, lb = float(m_f["loss"]), float(m_b["loss"])
    assert np.isfinite(lb)
    assert abs(lf - lb) / max(abs(lf), 1e-6) < 0.05, (lf, lb)
    # master params stay f32 and move
    leaves = jax.tree.leaves(s_b1.params)
    assert all(x.dtype != jnp.bfloat16 for x in leaves)
    p0 = np.concatenate([np.ravel(x) for x in
                         jax.tree.leaves(params["params"]["ground_encoder"])])
    p1 = np.concatenate([np.ravel(x) for x in jax.tree.leaves(
        s_b1.params["params"]["ground_encoder"])])
    assert np.abs(p0 - p1).max() > 0


def test_build_mesh_rejects_impossible_shapes():
    """sp*tp exceeding the device count must fail with the guard's message,
    not silently build a zero-device mesh (dp would compute to 0)."""
    import pytest

    from vgqa_tpu.parallel import build_mesh

    with pytest.raises(AssertionError, match="devices"):
        build_mesh(sp=16)  # 8 virtual CPU devices -> dp = 0


def test_sp_disables_pallas_route():
    """The Pallas megakernel is an opaque Mosaic call GSPMD cannot shard:
    with MESH_SP > 1 the model config must route to the partitionable
    inline XLA attention instead."""
    from vgqa_tpu.config import build_default_cfg
    from vgqa_tpu.models import GroundingConfig

    cfg = build_default_cfg()
    assert GroundingConfig.from_cfg(cfg).use_pallas_attention
    cfg.TPU.MESH_SP = 2
    assert not GroundingConfig.from_cfg(cfg).use_pallas_attention
