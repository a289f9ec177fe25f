"""Train/eval engine tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import __graft_entry__ as graft
from stereoscene_tpu import metrics
from stereoscene_tpu.engine.eval import make_eval_step
from stereoscene_tpu.engine.train import step_lr_schedule
from stereoscene_tpu.parallel.mesh import make_mesh

# full tier only: train/eval loop, checkpoint/preemption/resume
pytestmark = pytest.mark.slow


def test_step_lr_schedule():
    sched = step_lr_schedule(1e-4, steps_per_epoch=10, milestones=(2, 3))
    assert np.isclose(float(sched(0)), 1e-4)
    assert np.isclose(float(sched(20)), 1e-5)
    assert np.isclose(float(sched(30)), 1e-6)


def test_make_mesh_axes():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_graft_entry_forward():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[-1] == 20
    assert bool(jnp.all(jnp.isfinite(out)))


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_eval_step_metrics_flow():
    fn, (batch,) = graft.entry()
    # reuse the tiny model through graft internals
    cfg = graft._tiny_cfg()
    from stereoscene_tpu.models.detector import BEVDepthOccupancy

    model = BEVDepthOccupancy(cfg=cfg)
    full_batch = graft._make_batch(cfg, b=1)
    variables = model.init(jax.random.PRNGKey(0), full_batch, train=False)
    x, y, z = cfg.grid_shape
    eval_step = make_eval_step(model, gt_shape=(2 * x, 2 * y, 2 * z))
    state = metrics.empty_state()
    pred, state = jax.jit(eval_step)(variables, full_batch, state)
    assert pred.shape == (1, 2 * x, 2 * y, 2 * z)
    scores = metrics.compute(state)
    assert np.isfinite(float(scores["iou_ssc_mean"]))


def test_tensorboard_writer_roundtrip(tmp_path):
    """Hand-encoded event files must parse with the canonical TF reader
    (ref parity: TensorboardLoggerHook, default_runtime.py:6-11)."""
    from stereoscene_tpu.utils.tb_writer import TensorBoardWriter, crc32c

    # CRC32C known-answer vectors (RFC 3720)
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283

    with TensorBoardWriter(str(tmp_path)) as w:
        w.add_scalar("train/loss", 1.5, step=10)
        w.add_scalars({"train/a": 2.0, "val/b": -0.25}, step=20)
        path = w.path

    tf = pytest.importorskip("tensorflow")
    got = []
    for ev in tf.compat.v1.train.summary_iterator(path):
        for v in ev.summary.value:
            got.append((ev.step, v.tag, round(float(v.simple_value), 6)))
    assert (10, "train/loss", 1.5) in got
    assert (20, "train/a", 2.0) in got
    assert (20, "val/b", -0.25) in got


def test_warmup_schedule_mmcv_semantics():
    """Linear warmup: lr * (1 - (1 - i/W)(1 - ratio)), reaching base lr at
    step W (mmcv LrUpdaterHook warmup='linear')."""
    sched = step_lr_schedule(
        1e-3, steps_per_epoch=10, milestones=(50,), warmup_steps=100,
        warmup_ratio=0.1,
    )
    assert float(sched(0)) == pytest.approx(1e-4)
    assert float(sched(50)) == pytest.approx(1e-3 * (1 - 0.5 * 0.9))
    assert float(sched(100)) == pytest.approx(1e-3)
    # step decay (milestone epoch 50 -> step 500) composes with the
    # completed warmup
    assert float(sched(600)) == pytest.approx(1e-4)


def test_grad_accumulation_multisteps():
    """accumulate_steps=k applies one real update per k micro-batches
    (mmcv GradientCumulativeOptimizerHook equivalent)."""
    from flax import linen as nn

    from stereoscene_tpu.engine.train import create_train_state

    class Lin(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(1)(x)

    m = Lin()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)))
    state = create_train_state(m, v, lr=0.1, accumulate_steps=2,
                               weight_decay=0.0)
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
    state = state.apply_gradients(grads)
    # first micro-step: update buffered, params unchanged
    assert np.allclose(jax.tree_util.tree_leaves(state.params)[0], p0)
    state = state.apply_gradients(grads)
    assert not np.allclose(jax.tree_util.tree_leaves(state.params)[0], p0)


def test_transfer_weight_hook():
    from stereoscene_tpu.engine.loop import TransferWeightHook

    class S:
        def __init__(self, p):
            self.params = p
            self.batch_stats = {}

    h = TransferWeightHook(every_n_iters=2)
    h(S({"w": 1}), 0, 0, {})
    assert h.eval_params == {"w": 1}
    h(S({"w": 2}), 0, 1, {})  # skipped (it=1 not multiple of 2)
    assert h.eval_params == {"w": 1}
    h(S({"w": 3}), 0, 2, {})
    assert h.eval_params == {"w": 3}


def test_preemption_checkpoint_and_midepoch_resume(tmp_path):
    """SIGTERM mid-epoch saves the current step; a fresh run restores it
    and realigns the data cursor so no batch is replayed or lost (SURVEY §5
    preemption mode; the reference saves only at epoch end)."""
    import signal

    import optax
    from flax import linen as nn

    from stereoscene_tpu.engine.loop import run_training
    from stereoscene_tpu.engine.train import TrainState

    class Lin(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(1)(x)

    model = Lin()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)))
    tx = optax.sgd(0.01)

    def fresh_state():
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=variables["params"],
            batch_stats={}, opt_state=tx.init(variables["params"]), tx=tx,
        )

    seen = []

    def train_step(state, batch, rng):
        def loss_fn(p):
            return jnp.mean((model.apply({"params": p}, batch["x"]) - 1.0) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), {"loss_total": loss,
                                              "tag": batch["tag"][0]}

    class Loader(list):
        pass

    loader = Loader(
        {"x": np.full((2, 3), i, np.float32),
         "tag": np.array([i], np.int32)} for i in range(10)
    )

    def record(state, epoch, it, logs):
        seen.append(int(logs["tag"]))
        if len(seen) == 5:  # preempt mid-epoch
            signal.raise_signal(signal.SIGTERM)

    wd = str(tmp_path / "wd")
    state = run_training(
        model, fresh_state(), train_step, loader, work_dir=wd,
        max_epochs=1, eval_interval=100, save_interval_steps=2,
        hooks=[record],
    )
    assert int(state.step) == 5
    assert seen == [0, 1, 2, 3, 4]

    # resume: restores step 5, skips batches 0-4, finishes the epoch
    resumed = []
    state2 = run_training(
        model, fresh_state(), train_step, loader, work_dir=wd,
        max_epochs=1, eval_interval=100,
        hooks=[lambda s, e, i, logs: resumed.append(int(logs["tag"]))],
    )
    assert resumed == [5, 6, 7, 8, 9]
    assert int(state2.step) == 10
