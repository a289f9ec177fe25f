"""Full training loop: epochs, periodic eval, best-checkpoint, logging.

Replaces ``custom_train_detector`` + ``EpochBasedRunner`` + ``OccDistEvalHook``
(ref: occupancy/apis/mmdet_train.py:28-198, core/evaluation/eval_hooks.py:92-167):

- one jitted train step per iteration (batch sharded over the mesh's 'data'
  axis, params replicated -> XLA all-reduces grads, the DDP equivalent),
- eval every ``eval_interval`` epochs with the streaming SSC metric state,
- best checkpoint by ``semkitti_combined_IoU`` + keep-last-k,
- JSONL + TensorBoard metric logging on host 0 (the reference's
  TextLoggerHook + TensorboardLoggerHook at interval 50,
  ref projects/configs/_base_/default_runtime.py:6-11) and optional
  per-stage profiling
  (the reference's ``record_time`` latency table,
  ref bevdepth_occupancy.py:252-263, becomes a --profile flag that wraps the
  step in ``block_until_ready`` timers).
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .. import metrics as ssc_metrics
from ..losses import KITTI_CLASS_NAMES
from .checkpoint import CheckpointManager
from .train import TrainState


class TransferWeightHook:
    """Keep a separate eval-params copy synced from the train state every
    ``every_n_iters`` steps — the reference's ``TransferWeight`` hook, which
    copies ``runner.model`` into ``runner.eval_model`` after each train iter
    (ref: bevformer/hooks/custom_hooks.py:6-13, used by BEVFormer's fp16
    runner to evaluate a weight snapshot while training continues)."""

    def __init__(self, every_n_iters: int = 1):
        self.every_n_iters = max(1, int(every_n_iters))
        self.eval_params = None
        self.eval_batch_stats = None

    def __call__(self, state, epoch: int, it: int, logs) -> None:
        if it % self.every_n_iters == 0:
            self.eval_params = state.params
            self.eval_batch_stats = state.batch_stats


class JsonlLogger:
    def __init__(self, path: Optional[str]):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def log(self, record: Dict):
        record = {
            k: (float(v) if hasattr(v, "item") else v)
            for k, v in record.items()
        }
        line = json.dumps(record)
        if self.path:
            with open(self.path, "a") as f:
                f.write(line + "\n")
        print(line, flush=True)


def run_training(
    model,
    state: TrainState,
    train_step: Callable,
    train_loader,
    eval_fn: Optional[Callable] = None,
    *,
    mesh=None,
    max_epochs: int = 30,
    eval_interval: int = 2,
    work_dir: str = "work_dir",
    log_interval: int = 50,
    seed: int = 0,
    profile: bool = False,
    trace_dir: Optional[str] = None,
    trace_steps: Tuple[int, int] = (10, 15),
    hooks: Optional[list] = None,
    save_interval_steps: int = 0,
) -> TrainState:
    """``hooks``: callables ``(state, epoch, it, logs)`` run after every
    train step — the runner's custom-hook escape hatch (the reference's
    runner accepts arbitrary mmcv hooks, ref occupancy/apis/mmdet_train.py:
    180-192); see ``TransferWeightHook`` for the packaged equivalent of the
    reference's TransferWeight.

    Preemption safety (SURVEY §5's TPU-pool failure mode — the reference
    only checkpoints per epoch): ``save_interval_steps > 0`` adds *async*
    orbax saves every N steps, SIGTERM triggers a synchronous save before
    returning, and resume restores the mid-epoch position — the first
    resumed epoch skips the already-consumed leading batches so the
    data-shard cursor lines up (deterministic per-epoch loader order)."""
    logger = JsonlLogger(os.path.join(work_dir, "train_log.jsonl"))
    tb = None
    if jax.process_index() == 0:
        from ..utils.tb_writer import TensorBoardWriter

        tb = TensorBoardWriter(os.path.join(work_dir, "tf_logs"))
    ckpt = CheckpointManager(os.path.join(work_dir, "ckpts"))
    state, start_step = ckpt.restore(state)

    if mesh is not None:
        batch_shard = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        jitted_step = jax.jit(
            train_step,
            in_shardings=(repl, batch_shard, repl),
            out_shardings=(repl, repl),
        )
        state = jax.device_put(state, repl)
    else:
        jitted_step = jax.jit(train_step)

    rng = jax.random.PRNGKey(seed)
    steps_per_epoch = len(train_loader)
    start_epoch = int(start_step) // max(steps_per_epoch, 1)
    skip_iters = int(start_step) % max(steps_per_epoch, 1)

    import signal

    preempted = {"flag": False}

    def _on_sigterm(signum, frame):
        preempted["flag"] = True

    try:
        prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:  # non-main thread
        prev_handler = None

    global_it = 0
    for epoch in range(start_epoch, max_epochs):
        t_epoch = time.time()
        for it, batch in enumerate(train_loader):
            if epoch == start_epoch and it < skip_iters:
                continue  # mid-epoch resume: realign the data cursor
            # XLA profiler trace window (the reference's record_time /
            # tb_trace profiler hook equivalent, SURVEY.md section 5)
            if trace_dir is not None and global_it == trace_steps[0]:
                jax.profiler.start_trace(trace_dir)
            if trace_dir is not None and global_it == trace_steps[1]:
                jax.profiler.stop_trace()
            global_it += 1

            rng, step_rng = jax.random.split(rng)
            t0 = time.perf_counter() if profile else None
            state, logs = jitted_step(state, batch, step_rng)
            if profile:
                jax.block_until_ready(logs["loss_total"])
                logs["step_time_s"] = time.perf_counter() - t0
            for hook in hooks or ():
                hook(state, epoch, it, logs)
            if (
                save_interval_steps
                and int(state.step) % save_interval_steps == 0
            ):
                ckpt.save(int(state.step), state, wait=False)
            if preempted["flag"]:
                ckpt.save(int(state.step), state)
                logger.log({
                    "epoch": epoch, "iter": it,
                    "preempted_at_step": int(state.step),
                })
                if prev_handler is not None:
                    signal.signal(signal.SIGTERM, prev_handler)
                if tb is not None:
                    tb.close()
                return state
            if it % log_interval == 0:
                host_logs = jax.device_get(logs)
                logger.log({"epoch": epoch, "iter": it, **host_logs})
                if tb is not None:
                    tb.add_scalars(
                        {
                            f"train/{k}": float(v)
                            for k, v in host_logs.items()
                            if np.isscalar(v) or np.ndim(v) == 0
                        },
                        step=int(state.step),
                    )

        metrics_out: Dict[str, float] = {}
        if eval_fn is not None and (epoch + 1) % eval_interval == 0:
            metrics_out = eval_fn(state)
            logger.log({"epoch": epoch, "eval": metrics_out})
            if tb is not None:
                tb.add_scalars(
                    {
                        f"val/{k}": float(v)
                        for k, v in metrics_out.items()
                        if isinstance(v, (int, float, np.floating))
                    },
                    step=int(state.step),
                )

        ckpt.save(int(state.step), state, metrics=metrics_out)
        logger.log(
            {"epoch": epoch, "epoch_time_s": time.time() - t_epoch}
        )
    if prev_handler is not None:
        signal.signal(signal.SIGTERM, prev_handler)
    ckpt.wait()
    if tb is not None:
        tb.close()
    return state


def pad_batch(batch: Dict, batch_size: int) -> Dict:
    """Pad a short tail batch up to ``batch_size`` by repeating the last
    sample, with padded ``gt_occ`` voxels set to the ignore label 255 so the
    metric state is unaffected. Keeps the jitted eval step's input shapes
    static — without this, ``drop_last=False`` loaders trigger a second full
    compile on the final batch."""
    n = next(iter(batch.values())).shape[0]
    if n == batch_size:
        return batch
    pad = batch_size - n
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        filler = np.repeat(v[-1:], pad, axis=0)
        if k == "gt_occ":
            filler = np.full_like(filler, 255)
        out[k] = np.concatenate([v, filler], axis=0)
    return out


def run_evaluation(
    model,
    variables,
    eval_step: Callable,
    eval_loader,
    *,
    class_names=KITTI_CLASS_NAMES,
    progress: bool = True,
    reduce_processes: bool = True,
) -> Dict[str, float]:
    """Streaming evaluation over a loader; returns the reference-format
    metric dict (semkitti_* keys + combined sort key).

    With multiple JAX processes (each evaluating its own index shard, see
    ``SemanticKittiIndex.shard``), the per-process metric states are summed
    across processes before scoring, so every host reports identical numbers
    and makes the same best-checkpoint decision (the reference used a
    pickle-to-tmpdir gather for this, ref occupancy/apis/test.py:226-273)."""
    jitted = jax.jit(eval_step)
    metric_state = ssc_metrics.empty_state()
    t0 = time.time()
    n = 0
    batch_size = getattr(eval_loader, "batch_size", None)
    for i, batch in enumerate(eval_loader):
        n += int(np.asarray(next(iter(batch.values()))).shape[0])
        if batch_size is not None:
            batch = pad_batch(batch, batch_size)
        _, metric_state = jitted(variables, batch, metric_state)
        if progress and i % 20 == 0:
            scores = ssc_metrics.compute(jax.device_get(metric_state))
            print(
                f"[eval] {n} frames, running SC IoU "
                f"{float(scores['iou']):.4f}, mIoU "
                f"{float(scores['iou_ssc_mean']):.4f}",
                flush=True,
            )
    if reduce_processes:
        metric_state = ssc_metrics.all_processes_state(
            jax.device_get(metric_state)
        )
    out = ssc_metrics.evaluate_dict(metric_state, class_names)
    out["eval_time_s"] = time.time() - t0
    out["eval_frames"] = n
    return out
