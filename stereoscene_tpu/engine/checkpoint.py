"""Orbax checkpointing: params + opt state + step + best-metric tracking.

Replaces the mmcv CheckpointHook + best-checkpoint logic
(ref: config stereoscene.py:217-225 — keep last ``max_keep_ckpts``, save best
by ``semkitti_combined_IoU``; eval_hooks.py:163-166). Uses orbax's
CheckpointManager for atomic async-capable saves and preemption-safe resume
(SURVEY.md section 5, checkpoint/resume).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        max_to_keep: int = 2,
        best_metric_key: str = "semkitti_combined_IoU",
    ):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self.best_metric_key = best_metric_key
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                best_fn=(lambda m: m.get(best_metric_key, -1.0)),
                best_mode="max",
                keep_checkpoints_without_metrics=True,
            ),
        )

    def save(
        self,
        step: int,
        state,
        metrics: Optional[Dict[str, float]] = None,
        wait: bool = True,
    ):
        """``wait=False`` leaves the orbax save running asynchronously —
        used by the mid-epoch periodic saves so training never blocks on
        I/O; epoch-end / preemption saves pass ``wait=True``."""
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        self._mgr.save(
            step, args=ocp.args.StandardSave(payload), metrics=metrics or {}
        )
        if wait:
            self._mgr.wait_until_finished()

    def wait(self):
        self._mgr.wait_until_finished()

    def restore(self, state, step: Optional[int] = None):
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return state, 0
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template)
        )
        new_state = state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )
        return new_state, step

    @property
    def latest_step(self):
        return self._mgr.latest_step()

    @property
    def best_step(self):
        return self._mgr.best_step()
