"""Training loop driver: data, steps, checkpoints, in-training validation.

Replaces the reference's shell-driven train/validate alternation
(``train/scripts/train.sh:117-145``): there, the trainer *stops itself*
every ``step_save_interval`` steps (``StepCheckpointCallback`` sets
``should_training_stop``) and the shell merges the adapter, runs the eval
driver, and relaunches from the checkpoint.  Here the loop simply calls the
validation hook in-process and keeps going — no process churn, no state
reload, same cadence.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, Iterator, Optional

import jax
import numpy as np

from pdec.runtime.checkpoint import CheckpointManager
from pdec.runtime.logging import ETALogger, get_logger


@dataclasses.dataclass
class LoopConfig:
    total_steps: int = 1000
    save_interval: int = 500  # persistent checkpoint + validation cadence
    backup_interval: int = 100  # rotating crash-recovery checkpoints
    log_every: int = 10


def train_loop(
    step_fn: Callable,  # (state..., batch) -> (state..., metrics)
    state: Dict,  # {'params', 'lora', 'opt_state'} (any subset)
    batches: Iterator,
    loop_cfg: LoopConfig,
    ckpt: Optional[CheckpointManager] = None,
    validate_fn: Optional[Callable[[Dict, int], Dict]] = None,
    start_step: int = 0,
    metric_sink: Optional[Callable[[int, Dict], None]] = None,
    lr_schedule: Optional[Callable[[int], float]] = None,
):
    """Generic jitted-step training loop.

    ``step_fn(params, lora, opt_state, batch)`` must return
    ``(params, lora, opt_state, metrics)``.  ``validate_fn(state, step)``
    runs at every persistent-checkpoint step (the reference's external
    validation, ``train/validate.py``) and its metrics are forwarded to
    ``metric_sink`` (wandb/tensorboard adapter).
    """
    logger = get_logger("pdec.train")
    eta = ETALogger(loop_cfg.total_steps, logger, loop_cfg.log_every)
    step = start_step
    jit_step = jax.jit(step_fn)

    for batch in batches:
        if step >= loop_cfg.total_steps:
            break
        params, lora, opt_state, metrics = jit_step(
            state.get("params"), state.get("lora"), state.get("opt_state"),
            batch,
        )
        state["params"], state["lora"], state["opt_state"] = (
            params, lora, opt_state,
        )
        step += 1
        host_metrics = {k: float(np.asarray(v)) for k, v in metrics.items()}
        if lr_schedule is not None:
            host_metrics["lr"] = float(lr_schedule(step - 1))
        eta.log(step, host_metrics)
        if metric_sink is not None:
            metric_sink(step, host_metrics)

        if ckpt is not None and step % loop_cfg.backup_interval == 0:
            ckpt.save_backup(step, _saveable(state))
        if step % loop_cfg.save_interval == 0:
            if ckpt is not None:
                ckpt.save_step(step, _saveable(state))
            if validate_fn is not None:
                t0 = time.time()
                val_metrics = validate_fn(dict(state), step)
                logger.info(
                    "validation @ %d: %s (%.1fs)", step, val_metrics,
                    time.time() - t0,
                )
                if metric_sink is not None:
                    metric_sink(
                        step,
                        {f"validation_{k}": v for k, v in val_metrics.items()
                         if isinstance(v, (int, float))},
                    )
    return state, step


def _saveable(state: Dict) -> Dict:
    return {k: v for k, v in state.items() if v is not None}


def resume_if_available(ckpt: CheckpointManager, state: Dict):
    """Restore the latest checkpoint if one exists; returns (state, step)
    (reference ``find_latest_checkpoint`` + ``resume_from_checkpoint``)."""
    latest = ckpt.find_latest()
    if latest is None:
        return state, 0
    like = _saveable(state)
    if "checkpoint-step-" in latest:
        restored = ckpt.restore_step(latest, like)
    else:
        restored = ckpt.restore(latest, like)
    state = dict(state)
    state.update(restored)
    return state, ckpt.step_of(latest)
