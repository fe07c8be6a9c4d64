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
    # steps executed per device dispatch (lax.scan over stacked batches).
    # Through a remote-device tunnel every dispatch + metric fetch is a
    # host round trip (~0.2 s); scanning K steps per call amortizes it K×
    # while per-step metrics stay exact (the scan stacks them).
    steps_per_dispatch: int = 1


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
    if loop_cfg.steps_per_dispatch > 1:
        return _train_loop_chunked(
            step_fn, state, batches, loop_cfg, ckpt, validate_fn,
            start_step, metric_sink, lr_schedule, logger, eta,
        )
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


def _train_loop_chunked(
    step_fn, state, batches, loop_cfg, ckpt, validate_fn,
    start_step, metric_sink, lr_schedule, logger, eta,
):
    """K-steps-per-dispatch variant of ``train_loop``.

    A single jitted call scans ``step_fn`` over a stacked chunk of batches
    and returns per-step metrics stacked on the leading axis, so the host
    pays one dispatch + one metric fetch per K steps instead of per step.
    Chunks never cross a checkpoint/validation boundary, so save cadence is
    identical to the per-step loop.  The carry (params/lora/opt_state) is
    donated: the old buffers are reused in place, which matters at the
    0.47B-params-in-f32 scale on a 16 GB chip.  The previous chunk's
    metrics are fetched *after* the next chunk is dispatched, overlapping
    host I/O with device compute (async dispatch pipeline).
    """
    import functools

    def chunk_body(carry, batch):
        params, lora, opt_state = carry
        params, lora, opt_state, metrics = step_fn(
            params, lora, opt_state, batch
        )
        return (params, lora, opt_state), metrics

    @functools.partial(jax.jit, donate_argnums=(0,))
    def jit_chunk(carry, stacked):
        return jax.lax.scan(chunk_body, carry, stacked)

    def boundary_after(step):
        """Next step at which a checkpoint/validation action fires."""
        nxt = loop_cfg.total_steps
        for interval in (loop_cfg.backup_interval, loop_cfg.save_interval):
            if interval and interval > 0:
                nxt = min(nxt, (step // interval + 1) * interval)
        return nxt

    def flush(first_step, stacked_metrics):
        host = jax.device_get(stacked_metrics)
        n = len(next(iter(host.values()))) if host else 0
        for i in range(n):
            s = first_step + i + 1
            rec = {k: float(v[i]) for k, v in host.items()}
            if lr_schedule is not None:
                rec["lr"] = float(lr_schedule(s - 1))
            eta.log(s, rec)
            if metric_sink is not None:
                metric_sink(s, rec)

    step = start_step
    carry = (state.get("params"), state.get("lora"), state.get("opt_state"))
    pending = None
    it = iter(batches)
    while step < loop_cfg.total_steps:
        take = min(loop_cfg.steps_per_dispatch, boundary_after(step) - step)
        chunk = []
        for _ in range(take):
            try:
                chunk.append(next(it))
            except StopIteration:
                break
        if not chunk:
            break
        stacked = jax.tree.map(lambda *xs: np.stack(xs), *chunk)
        carry, metrics = jit_chunk(carry, stacked)
        if pending is not None:
            flush(*pending)  # blocks on the PREVIOUS chunk only
        pending = (step, metrics)
        step += len(chunk)
        state["params"], state["lora"], state["opt_state"] = carry

        at_backup = (loop_cfg.backup_interval
                     and step % loop_cfg.backup_interval == 0)
        at_save = step % loop_cfg.save_interval == 0
        if at_backup or at_save:
            # reading the carry synchronizes; do it before the next
            # dispatch so donation never invalidates a buffer mid-read
            if pending is not None:
                flush(*pending)
                pending = None
        if ckpt is not None and at_backup:
            ckpt.save_backup(step, _saveable(state))
        if at_save:
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
                        {f"validation_{k}": v
                         for k, v in val_metrics.items()
                         if isinstance(v, (int, float))},
                    )
    if pending is not None:
        flush(*pending)
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
