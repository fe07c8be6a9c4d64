"""Profiling + cost accounting (reference: DeepSpeed flops_profiler at step
25, ``train/config/deepspeed.json:23-30``; per-example Gurobi runtime as a
metric, ``eval_robustness_wrapper.py:16-21``).

TPU equivalents: ``jax.profiler`` traces on demand, analytic FLOP/byte cost
models for the two hot paths (train step, synthesis), and wall-clock
accounting that the eval pipeline propagates as ``simulation time``.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock accounting with device-sync boundaries."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                jax.block_until_ready(sync_on)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": v, "count": self.counts[k],
                "mean_ms": 1000.0 * v / max(self.counts[k], 1)}
            for k, v in self.totals.items()
        }


def train_step_cost(cfg, batch_tokens: int) -> Dict[str, float]:
    """Analytic per-step cost for a decoder train step (fwd+bwd ~ 6ND)."""
    n_params = (
        cfg.vocab_size * cfg.d_model * (1 if cfg.tie_embeddings else 2)
        + cfg.n_layers * (
            cfg.d_model * (cfg.n_heads + 2 * cfg.n_kv_heads) * cfg.head_dim
            + cfg.n_heads * cfg.head_dim * cfg.d_model
            + 3 * cfg.d_model * cfg.d_ff
        )
    )
    flops = 6.0 * n_params * batch_tokens
    return {"params": float(n_params), "step_flops": flops}


def synthesis_cost(n_problems: int, state_dim: int, n_steps: int,
                   n_starts: int, n_iters: int) -> Dict[str, float]:
    """Analytic FLOPs for a synthesis batch (rollout fwd+bwd dominated)."""
    rollout = 2.0 * n_steps * state_dim * state_dim
    total = 3.0 * rollout * n_problems * n_starts * n_iters
    return {"rollout_flops_per_eval": rollout, "total_flops": total}
