"""Process-aware logging + training ETA lines + per-step metric streams.

Mirrors the reference's logging setup (``train/utils/util.py:5-33``:
rank-tagged format, per-node file, INFO on rank 0 / WARN elsewhere) and the
``LoggerCallback`` loss/lr/ETA lines (``train/utils/trainer.py:22-51``).
Handlers attach to the ``pdec`` ROOT logger so every ``pdec.*`` child
propagates into the same console + per-node run-dir file — a child module
logging through its own name must still land in ``log-node-N.log``.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional

import jax


def get_logger(name: str = "pdec", log_dir: Optional[str] = None) -> logging.Logger:
    rank = jax.process_index()
    root = logging.getLogger("pdec")
    fmt = logging.Formatter(
        f"[rank {rank}] %(asctime)s %(levelname)s %(name)s: %(message)s"
    )
    if not root.handlers:
        console = logging.StreamHandler()
        console.setFormatter(fmt)
        root.addHandler(console)
        root.setLevel(logging.INFO if rank == 0 else logging.WARNING)
        root.propagate = False  # python root may carry its own handler
    if log_dir is not None:
        os.makedirs(log_dir, exist_ok=True)
        path = os.path.abspath(os.path.join(log_dir, f"log-node-{rank}.log"))
        have = any(
            isinstance(h, logging.FileHandler) and h.baseFilename == path
            for h in root.handlers
        )
        if not have:
            fh = logging.FileHandler(path)
            fh.setFormatter(fmt)
            root.addHandler(fh)
    logger = logging.getLogger(name)
    logger.setLevel(logging.NOTSET)  # defer to the pdec root
    return logger


class JsonlMetricSink:
    """Append per-step metrics to ``<run_dir>/metrics.jsonl``.

    The reference streams per-step loss/lr/ETA through ``LoggerCallback``
    and wandb (``train/utils/trainer.py:22-51``, ``validate.py:70-89``);
    here every run dir carries a replayable, plottable metrics stream.
    """

    def __init__(self, run_dir: str, filename: str = "metrics.jsonl"):
        os.makedirs(run_dir, exist_ok=True)
        self._path = os.path.join(run_dir, filename)
        self._f = open(self._path, "a", buffering=1)
        self._start = time.time()

    def __call__(self, step: int, metrics: Dict[str, float]) -> None:
        rec = {"step": step, "elapsed_s": round(time.time() - self._start, 3)}
        for k, v in metrics.items():
            if isinstance(v, (int, float)):
                rec[k] = v
        self._f.write(json.dumps(rec) + "\n")

    def close(self) -> None:
        self._f.close()


class ETALogger:
    """Step logger with smoothed throughput and ETA."""

    def __init__(self, total_steps: int, logger: Optional[logging.Logger] = None,
                 log_every: int = 10):
        self.total_steps = total_steps
        self.logger = logger or get_logger()
        self.log_every = log_every
        self._start = time.time()
        self._last_time = self._start
        self._last_step = 0

    def log(self, step: int, metrics: Dict[str, float], lr: Optional[float] = None):
        if step % self.log_every != 0:
            return
        now = time.time()
        dt = max(now - self._last_time, 1e-9)
        steps_per_sec = (step - self._last_step) / dt if step > self._last_step else 0.0
        remaining = (self.total_steps - step) / max(steps_per_sec, 1e-9)
        self._last_time, self._last_step = now, step
        parts = [f"step {step}/{self.total_steps}"]
        for k, v in metrics.items():
            parts.append(f"{k} {float(v):.4g}")
        if lr is not None:
            parts.append(f"lr {lr:.3g}")
        if steps_per_sec > 0:
            parts.append(f"{steps_per_sec:.2f} it/s")
            parts.append(f"eta {remaining/60:.1f}m")
        self.logger.info(" | ".join(parts))
