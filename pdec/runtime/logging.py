"""Process-aware logging + training ETA lines.

Mirrors the reference's logging setup (``train/utils/util.py:5-33``:
rank-tagged format, per-node file, INFO on rank 0 / WARN elsewhere) and the
``LoggerCallback`` loss/lr/ETA lines (``train/utils/trainer.py:22-51``).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, Optional

import jax


def get_logger(name: str = "pdec", log_dir: Optional[str] = None) -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    rank = jax.process_index()
    fmt = logging.Formatter(
        f"[rank {rank}] %(asctime)s %(levelname)s %(name)s: %(message)s"
    )
    console = logging.StreamHandler()
    console.setFormatter(fmt)
    logger.addHandler(console)
    if log_dir is not None:
        os.makedirs(log_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(log_dir, f"log-node-{rank}.log"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.setLevel(logging.INFO if rank == 0 else logging.WARNING)
    return logger


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
