"""Experiment tracking sinks (reference: wandb + tensorboard,
``train/scripts/train.sh:96,104``, ``train/validate.py:70-89``).

`make_metric_sink` composes whatever backends are available:
- always: append-only ``metrics.jsonl`` in the run dir (greppable,
  crash-safe),
- wandb when importable AND configured (``WANDB_API_KEY``/offline mode) —
  gated, never required.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Optional


def make_metric_sink(
    run_dir: str,
    use_wandb: bool = True,
    wandb_project: str = "pdec",
    wandb_run_name: Optional[str] = None,
    config: Optional[Dict] = None,
) -> Callable[[int, Dict[str, float]], None]:
    os.makedirs(run_dir, exist_ok=True)
    jsonl_path = os.path.join(run_dir, "metrics.jsonl")

    wandb_run = None
    if use_wandb:
        try:
            import wandb  # type: ignore

            mode = os.environ.get("WANDB_MODE", "offline")
            wandb_run = wandb.init(
                project=wandb_project, name=wandb_run_name, config=config,
                mode=mode, dir=run_dir,
                resume="auto",  # reference WANDB_RESUME=auto (train.sh:104)
            )
        except Exception:
            wandb_run = None

    def sink(step: int, metrics: Dict[str, float]) -> None:
        record = {"step": step, "time": time.time(), **metrics}
        with open(jsonl_path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if wandb_run is not None:
            wandb_run.log(metrics, step=step)

    return sink


def read_metrics(run_dir: str):
    path = os.path.join(run_dir, "metrics.jsonl")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
