"""Eval sweeps: datasets x eval methods x shots (the bash L6 layer,
reference ``test/scripts/test_pdecontrol.sh:55-99``, as Python)."""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional, Sequence

from pdec.pipeline.evaluate import EvalDriver
from pdec.runtime.logging import get_logger


def load_jsonl(path: str, max_rows: Optional[int] = None) -> List[Dict]:
    rows = []
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            rows.append(json.loads(line))
            if max_rows is not None and len(rows) >= max_rows:
                break
    return rows


def run_sweep(
    driver: EvalDriver,
    dataset_paths: Dict[str, str],  # name -> test.jsonl path
    eval_methods: Sequence[str],
    shots_list: Sequence[int] = (0, 2),
    seed: int = 0,
    out_dir: str = "runs/eval",
    max_num_examples: Optional[int] = 512,
    skip_existing_scores: bool = False,
):
    """Sweep with wall-clock ETA logging (reference
    ``test_pdecontrol.sh:81-96``)."""
    logger = get_logger("pdec.sweep")
    combos = [
        (name, method, shots)
        for name in dataset_paths
        for method in eval_methods
        for shots in shots_list
    ]
    t0 = time.time()
    results = {}
    failed = []
    for i, (name, method, shots) in enumerate(combos):
        items = load_jsonl(dataset_paths[name], max_num_examples)
        try:
            res = driver.run(
                items, eval_method=method, shots=shots, seed=seed,
                dataset_name=name, out_dir=out_dir,
                skip_existing_scores=skip_existing_scores,
            )
        except Exception:
            # a transient device/tunnel failure on one combo must not
            # abort the sweep — per-combo caching makes retries cheap
            logger.exception(
                "[%d/%d] %s %s shots=%d FAILED (continuing)",
                i + 1, len(combos), name, method, shots,
            )
            failed.append((name, method, shots))
            continue
        results[(name, method, shots)] = res.metrics
        elapsed = time.time() - t0
        eta = elapsed / (i + 1) * (len(combos) - i - 1)
        logger.info(
            "[%d/%d] %s %s shots=%d done | elapsed %.1fm eta %.1fm",
            i + 1, len(combos), name, method, shots, elapsed / 60, eta / 60,
        )
    if failed:
        logger.warning("sweep finished with %d failed combos: %s",
                       len(failed), failed)
    return results, failed
