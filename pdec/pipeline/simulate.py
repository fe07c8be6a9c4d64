"""Ground-truth robustness labeling — the ``simulate_gt.py`` replacement.

The reference labels datasets by fanning out Gurobi solves to a process
pool at 50% of CPUs with 300 s per-task timeouts (``simulate_gt.py:62-89``).
Here the whole dataset is one batched TPU synthesis call
(`pdec.eval.robustness.eval_robustness_batch`), after which the jsonl is
rewritten with ``robustness``/``time`` and the dataset-health sign stats
are reported (``simulate_gt.py:133-160``).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import jax

from pdec.control.synthesis import SynthesisConfig
from pdec.eval.robustness import eval_robustness_batch


def simulate_ground_truth(
    items: Sequence[Dict],
    python_key: str = "python",
    synthesis: Optional[SynthesisConfig] = None,
    seed: int = 0,
    max_num_examples: Optional[int] = None,
    out_path: Optional[str] = None,
    deterministic_keys: bool = False,
):
    """Label ``items`` with ground-truth robustness via batched synthesis.

    Returns (labeled items, metrics dict with the reference's sign stats).
    """
    rows = list(items)
    if max_num_examples is not None:
        rows = rows[:max_num_examples]

    codes = [r.get(python_key, "") for r in rows]
    results = eval_robustness_batch(
        codes, key=jax.random.PRNGKey(seed), config=synthesis,
        deterministic_keys=deterministic_keys,
    )

    labeled = []
    for row, (rob, runtime) in zip(rows, results):
        r = dict(row)
        r["robustness"] = rob
        r["time"] = runtime
        labeled.append(r)

    n = len(labeled)
    known = [r["robustness"] for r in labeled if isinstance(r["robustness"], float)]
    metrics = {
        "n_samples": n,
        "gt positive robustness rate": sum(1 for v in known if v > 0) / max(n, 1),
        "gt negative robustness rate": sum(1 for v in known if v <= 0) / max(n, 1),
        "gt failed robustness rate": (n - len(known)) / max(n, 1),
    }

    if out_path is not None:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        with open(out_path, "w") as f:
            for r in labeled:
                f.write(json.dumps(r) + "\n")
        with open(os.path.join(os.path.dirname(out_path) or ".", "metrics.json"), "w") as f:
            json.dump(metrics, f, indent=2)
    return labeled, metrics
