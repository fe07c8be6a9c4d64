"""Results aggregation — the ``read_result.py`` replacement.

Scans ``<in_dir>/<dataset>_shots=N_seed=S/<eval_method>/metrics.json`` and
builds per-metric markdown tables of mean(std) over seeds, shots as rows
(reference ``test/scripts/read_result.py``; metric list at ``:137-153``).
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, List, Optional, Sequence

import numpy as np

from pdec.pipeline.evaluate import METRIC_KEYS

_DIR_RE = re.compile(r"^(?P<dataset>.+)_shots=(?P<shots>\d+)_seed=(?P<seed>-?\d+)$")


def _scan(in_dir: str) -> List[Dict]:
    entries = []
    if not os.path.isdir(in_dir):
        return entries
    for name in os.listdir(in_dir):
        m = _DIR_RE.match(name)
        if not m:
            continue
        for method in os.listdir(os.path.join(in_dir, name)):
            path = os.path.join(in_dir, name, method, "metrics.json")
            if os.path.exists(path):
                with open(path) as f:
                    entries.append(
                        {
                            "dataset": m.group("dataset"),
                            "shots": int(m.group("shots")),
                            "seed": int(m.group("seed")),
                            "method": method,
                            "metrics": json.load(f),
                        }
                    )
    return entries


def aggregate_results(
    in_dir: str,
    metrics: Sequence[str] = tuple(METRIC_KEYS),
    seeds: Optional[Sequence[int]] = None,
    max_shots: int = 3,
) -> Dict[str, Dict]:
    """-> {method: {metric: {dataset: {shots: (mean, std, n)}}}}."""
    entries = _scan(in_dir)
    out: Dict[str, Dict] = {}
    for e in entries:
        if seeds is not None and e["seed"] not in seeds:
            continue
        for metric in metrics:
            if metric not in e["metrics"]:
                continue
            slot = (
                out.setdefault(e["method"], {})
                .setdefault(metric, {})
                .setdefault(e["dataset"], {})
                .setdefault(e["shots"], [])
            )
            slot.append(e["metrics"][metric])
    # reduce to (mean, std, n)
    for method in out.values():
        for metric in method.values():
            for dataset in metric.values():
                for shots, vals in list(dataset.items()):
                    arr = np.asarray(vals, dtype=np.float64)
                    std = float(np.std(arr, ddof=1)) if len(arr) > 1 else 0.0
                    dataset[shots] = (float(np.mean(arr)), std, len(arr))
    return out


def format_markdown_table(aggregated: Dict, method: str,
                          max_shots: int = 3) -> str:
    """mean(std) markdown tables, one section per metric (reference
    ``per_eval_method_read_result``)."""
    if method not in aggregated:
        return ""
    text = ""
    for metric, by_dataset in aggregated[method].items():
        datasets = sorted(by_dataset)
        text += f"## Metric: {metric}\n\n"
        text += "| shots | " + " | ".join(datasets) + " |\n"
        text += "|-------|" + "------------|" * len(datasets) + "\n"
        for shots in range(max_shots + 1):
            row = []
            for ds in datasets:
                if shots in by_dataset[ds]:
                    mean, std, _ = by_dataset[ds][shots]
                    row.append(f"{mean:.4f} ({std:.4f})")
                else:
                    row.append("n/a")
            text += f"|   {shots}   | " + " | ".join(row) + " |\n"
        text += "\n\n"
    return text


def write_reports(in_dir: str, out_dir: Optional[str] = None,
                  methods: Optional[Sequence[str]] = None) -> List[str]:
    aggregated = aggregate_results(in_dir)
    out_dir = out_dir or os.path.join(in_dir, "results")
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for method in methods or sorted(aggregated):
        text = format_markdown_table(aggregated, method)
        if not text:
            continue
        path = os.path.join(out_dir, f"{os.path.basename(in_dir)}-{method}.md")
        with open(path, "w") as f:
            f.write(text)
        written.append(path)
    return written
