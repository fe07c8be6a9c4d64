"""Sharded corpus generation + GT labeling — the pod-scale datagen driver.

The reference's 2M-sample corpus (``README.md:34``) was labeled one Gurobi
MILP at a time under 300 s timeouts (``simulate_gt.py:62-89``).  Here the
unit of work is a *shard*: a deterministic slice of the corpus that one
host generates and labels end-to-end with batched TPU synthesis.  Shards
are embarrassingly parallel — no collectives, no coordination beyond the
(seed, shard_id, n_shards) triple — so the scale-out story to a pod is
literally launching the same CLI on every host:

    # host i of N (e.g. via the pod launcher / mpirun / gnu parallel):
    python -m pdec.cli.datagen --total 2000000 --n-shards 256 \\
        --host-id $i --n-hosts $N --out-dir corpus/ --label

Each shard writes ``shard_{id:05d}.jsonl`` + ``metrics.{id}.json``; the
``--merge`` pass concatenates shards and aggregates the dataset-health
stats.  Shard contents depend only on (seed, shard_id), never on how many
hosts ran them, so a crashed host's shards can be re-run anywhere
(idempotent file-per-shard checkpointing = the fleet's failure recovery).

Family mixture per shard follows the reference's 6-dataset balance
(``run_training.sh:66``: heat/wave x nc1-3 at 0.05/0.22/0.23 each side).
"""

from __future__ import annotations

import json
import os
import random
import time
from typing import Dict, List, Optional, Sequence, Tuple

# reference SFT mixture: balance 0.05/0.22/0.23 per kind (run_training.sh:66)
FAMILY_MIX: Tuple[Tuple[str, int, float], ...] = (
    ("heat", 1, 0.05), ("heat", 2, 0.22), ("heat", 3, 0.23),
    ("wave", 1, 0.05), ("wave", 2, 0.22), ("wave", 3, 0.23),
)


def shard_spec(total: int, n_shards: int, shard_id: int) -> int:
    """Rows in this shard (first shards absorb the remainder)."""
    base, rem = divmod(total, n_shards)
    return base + (1 if shard_id < rem else 0)


def generate_shard(
    shard_id: int,
    n_shards: int,
    total: int,
    seed: int = 0,
    mix: Sequence[Tuple[str, int, float]] = FAMILY_MIX,
) -> List[Dict]:
    """Deterministic shard of (nl, sstl, python) rows.

    The RNG stream is keyed by (seed, shard_id) only — re-running a shard
    on any host reproduces it bit-for-bit.
    """
    from pdec.data.generator import (
        GeneratorConfig, render_example, sample_problem,
    )

    n = shard_spec(total, n_shards, shard_id)
    rng = random.Random(f"pdec-datagen:{seed}:{shard_id}")
    kinds = [m[:2] for m in mix]
    weights = [m[2] for m in mix]
    rows = []
    for _ in range(n):
        kind, nc = rng.choices(kinds, weights=weights, k=1)[0]
        ex = sample_problem(rng, GeneratorConfig(kind=kind, n_clauses=nc))
        row = render_example(ex)
        row["dataset_class"] = f"{kind}_nc{nc}"
        rows.append(row)
    return rows


def run_shard(
    shard_id: int,
    n_shards: int,
    total: int,
    out_dir: str,
    seed: int = 0,
    label: bool = True,
    batch: int = 2048,
    high_quality: bool = False,
    skip_existing: bool = True,
    log=print,
) -> Optional[Dict]:
    """Generate (+optionally GT-label) one shard; returns its metrics."""
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, f"shard_{shard_id:05d}.jsonl")
    metrics_path = os.path.join(out_dir, f"metrics.{shard_id}.json")
    if skip_existing and os.path.exists(out_path) and os.path.exists(metrics_path):
        with open(metrics_path) as f:
            existing = json.load(f)
        # A shard generated without --label has no "label_seconds"; when
        # labeling is requested, regenerate it labeled (rows are
        # deterministic in (seed, shard_id), so this only ADDS the GT
        # column) instead of skipping — `--shards 0-255 --label` then
        # resumes an unlabeled corpus in place.
        if not label or "label_seconds" in existing:
            log(f"shard {shard_id}: exists, skipping")
            return existing
        log(f"shard {shard_id}: exists unlabeled, relabeling")

    t0 = time.time()
    rows = generate_shard(shard_id, n_shards, total, seed=seed)
    gen_s = time.time() - t0
    metrics: Dict = {"shard_id": shard_id, "n_samples": len(rows),
                     "generate_seconds": round(gen_s, 2)}

    if label:
        from pdec.control.synthesis import SynthesisConfig
        from pdec.pipeline.simulate import simulate_ground_truth

        # None -> per-family shipped defaults inside eval_robustness_batch
        cfg = SynthesisConfig.high() if high_quality else None
        labeled: List[Dict] = []
        t0 = time.time()
        for i in range(0, len(rows), batch):
            chunk, _ = simulate_ground_truth(
                rows[i:i + batch], synthesis=cfg, seed=seed + shard_id
            )
            labeled.extend(chunk)
            rate = len(labeled) / max(time.time() - t0, 1e-9)
            log(f"shard {shard_id}: labeled {len(labeled)}/{len(rows)} "
                f"({rate:.1f} solves/s)")
        rows = labeled
        known = [r["robustness"] for r in rows
                 if isinstance(r["robustness"], float)]
        n = len(rows)
        metrics.update({
            "label_seconds": round(time.time() - t0, 2),
            "solves_per_sec": round(n / max(time.time() - t0, 1e-9), 2),
            "gt positive robustness rate":
                sum(1 for v in known if v > 0) / max(n, 1),
            "gt negative robustness rate":
                sum(1 for v in known if v <= 0) / max(n, 1),
            "gt failed robustness rate": (n - len(known)) / max(n, 1),
        })

    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    os.replace(tmp, out_path)  # atomic: a crash never leaves a torn shard
    with open(metrics_path, "w") as f:
        json.dump(metrics, f, indent=2)
    return metrics


def host_shards(n_shards: int, host_id: int, n_hosts: int) -> List[int]:
    """Static round-robin shard assignment for host ``host_id``."""
    return [s for s in range(n_shards) if s % n_hosts == host_id]


def merge_shards(out_dir: str, merged_name: str = "corpus.jsonl") -> Dict:
    """Concatenate all completed shards and aggregate the health stats."""
    shard_files = sorted(
        f for f in os.listdir(out_dir)
        if f.startswith("shard_") and f.endswith(".jsonl")
    )
    merged_path = os.path.join(out_dir, merged_name)
    n = 0
    per_class: Dict[str, int] = {}
    pos = known = 0
    with open(merged_path, "w") as out:
        for name in shard_files:
            with open(os.path.join(out_dir, name)) as f:
                for line in f:
                    if not line.strip():
                        continue
                    out.write(line)
                    row = json.loads(line)
                    n += 1
                    cls = row.get("dataset_class", "?")
                    per_class[cls] = per_class.get(cls, 0) + 1
                    rob = row.get("robustness")
                    if isinstance(rob, (int, float)) and rob != "failed":
                        known += 1
                        pos += 1 if rob > 0 else 0
    stats = {
        "n_samples": n,
        "n_shards": len(shard_files),
        "per_class": per_class,
        "gt positive robustness rate": pos / max(known, 1),
        "gt labeled rate": known / max(n, 1),
        "merged": merged_path,
    }
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(stats, f, indent=2)
    return stats
