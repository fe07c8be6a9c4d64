"""Aggregate corpus-fleet shard metrics into one committed STATS.json.

Reads the per-shard ``metrics.N.json`` files (and, for labeled shards, the
shard rows themselves) without materializing the multi-GB merged corpus —
the merged file is regenerable via ``pdec.cli.datagen --merge``.

    python scripts/corpus_stats.py runs/corpus2m
"""
import glob
import json
import os
import sys


def main(out_dir: str) -> None:
    shard_metrics = []
    for path in sorted(glob.glob(os.path.join(out_dir, "metrics.*.json"))):
        with open(path) as f:
            shard_metrics.append(json.load(f))

    n_rows = sum(m.get("n_samples", 0) for m in shard_metrics)
    labeled = [m for m in shard_metrics if "label_seconds" in m]
    n_labeled = sum(m.get("n_samples", 0) for m in labeled)
    label_s = sum(m.get("label_seconds", 0.0) for m in labeled)
    gen_s = sum(m.get("generate_seconds", 0.0) for m in shard_metrics)

    per_class = {}
    pos = neg = failed = 0
    for m in labeled:
        n = m.get("n_samples", 0)
        pos += m.get("gt positive robustness rate", 0.0) * n
        neg += m.get("gt negative robustness rate", 0.0) * n
        failed += m.get("gt failed robustness rate", 0.0) * n
    for path in sorted(glob.glob(os.path.join(out_dir, "shard_*.jsonl"))):
        with open(path) as f:
            for line in f:
                if not line.strip():
                    continue
                cls = json.loads(line).get("dataset_class", "?")
                per_class[cls] = per_class.get(cls, 0) + 1

    label_rate = n_labeled / max(label_s, 1e-9)
    stats = {
        "n_shards": len(shard_metrics),
        "n_rows": n_rows,
        "n_labeled": n_labeled,
        "generate_seconds_total": round(gen_s, 1),
        "label_seconds_total": round(label_s, 1),
        "label_solves_per_sec_per_chip": round(label_rate, 1),
        "gt_positive_rate": round(pos / max(n_labeled, 1), 4),
        "gt_negative_rate": round(neg / max(n_labeled, 1), 4),
        "gt_failed_rate": round(failed / max(n_labeled, 1), 4),
        "rows_per_class": dict(sorted(per_class.items())),
        # wall-clock extrapolation: full 2M-row GT labeling on a pod, using
        # the measured per-chip rate (fleet shards are embarrassingly
        # parallel across hosts/chips; see pdec/pipeline/datagen_fleet.py)
        "extrapolation": {
            "label_2M_single_chip_hours":
                round(2_000_000 / max(label_rate, 1e-9) / 3600, 2),
            "label_2M_v5e8_minutes":
                round(2_000_000 / max(label_rate, 1e-9) / 8 / 60, 1),
        },
    }
    out = os.path.join(out_dir, "STATS.json")
    with open(out, "w") as f:
        json.dump(stats, f, indent=2)
    print(json.dumps(stats, indent=2))
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "runs/corpus2m")
