#!/usr/bin/env python
"""Per-gate-reason realized-gain decomposition for the controller arm.

Pairs each full_pipeline example (treatment) with the no-controller
to_python_two_step arm (baseline) by (nl, repeat_id) and reports, per
serve-gate decision class: pair count, realized utility-gain mean/median,
and how many pairs produced the byte-identical coder program.  This is
the audit that located the round-5 b1 defect (identity examples at -0.34
mean gain <- coder prompt framing, commit dbf5bc8) and that verifies the
fix (same-program == n for every non-intervened class).

Usage: [ROOT=runs/real/eval] python scripts/gate_analysis.py [cell ...]
"""
import collections
import json
import os
import statistics
import sys


def num(x):
    try:
        v = float(x)
        return v if v == v else None
    except Exception:
        return None


def main():
    root = os.environ.get("ROOT", "runs/real/eval")
    cells = sys.argv[1:] or sorted(
        d for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d, "full_pipeline"))
    )
    for cell in cells:
        try:
            fp = [json.loads(l) for l in open(
                os.path.join(root, cell, "full_pipeline", "predictions.jsonl"))]
            base = [json.loads(l) for l in open(
                os.path.join(root, cell, "to_python_two_step",
                             "predictions.jsonl"))]
        except OSError:
            continue
        bmap = {(r["nl"], r.get("repeat_id", 0)): r for r in base}
        gains = collections.defaultdict(list)
        same = collections.defaultdict(int)
        for r in fp:
            b = bmap.get((r["nl"], r.get("repeat_id", 0)))
            if b is None:
                continue
            u_t, u_b = num(r.get("utility_chained")), num(b.get("utility_chained"))
            if u_t is None or u_b is None:
                continue
            reason = r.get("gate_reason", "?")
            gains[reason].append(u_t - u_b)
            if r.get("predicted_python") == b.get("predicted_python"):
                same[reason] += 1
        print(cell)
        for k, v in sorted(gains.items()):
            print(f"  {k:20s} n={len(v):5d} mean={statistics.mean(v):+9.4f} "
                  f"median={statistics.median(v):+8.4f} same-program={same[k]}")


if __name__ == "__main__":
    main()
