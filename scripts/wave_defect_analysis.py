#!/usr/bin/env python
"""Wave coder defect-class analysis (VERDICT r4 weak #4 / next #6).

BASE wave robustness accuracy sits at 0.7-4.4% while heat reaches 31%.
"Accuracy" is the reference's ``is_correct`` (rel_tol=1e-3 closeness of the
predicted program's synthesized robustness to the GT label,
``eval_script.py:25-30``) — so a miss can come from

  A. the coder's PROGRAM being wrong (physics constants, spec numbers,
     structure), or
  B. the program being right but the stochastic multi-start synthesis
     landing >0.1% away from the GT label (a noise-floor artifact that no
     coder improvement can fix).

This script separates the two WITHOUT any device work: it parses each
predicted program and the dataset's GT program into typed structs
(``parse_fem_program`` — the same parser the metric engine executes) and
diffs them field by field.  Classes (first match wins):

  parse_fail        predicted program does not parse
  physics_mismatch  rod length / N / dt / T / material constants differ
  spec_structure    clause count or junction ops differ
  spec_numeric      clause windows/regions/profiles differ (>0.1% rel)
  exact_program     program setup and spec match the GT program -> any
                    accuracy miss on these is class B (synthesis noise)

Usage: python scripts/wave_defect_analysis.py [cell ...]
"""
import collections
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdec.stl.ast import formula_clauses  # noqa: E402
from pdec.stl.guard import _junction_ops  # noqa: E402
from pdec.stl.program import parse_fem_program  # noqa: E402


def _close(a, b, rel=1e-3):
    return math.isclose(a, b, rel_tol=rel, abs_tol=1e-9)


def _physics_equal(p, q):
    if p.kind != q.kind or p.n_elements != q.n_elements:
        return False
    for f in ("length", "dt", "t_final"):
        if not _close(getattr(p, f), getattr(q, f)):
            return False
    for f in ("g0", "g1"):
        a, b = getattr(p, f), getattr(q, f)
        if (a is None) != (b is None):
            return False
        if a is not None and not _close(a, b):
            return False
    for f in ("rho", "elastic"):
        a, b = getattr(p, f), getattr(q, f)
        for attr in ("outside", "inside", "lo", "hi"):
            x, y = getattr(a, attr), getattr(b, attr)
            if math.isinf(x) and math.isinf(y):
                continue
            if not _close(x, y):
                return False
    return True


def _spec_compare(f, g):
    if _junction_ops(f) != _junction_ops(g):
        return "spec_structure"
    cf, cg = formula_clauses(f), formula_clauses(g)
    if len(cf) != len(cg):
        return "spec_structure"
    for a, b in zip(cf, cg):
        if a.temporal_op != b.temporal_op or a.cmp != b.cmp:
            return "spec_structure"
        for attr in ("t0", "t1", "x0", "x1", "m", "b"):
            if not _close(getattr(a, attr), getattr(b, attr)):
                return "spec_numeric"
    return None


def classify(pred_code, gt_code):
    try:
        gt = parse_fem_program(gt_code)
    except Exception:
        return "gt_parse_fail"
    try:
        pr = parse_fem_program(pred_code)
    except Exception:
        return "parse_fail"
    if not _physics_equal(pr, gt):
        return "physics_mismatch"
    spec = _spec_compare(pr.formula, gt.formula)
    if spec:
        return spec
    return "exact_program"


def main():
    cells = sys.argv[1:] or [
        f"wave_nc{k}_512_shots={s}_seed=0" for k in (1, 2, 3) for s in (0, 2)
    ] + ["heat_nc1_512_shots=0_seed=0"]
    method = os.environ.get("METHOD", "to_python_two_step")
    root = os.environ.get("ROOT", "runs/real/eval")
    out = {}
    for cell in cells:
        ds = cell.split("_shots")[0]
        test_path = os.path.join("datasets", "test", ds, "test.jsonl")
        pred_path = os.path.join(root, cell, method, "predictions.jsonl")
        if not (os.path.exists(test_path) and os.path.exists(pred_path)):
            print(f"{cell}: missing files, skipped")
            continue
        gt_by_nl = {}
        for line in open(test_path):
            it = json.loads(line)
            gt_by_nl[it["nl"]] = it
        counts = collections.Counter()
        acc_by_class = collections.defaultdict(list)
        for line in open(pred_path):
            r = json.loads(line)
            it = gt_by_nl.get(r["nl"])
            if it is None:
                counts["no_gt_item"] += 1
                continue
            cls = classify(r.get("predicted_python", ""), it["python"])
            counts[cls] += 1
            gt_rob, rob = it.get("robustness"), r.get("robustness")
            if isinstance(gt_rob, (int, float)) and isinstance(rob, (int, float)):
                acc_by_class[cls].append(
                    float(math.isclose(rob, gt_rob, rel_tol=1e-3)))
        n = sum(counts.values())
        row = {
            "n": n,
            "classes": {k: round(v / n, 4) for k, v in counts.most_common()},
            "accuracy_by_class": {
                k: round(sum(v) / len(v), 4)
                for k, v in acc_by_class.items() if v
            },
        }
        out[cell] = row
        print(f"{cell} (n={n})")
        for k, v in counts.most_common():
            acc = row["accuracy_by_class"].get(k)
            print(f"  {k:18s} {v:5d} ({100*v/n:5.1f}%)"
                  + (f"  acc={acc:.3f}" if acc is not None else ""))
    path = os.path.join(root, "results", "wave_defect_classes.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
