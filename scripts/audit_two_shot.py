#!/usr/bin/env python
"""Root-cause audit for the 2-shot < 0-shot robustness-accuracy anomaly
(round-3 VERDICT weak item #2; reference protocol uses few-shot prompts,
``infer_pdecontrol.sh:36-38``).

Hypothesis tested: at 2-shot the model copies DOMAIN PARAMETERS from the
few-shot examples instead of the input NL (in-context value binding
failure at small model scale), rather than any prompt-path defect
(truncation, scaffold).  The audit cross-checks every generated program's
``L = ...`` (rod length) against the rod length stated in that row's own
NL, per shots setting.

    python scripts/audit_two_shot.py runs/real/eval [runs/mid/eval ...]

Prompt-budget sanity (the other candidate explanation) is asserted by
tests/test_prompt_budget.py: the longest 2-shot prompt in the eval suite
fits the model's max_seq with generation headroom.
"""
import json
import glob
import os
import re
import sys


def param(code, name):
    m = re.search(rf"^{name} = (.+)$", code or "", re.M)
    return m.group(1).strip() if m else None


def audit(eval_dir):
    print(f"== {eval_dir}")
    for pred in sorted(glob.glob(
            os.path.join(eval_dir, "*_shots=*_seed=*", "*",
                         "predictions.jsonl"))):
        cell = "/".join(pred.split(os.sep)[-3:-1])
        rows = [json.loads(l) for l in open(pred)]
        wrong, tot = 0, 0
        for r in rows:
            m = re.search(r"(\d+) mm", r.get("nl", ""))
            lp = param(r.get("predicted_python"), "L")
            if not m or lp is None:
                continue
            tot += 1
            try:
                if abs(float(lp) - float(m.group(1))) > 1e-6:
                    wrong += 1
            except ValueError:
                wrong += 1
        if tot:
            print(f"  {cell}: wrong-L {wrong}/{tot} ({100*wrong/tot:.1f}%)")


if __name__ == "__main__":
    for d in (sys.argv[1:] or ["runs/real/eval"]):
        audit(d)
