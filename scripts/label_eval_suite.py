#!/usr/bin/env python
"""GT-label the committed eval suite in place (robustness + time keys)."""
import json, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
from pdec.control.synthesis import SynthesisConfig
from pdec.eval.robustness import eval_robustness_batch

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "datasets", "test")

def main():
    cfg = SynthesisConfig.high()
    for name in sorted(os.listdir(ROOT)):
        path = os.path.join(ROOT, name, "test.jsonl")
        if not os.path.exists(path):
            continue
        rows = [json.loads(l) for l in open(path) if l.strip()]
        if rows and "robustness" in rows[0]:
            print(f"{name}: already labeled", flush=True)
            continue
        t0 = time.time()
        results = eval_robustness_batch(
            [r["python"] for r in rows], key=jax.random.PRNGKey(0),
            config=cfg, bucket_granularity=320,
        )
        for r, (rob, rt) in zip(rows, results):
            r["robustness"] = rob
            r["time"] = rt
        with open(path, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        n_ok = sum(1 for r in rows if isinstance(r["robustness"], float))
        pos = sum(1 for r in rows if isinstance(r["robustness"], float) and r["robustness"] > 0)
        print(f"{name}: labeled {n_ok}/{len(rows)} (feasible {pos}) in "
              f"{time.time()-t0:.0f}s", flush=True)

if __name__ == "__main__":
    main()
