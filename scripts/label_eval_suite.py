#!/usr/bin/env python
"""GT-label the committed eval suite in place (robustness + time keys).

Default mode labels any unlabeled dataset with the legacy procedure
(SynthesisConfig.high(), position-derived lane keys).

``--relabel-deterministic`` re-labels EVERY dataset with the CANONICAL
ORACLE the protocol metrics assume: the family's production synthesis
config plus content-derived per-problem salts
(``pdec.eval.robustness.program_salt``).  Rationale: the reference's
oracle is Gurobi — deterministic, so its ``robustness accuracy`` metric
(rel_tol=1e-3 vs the GT label) is a program-correctness check.  Under
position-derived keys our multi-start oracle re-solves the same program to
a different optimum depending on batch composition: byte-identical wave
programs reproduced their own GT label only ~5% of the time
(scripts/wave_defect_analysis.py, round 5).  Labels and eval scoring must
share one procedure; provenance is recorded in ``datasets/test/ORACLE.json``.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

from pdec.control.synthesis import SynthesisConfig  # noqa: E402
from pdec.eval.robustness import eval_robustness_batch  # noqa: E402

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                    "datasets", "test")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--relabel-deterministic", action="store_true",
                    help="re-label ALL datasets with the canonical oracle "
                         "(family-default config + content-derived salts)")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    det = args.relabel_deterministic
    for name in sorted(os.listdir(ROOT)):
        path = os.path.join(ROOT, name, "test.jsonl")
        if not os.path.exists(path):
            continue
        rows = [json.loads(l) for l in open(path) if l.strip()]
        if not det and rows and "robustness" in rows[0]:
            print(f"{name}: already labeled", flush=True)
            continue
        t0 = time.time()
        # canonical oracle: config=None -> SynthesisConfig.for_family per
        # program family, exactly what EvalDriver scoring uses
        results = eval_robustness_batch(
            [r["python"] for r in rows], key=jax.random.PRNGKey(0),
            config=None if det else SynthesisConfig.high(),
            bucket_granularity=320,
            deterministic_keys=det,
        )
        for r, (rob, rt) in zip(rows, results):
            r["robustness"] = rob
            r["time"] = rt
        with open(path, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        n_ok = sum(1 for r in rows if isinstance(r["robustness"], float))
        pos = sum(1 for r in rows
                  if isinstance(r["robustness"], float) and r["robustness"] > 0)
        print(f"{name}: labeled {n_ok}/{len(rows)} (feasible {pos}) in "
              f"{time.time()-t0:.0f}s", flush=True)

    if det:
        with open(os.path.join(ROOT, "ORACLE.json"), "w") as f:
            json.dump({
                "procedure": "deterministic",
                "config": "SynthesisConfig.for_family(kind)",
                "keys": "PRNGKey(0) fold_in program_salt(program)",
                "labeled_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                             time.gmtime()),
            }, f, indent=1)


if __name__ == "__main__":
    main()
