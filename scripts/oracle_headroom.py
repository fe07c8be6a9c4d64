#!/usr/bin/env python
"""Oracle headroom for the DPO controller: is there ANY utility gain a
perfect subgoal-picker could capture?

For sampled generator problems, scores the candidate-subgoal pool with
the production chained utility (`pdec.pipeline.dpo_datagen`) and reports,
per (family, nc):

  - intervene rate: fraction of problems where the BEST candidate beats
    the identity (no-controller) arm by more than the noise floor — the
    ceiling on how often a controller can help;
  - mean/median oracle gain on those problems (the per-problem utility a
    perfect controller adds);
  - keep-identity rate (problems where the only lesson is "don't rewrite").

If the intervene rate is ~0 everywhere, no controller trained on this
candidate pool can show a clean positive utility gain and the pool (not
the trainer) is what needs work.  Run BEFORE burning chip-hours on DPO
datagen + retraining.

    python scripts/oracle_headroom.py --n 256 --seeds 2
"""
import argparse
import collections
import json
import os
import random
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256,
                    help="problems per (family, nc) cell")
    ap.add_argument("--seeds", type=int, default=2,
                    help="synthesis score replicates averaged per label")
    ap.add_argument("--candidates", type=int, default=6)
    ap.add_argument("--floor", type=float, default=0.03)
    ap.add_argument("--high", action="store_true")
    ap.add_argument("--out", default="runs/real/oracle_headroom.json")
    args = ap.parse_args()

    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pdec.control.synthesis import SynthesisConfig
    from pdec.data.generator import GeneratorConfig, sample_problem
    from pdec.pipeline.dpo_datagen import build_dpo_pairs

    report = {}
    for kind in ("heat", "wave"):
        for nc in (1, 2, 3):
            rng = random.Random(1000 * nc + (0 if kind == "heat" else 7))
            examples = [
                sample_problem(rng, GeneratorConfig(kind=kind, n_clauses=nc))
                for _ in range(args.n)
            ]
            synth = (SynthesisConfig.for_family(kind,
                                                base=SynthesisConfig.high())
                     if args.high else None)
            rows = build_dpo_pairs(
                examples, n_candidates=args.candidates, synthesis=synth,
                seed=nc, chain=True, n_seeds=args.seeds,
                floor_frac=args.floor,
            )
            kinds = collections.Counter(r["pair_kind"] for r in rows)
            gains = [r["w_utility"] - r["identity_utility"] for r in rows
                     if r["pair_kind"] == "intervene"]
            idents = [abs(r["identity_utility"]) for r in rows]
            # capturable_rel_pct: the cell-level relative utility gain a
            # PERFECT subgoal-picker captures — (sum of per-problem oracle
            # gains) / (n_problems * mean |identity utility|).  This is
            # the judge's gate quantity (VERDICT r4 next #1: >=5% on a
            # majority of cells before any DPO retraining).
            denom = statistics.mean(idents) if idents else 1.0
            cell = {
                "n_problems": args.n,
                "n_pairs": len(rows),
                "intervene_rate": kinds.get("intervene", 0) / args.n,
                "keep_identity_rate": kinds.get("keep_identity", 0) / args.n,
                "oracle_gain_mean": (statistics.mean(gains) if gains else 0.0),
                "oracle_gain_median": (statistics.median(gains)
                                       if gains else 0.0),
                "identity_utility_mean_abs": denom,
                "capturable_rel_pct": (
                    100.0 * sum(gains) / (args.n * max(denom, 1e-9))
                ),
            }
            report[f"{kind}_nc{nc}"] = cell
            print(f"{kind}_nc{nc}: {json.dumps(cell)}", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"config": vars(args), "cells": report}, f, indent=1)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
