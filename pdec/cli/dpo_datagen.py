"""DPO preference-pair datagen CLI (the reference's DPO training data —
``datasets/unprocessed/dpo`` schema — is downloaded, never constructed
in-repo; this builds it from scratch with batched utility scoring).

    python -m pdec.cli.dpo_datagen --kind heat --nc 1 --n 256 \\
        --candidates 4 --out datasets/dpo_heat_nc1.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--kind", choices=["heat", "wave"], default="heat")
    p.add_argument("--nc", type=int, default=1, choices=[1, 2, 3])
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--candidates", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", required=True)
    p.add_argument("--batch", type=int, default=256,
                   help="problems per synthesis dispatch")
    p.add_argument("--no-chain", action="store_true",
                   help="score candidates with the plain (unchained) "
                        "utility instead of chained two-phase synthesis")
    p.add_argument("--score-seeds", type=int, default=1,
                   help="independent synthesis seeds averaged per utility "
                        "label (cuts multi-start label noise ~sqrt(k))")
    p.add_argument("--floor", type=float, default=0.05,
                   help="preference noise floor as a fraction of |utility| "
                        "(lower it when --score-seeds > 1)")
    p.add_argument("--high", action="store_true",
                   help="score with SynthesisConfig.high() (more starts + "
                        "iterations: lower-variance, nearer-optimal labels)")
    args = p.parse_args(argv)

    from pdec.control.synthesis import SynthesisConfig
    from pdec.data.generator import GeneratorConfig, sample_problem
    from pdec.pipeline.dpo_datagen import build_dpo_pairs

    rng = random.Random(args.seed)
    cfg = GeneratorConfig(kind=args.kind, n_clauses=args.nc)
    examples = [sample_problem(rng, cfg) for _ in range(args.n)]
    synth = (SynthesisConfig.for_family(args.kind, base=SynthesisConfig.high())
             if args.high else None)

    rows = []
    t0 = time.time()
    for i in range(0, len(examples), args.batch):
        rows.extend(
            build_dpo_pairs(
                examples[i : i + args.batch],
                n_candidates=args.candidates,
                synthesis=synth,
                seed=args.seed + i,
                chain=not args.no_chain,
                n_seeds=args.score_seeds,
                floor_frac=args.floor,
            )
        )
        done = min(i + args.batch, len(examples))
        rate = done * args.candidates / (time.time() - t0)
        print(f"scored {done}/{len(examples)} problems "
              f"({rate:.1f} candidate-solves/s)", file=sys.stderr, flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    print(f"wrote {len(rows)} preference pairs -> {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
