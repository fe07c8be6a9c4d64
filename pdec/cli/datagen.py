"""Corpus generation CLI: sample problems, render triplets, label with
batched TPU synthesis.

Replaces the reference's unshipped generator + ``simulate_gt.py``
(one-Gurobi-call-at-a-time labeling, 300 s/example budget) with
whole-batch synthesis labeling.

Example (2M-sample scale is a matter of --n and wall clock):
    python -m pdec.cli.datagen --kind heat --nc 1 --n 512 \\
        --out datasets/heat_nc1.jsonl --label
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
    p.add_argument("--n", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", required=True)
    p.add_argument("--label", action="store_true",
                   help="label with GT robustness via batched synthesis")
    p.add_argument("--batch", type=int, default=1024,
                   help="synthesis batch size per device dispatch")
    p.add_argument("--no-disjunction", action="store_true")
    args = p.parse_args(argv)

    from pdec.data.generator import GeneratorConfig, render_example, sample_problem

    rng = random.Random(args.seed)
    cfg = GeneratorConfig(
        kind=args.kind, n_clauses=args.nc,
        allow_disjunction=not args.no_disjunction,
    )
    rows = []
    t0 = time.time()
    for _ in range(args.n):
        rows.append(render_example(sample_problem(rng, cfg)))
    print(f"generated {len(rows)} examples in {time.time()-t0:.1f}s",
          file=sys.stderr)

    if args.label:
        from pdec.pipeline.simulate import simulate_ground_truth

        labeled = []
        t0 = time.time()
        for i in range(0, len(rows), args.batch):
            chunk, _ = simulate_ground_truth(rows[i : i + args.batch])
            labeled.extend(chunk)
            done = len(labeled)
            rate = done / (time.time() - t0)
            print(f"labeled {done}/{len(rows)} ({rate:.1f} solves/s)",
                  file=sys.stderr)
        rows = labeled

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
