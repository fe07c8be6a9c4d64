"""GT simulation CLI: label an existing dataset with robustness + time
(reference ``test/scripts/simulate_gt.sh`` -> ``simulate_gt.py``).

    python -m pdec.cli.simulate --data datasets/test/heat_nc1_512/test.jsonl \\
        [--out <path>] [--max-num-examples N] [--high-quality]
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", required=True)
    p.add_argument("--out", default=None, help="default: label in place")
    p.add_argument("--max-num-examples", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--high-quality", action="store_true",
                   help="SynthesisConfig.high() (GT-labeling grade)")
    p.add_argument("--bucket-granularity", type=int, default=320,
                   help="horizon bucket rounding (coarser = fewer compiles)")
    args = p.parse_args(argv)

    from pdec.control.synthesis import SynthesisConfig
    from pdec.pipeline.simulate import simulate_ground_truth

    rows = []
    with open(args.data) as f:
        for line in f:
            if line.strip():
                rows.append(json.loads(line))

    cfg = SynthesisConfig.high() if args.high_quality else SynthesisConfig()
    labeled, metrics = simulate_ground_truth(
        rows, synthesis=cfg, seed=args.seed,
        max_num_examples=args.max_num_examples,
        out_path=args.out or args.data,
    )
    print(json.dumps(metrics, indent=2))
    print(f"labeled {len(labeled)} rows -> {args.out or args.data}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
