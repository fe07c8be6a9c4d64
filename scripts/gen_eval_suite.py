#!/usr/bin/env python
"""Generate the standard eval suite: {heat,wave}_nc{1,2,3} x 512 examples
(the reference's test datasets are unshipped — SURVEY.md §0.1; this
recreates the layout at ``test/PDEcontrol/test_data``-equivalent scale).

    python scripts/gen_eval_suite.py [--n 512] [--out datasets/test] [--label]

``--label`` runs GT synthesis labeling on the available device.
"""

import argparse
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=512)
    p.add_argument("--out", default="datasets/test")
    p.add_argument("--label", action="store_true")
    args = p.parse_args()

    for kind in ("heat", "wave"):
        for nc in (1, 2, 3):
            name = f"{kind}_nc{nc}_{args.n}"
            out = os.path.join(args.out, name, "test.jsonl")
            cmd = [
                sys.executable, "-m", "pdec.cli.datagen",
                "--kind", kind, "--nc", str(nc), "--n", str(args.n),
                "--seed", str(1000 + nc + (0 if kind == "heat" else 100)),
                "--out", out,
            ]
            if args.label:
                cmd.append("--label")
            print("::", " ".join(cmd), flush=True)
            subprocess.run(cmd, check=True, cwd=os.path.dirname(HERE))


if __name__ == "__main__":
    main()
