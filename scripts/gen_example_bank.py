#!/usr/bin/env python
"""Generate the in-repo few-shot example bank.

The reference ships a hand-curated bank
(``utils/few_shot_prompts/examples/**``); ours is produced by the synthetic
generator with a fixed seed so the bank is reproducible.  Three examples
per dataset (the prompt layer supports at most 3 shots).

Usage: python scripts/gen_example_bank.py
"""

import json
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pdec.data.generator import GeneratorConfig, render_example, sample_problem

OUT = os.path.join(os.path.dirname(__file__), "..", "pdec", "data", "examples")


def main():
    rng = random.Random(20260816)
    banks = {}
    for kind in ("heat", "wave"):
        rows = []
        for nc in (1, 2, 1):
            ex = sample_problem(rng, GeneratorConfig(kind=kind, n_clauses=nc,
                                                     allow_disjunction=False))
            rows.append(render_example(ex))
        banks[kind] = rows
    banks["combined"] = [banks["heat"][0], banks["wave"][0],
                         banks["heat"][1]]
    # DPO banks share the row schema; anchors are the NL problems
    for kind in ("heat", "wave", "combined"):
        banks[f"DPO_{kind}"] = banks[kind]

    for name, rows in banks.items():
        d = os.path.join(OUT, name)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "examples.jsonl"), "w") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")
        desc = {
            "dataset": name,
            "n_examples": len(rows),
            "source": "pdec.data.generator seed=20260816",
        }
        with open(os.path.join(d, "dataset_description.json"), "w") as f:
            json.dump(desc, f, indent=2)
    print(f"wrote banks to {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
