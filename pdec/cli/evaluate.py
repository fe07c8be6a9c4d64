"""Evaluation CLI: datasets x methods x shots sweep.

The reference spreads this over ``run_testing.sh`` -> ``test_pdecontrol.sh``
-> ``infer_pdecontrol.sh`` -> the (unshipped) eval driver; here it is one
command:

    python -m pdec.cli.evaluate \\
        --datasets heat_nc1=datasets/heat_nc1.jsonl \\
        --methods to_python_no_STL to_STL \\
        --shots 0 2 --out runs/eval \\
        --coder <hf-dir> [--translator <hf-dir>] [--controller <hf-dir>]
"""

from __future__ import annotations

import argparse


def _load_engine(path: str, max_len: int):
    from transformers import AutoTokenizer

    from pdec.infer.engine import InferenceEngine
    from pdec.models.hf_import import load_hf_checkpoint

    cfg, params = load_hf_checkpoint(path)
    tokenizer = AutoTokenizer.from_pretrained(path)
    return InferenceEngine(params, cfg, tokenizer, max_len=max_len)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--datasets", nargs="+", required=True,
                   help="name=path pairs of test jsonl files")
    p.add_argument("--methods", nargs="+", default=["to_python_no_STL"])
    p.add_argument("--shots", type=int, nargs="+", default=[0, 2])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="runs/eval")
    p.add_argument("--coder", required=True, help="HF checkpoint dir")
    p.add_argument("--translator", default=None)
    p.add_argument("--controller", default=None)
    p.add_argument("--max-num-examples", type=int, default=512)
    p.add_argument("--max-len", type=int, default=4096)
    p.add_argument("--max-new-tokens", type=int, default=1024)
    p.add_argument("--temperature", type=float, default=0.2)
    p.add_argument("--n-repeat-sampling", type=int, default=3)
    p.add_argument("--prompt-dataset", default="combined")
    args = p.parse_args(argv)

    from pdec.pipeline.evaluate import EvalDriver
    from pdec.pipeline.sweep import run_sweep

    coder = _load_engine(args.coder, args.max_len)
    translator = (
        _load_engine(args.translator, args.max_len) if args.translator else coder
    )
    controller = (
        _load_engine(args.controller, args.max_len) if args.controller else coder
    )
    driver = EvalDriver(
        {"translator": translator, "coder": coder, "controller": controller},
        prompt_dataset=args.prompt_dataset,
        temperature=args.temperature,
        max_new_tokens=args.max_new_tokens,
        n_repeat_sampling=args.n_repeat_sampling,
    )
    dataset_paths = dict(kv.split("=", 1) for kv in args.datasets)
    _, failed = run_sweep(
        driver, dataset_paths, args.methods, args.shots, args.seed,
        out_dir=args.out, max_num_examples=args.max_num_examples,
    )
    if failed:
        raise SystemExit(1)  # partial sweeps must be visible to callers


if __name__ == "__main__":
    main()
