"""End-to-end real-model run: corpus -> tokenizer -> train -> eval -> tables.

The reference's spine at real scale (``run_training.sh`` + ``run_testing.sh``
+ ``run_dpo_train.sh``) executed in-repo: generate a corpus with the datagen
fleet, train the native BPE tokenizer on it, train translator and coder
models from scratch, DPO-train a controller on utility-scored preference
pairs (starting from the translator checkpoint, the reference's
DPO-over-SFT flow), then run the reference eval protocol over the committed
6x512 test suite (0/2-shot, temperature 0.2 — ``test_pdecontrol.sh:29-36``)
and aggregate the 15-metric tables.  Stages are idempotent; artifacts land
under ``--root`` (default runs/real).

    python scripts/real_run.py all            # everything, in order
    python scripts/real_run.py corpus|tokenizer|train|dpo_data|dpo|eval|aggregate

Smoke mode (CI-sized, CPU): --preset TINY --corpus-n 512 --steps 20
--eval-max 4 --vocab 512
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ROLES = {
    # role -> training prompt formats (reference tokenize_data.py:156-162)
    "translator": ["to_STL"],
    "coder": ["to_python_no_STL", "to_python_GT_STL"],
}
# opt-in roles, trained only when named via --role (a generic small
# domain LM over every SFT format: the DRAFT model for speculative
# decoding; pass --role-preset draft=TINY at train AND eval time)
OPTIONAL_ROLES = {
    "draft": ["to_STL", "to_python_no_STL", "to_python_GT_STL"],
}
EVAL_METHODS = ["to_STL", "to_python_no_STL", "to_python_two_step"]
DATASETS = ["heat_nc1_512", "heat_nc2_512", "heat_nc3_512",
            "wave_nc1_512", "wave_nc2_512", "wave_nc3_512"]


def stage_corpus(args):
    from pdec.pipeline.datagen_fleet import merge_shards, run_shard

    out = os.path.join(args.root, "corpus")
    n_shards = max(1, args.corpus_n // 8192)
    for s in range(n_shards):
        run_shard(s, n_shards, args.corpus_n, out, seed=args.seed,
                  label=False)
    stats = merge_shards(out)
    print(json.dumps(stats, indent=2))


def _corpus_path(args):
    return os.path.join(args.root, "corpus", "corpus.jsonl")


def _tok_path(args):
    return os.path.join(args.root, "tokenizer.json")


def stage_tokenizer(args):
    from pdec.cpp.tokenizer import NativeBPETokenizer
    from pdec.data.prompts import format_train_prompt

    rows = [json.loads(l) for l in open(_corpus_path(args)) if l.strip()]
    texts = []
    for r in rows[:20000]:
        texts.append(format_train_prompt(
            "train_nl_and_sstl_to_python", r["nl"], r["sstl"], r["python"]
        ) + r["python"])
    tok = NativeBPETokenizer.train(texts, vocab_size=args.vocab)
    tok.save(_tok_path(args))
    sample = texts[0][:200]
    assert tok.decode(tok.encode(sample, add_special_tokens=False)) == sample
    print(f"tokenizer: vocab {tok.vocab_size} -> {_tok_path(args)}")


def stage_train(args, roles=None):
    from pdec.cli.train import main as train_main

    for role in roles or ROLES:
        run_dir = os.path.join(args.root, role)
        formats = ROLES.get(role) or OPTIONAL_ROLES[role]
        argv = [
            "--mode", "sft",
            "--data", _corpus_path(args),
            "--base", _role_preset(args, role),
            "--tokenizer", _tok_path(args),
            "--run-dir", run_dir,
            "--prompt-format", *formats,
            "--max-len", str(args.max_len),
            "--micro-batch", str(args.micro_batch),
            "--steps", str(args.steps),
            "--save-interval", str(max(args.steps // 3, 1)),
            "--backup-interval", str(args.backup_interval),
            "--full-finetune",
            f"train.learning_rate={args.lr}",
            f"train.grad_accum={args.grad_accum}",
            f"train.warmup_steps={min(50, max(args.steps // 10, 1))}",
        ]
        print(f"== training {role}: {' '.join(argv)}", flush=True)
        train_main(argv)


def _dpo_data_path(args):
    return os.path.join(args.root, "dpo_pairs.jsonl")


def stage_dpo_data(args):
    """Utility-scored preference pairs for controller DPO training
    (reference DPO dataset schema, ``loader.py:265``; pairs built from
    scratch with batched synthesis — see pdec.pipeline.dpo_datagen)."""
    from pdec.cli.dpo_datagen import main as dpo_datagen_main

    out = _dpo_data_path(args)
    if os.path.exists(out):
        print(f"dpo_data: {out} exists, skipping")
        return
    tmp_paths = []
    per_family = max(args.dpo_n // 6, 8)
    for kind in ("heat", "wave"):
        for nc in (1, 2, 3):
            path = os.path.join(args.root, f"dpo_{kind}_nc{nc}.jsonl")
            if not os.path.exists(path):
                dpo_datagen_main([
                    "--kind", kind, "--nc", str(nc),
                    "--n", str(per_family), "--candidates", "4",
                    "--seed", str(args.seed), "--out", path,
                ])
            tmp_paths.append(path)
    with open(out, "w") as f:
        for path in tmp_paths:
            with open(path) as g:
                f.write(g.read())
    n = sum(1 for _ in open(out))
    print(f"dpo_data: {n} preference pairs -> {out}")


def stage_dpo(args):
    """DPO-train the controller: policy LoRA over the SFT translator
    checkpoint (reference ``run_dpo_train.sh:12-16``, 2-adapter design)."""
    from pdec.cli.train import main as train_main

    run_dir = os.path.join(args.root, "controller")
    argv = [
        "--mode", "dpo",
        "--data", _dpo_data_path(args),
        "--base", args.preset,
        "--tokenizer", _tok_path(args),
        "--init-from", os.path.join(args.root, "translator"),
        "--run-dir", run_dir,
        "--max-len", str(args.max_len),
        "--micro-batch", str(max(args.micro_batch // 8, 1)),
        "--steps", str(args.dpo_steps),
        "--save-interval", str(max(args.dpo_steps // 3, 1)),
        "--backup-interval", str(args.backup_interval),
        "--lora-rank", "32", "--lora-alpha", "64",
        f"train.learning_rate={args.lr / 10}",
        "train.grad_accum=8",
        f"train.warmup_steps={min(50, max(args.dpo_steps // 10, 1))}",
    ]
    print(f"== training controller (dpo): {' '.join(argv)}", flush=True)
    train_main(argv)


def _role_preset(args, role):
    """Per-role preset override (``--role-preset translator=MID``), falling
    back to ``--preset``; lets a MID translator serve next to a BASE coder."""
    for spec in args.role_preset or []:
        name, _, preset = spec.partition("=")
        if name == role:
            return preset
    return args.preset


def _load_role(args, role):
    import dataclasses

    import pdec.models.config as model_configs
    from pdec.cpp.tokenizer import NativeBPETokenizer
    from pdec.runtime.checkpoint import CheckpointManager

    tok = NativeBPETokenizer.load(_tok_path(args))
    cfg = dataclasses.replace(
        getattr(model_configs, _role_preset(args, role)),
        vocab_size=tok.vocab_size,
    )
    # restore_weights is template-free: no throwaway random init needed
    role_dir = os.path.join(args.root, role)
    for spec in args.role_dir or []:
        name, _, path = spec.partition("=")
        if name == role:
            role_dir = path
    ckpt = CheckpointManager(role_dir)
    latest = ckpt.find_latest()
    if latest is None:
        raise SystemExit(f"no checkpoint for {role} under {args.root}")
    weights = ckpt.restore_weights(latest)
    restored = weights["params"]
    if role == "controller" and weights.get("lora") is not None:
        # DPO checkpoint: frozen SFT base + policy LoRA -> serve merged
        # (reference merge_model.py before vLLM serving)
        from pdec.models.lora import merge_lora

        restored = merge_lora(restored, weights["lora"])
    print(f"{role}: restored {latest}")
    return restored, cfg, tok


def stage_eval(args):
    from pdec.infer.engine import InferenceEngine
    from pdec.infer.sharded import ShardedEngine
    from pdec.parallel.mesh import MeshConfig, make_mesh
    from pdec.pipeline.evaluate import EvalDriver
    from pdec.pipeline.sweep import run_sweep

    roles = list(ROLES)
    methods = list(args.methods)
    controller_dir = os.path.join(args.root, "controller")
    for spec in args.role_dir or []:
        name, _, path = spec.partition("=")
        if name == "controller":
            controller_dir = path
    # the controller is an optional role: load it only when a usable
    # checkpoint exists AND a controller method will actually run (an
    # explicit --methods without full_pipeline/reasoning_only must not
    # fail on a missing/uncommitted controller checkpoint)
    controller_methods = ("full_pipeline", "reasoning_only")
    from pdec.runtime.checkpoint import CheckpointManager

    has_controller = (
        os.path.isdir(controller_dir)
        and CheckpointManager(controller_dir).find_latest() is not None
    )
    if has_controller:
        # augment the DEFAULT method list with the controller methods; an
        # explicit --methods selection (e.g. the phased round-3 sweep) is
        # honored verbatim
        if args.methods == EVAL_METHODS:
            for m in controller_methods:
                if m not in methods:
                    methods.append(m)
        if any(m in controller_methods for m in methods):
            roles.append("controller")
    elif any(m in controller_methods for m in methods):
        raise SystemExit(
            f"methods {methods} need a controller checkpoint, none under "
            f"{controller_dir}")
    engines = {}
    draft = None
    if args.speculative:
        from pdec.infer.speculative import SpeculativeEngine

        dparams, dcfg, _ = _load_role(args, "draft")
        draft = (dparams, dcfg)
    # on-device chunked decode (lax.scan, 32 steps/dispatch) instead of
    # the per-token host loop: through the device tunnel the host loop
    # pays a dispatch + transfer round trip per token (~10x slower)
    mesh = None if args.host_loop else make_mesh(MeshConfig())
    for role in roles:
        params, cfg, tok = _load_role(args, role)
        if draft is not None and mesh is not None:
            from pdec.infer.speculative import SpeculativeEngine

            engines[role] = SpeculativeEngine(
                params, cfg, draft[0], draft[1], tok, mesh,
                k=args.spec_k, max_len=args.max_len,
            )
        elif mesh is None:
            engines[role] = InferenceEngine(params, cfg, tok,
                                            max_len=args.max_len)
        else:
            engines[role] = ShardedEngine(params, cfg, tok, mesh,
                                          max_len=args.max_len)
    driver = EvalDriver(
        engines,
        temperature=args.temperature,
        max_new_tokens=args.max_new_tokens,
        n_repeat_sampling=args.repeats,
        # from-scratch models must see their exact training prompt format
        # (the reference's nl_to_sstl test scaffold diverges from train)
        train_style_prompts=not args.reference_prompts,
        matched_shots=args.matched_shots,
        deterministic_keys=args.deterministic_keys,
    )
    dataset_paths = {
        name: os.path.join("datasets", "test", name, "test.jsonl")
        for name in args.datasets
    }
    out_dir = os.path.join(args.root, "eval")
    _, failed = run_sweep(
        driver, dataset_paths, methods, shots_list=args.shots,
        seed=args.seed, out_dir=out_dir,
        max_num_examples=args.eval_max,
        # after retraining a role, --force-eval must invalidate the combo
        # cache or stale metrics.json would be silently re-served
        skip_existing_scores=not args.force_eval,
    )
    if failed:
        # exit nonzero so orchestration-level fallbacks fire (the MID
        # sweep's "|| rerun without --speculative" depended on this; with
        # exit 0 the per-combo failure tolerance silently ate the OOMs)
        sys.exit(1)


def stage_rescore(args):
    """Recompute metrics (incl. chained utility) from cached predictions.

    No generation: every combo with a ``predictions.jsonl`` is re-run
    through the metric pass via ``EvalDriver.run(load_from_file=True)``,
    which adds per-prediction ``utility_chained`` and the
    ``"utility chained"`` metric without touching the decoded text.  Lets
    already-swept cells pick up metric upgrades at synthesis cost only."""
    from pdec.pipeline.evaluate import EvalDriver
    from pdec.pipeline.sweep import load_jsonl

    driver = EvalDriver(
        {},  # no engines: load_from_file never generates
        temperature=args.temperature,
        n_repeat_sampling=args.repeats,
        train_style_prompts=not args.reference_prompts,
        deterministic_keys=args.deterministic_keys,
    )
    out_dir = os.path.join(args.root, "eval")
    for name in args.datasets:
        items = load_jsonl(
            os.path.join("datasets", "test", name, "test.jsonl"),
            args.eval_max,
        )
        for shots in args.shots:
            methods = args.methods
            if args.methods == EVAL_METHODS:
                # default selection: rescore every method that actually
                # has cached predictions for this combo (EVAL_METHODS
                # omits the controller methods, but their cached cells
                # must pick up metric/oracle upgrades too)
                combo_dir = os.path.join(
                    out_dir, f"{name}_shots={shots}_seed={args.seed}")
                if os.path.isdir(combo_dir):
                    methods = sorted(os.listdir(combo_dir))
            for method in methods:
                run_dir = os.path.join(
                    out_dir, f"{name}_shots={shots}_seed={args.seed}", method
                )
                if not os.path.exists(
                    os.path.join(run_dir, "predictions.jsonl")
                ):
                    continue
                print(f"rescore: {name} {method} shots={shots}", flush=True)
                driver.run(
                    items, eval_method=method, shots=shots, seed=args.seed,
                    dataset_name=name, out_dir=out_dir,
                    load_from_file=True,
                )


def stage_aggregate(args):
    from pdec.pipeline.aggregate import write_reports

    out_dir = os.path.join(args.root, "eval")
    for path in write_reports(out_dir):
        print(f"==== {path} ====")
        print(open(path).read())


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("stage", choices=["all", "corpus", "tokenizer", "train",
                                     "dpo_data", "dpo", "eval", "rescore",
                                     "aggregate"])
    p.add_argument("--root", default="runs/real")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--preset", default="BASE")
    p.add_argument("--corpus-n", type=int, default=65536)
    p.add_argument("--vocab", type=int, default=8192)
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--dpo-n", type=int, default=1536,
                   help="DPO datagen problems (4 candidates each)")
    p.add_argument("--dpo-steps", type=int, default=600)
    p.add_argument("--backup-interval", type=int, default=100,
                   help="crash-recovery checkpoint cadence; raise for "
                        "large presets (a 0.47B f32 backup is ~5.6 GB)")
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--micro-batch", type=int, default=8)
    p.add_argument("--grad-accum", type=int, default=4)
    p.add_argument("--max-len", type=int, default=1024)
    p.add_argument("--max-new-tokens", type=int, default=512)
    p.add_argument("--temperature", type=float, default=0.2)
    p.add_argument("--repeats", type=int, default=1)
    p.add_argument("--eval-max", type=int, default=512)
    p.add_argument("--shots", type=int, nargs="+", default=[0, 2])
    p.add_argument("--methods", nargs="+", default=EVAL_METHODS)
    p.add_argument("--datasets", nargs="+", default=DATASETS)
    p.add_argument("--role", nargs="+", default=None,
                   help="train only these roles")
    p.add_argument("--role-preset", nargs="+", default=None,
                   metavar="ROLE=PRESET",
                   help="per-role model preset override for eval loading")
    p.add_argument("--role-dir", nargs="+", default=None,
                   metavar="ROLE=DIR",
                   help="per-role checkpoint dir override for eval loading")
    p.add_argument("--force-eval", action="store_true",
                   help="re-evaluate combos even when metrics.json exists")
    p.add_argument("--speculative", action="store_true",
                   help="serve eval generation through draft-verify "
                        "speculative decoding (requires a trained 'draft' "
                        "role; pass --role-preset draft=<PRESET>)")
    p.add_argument("--spec-k", type=int, default=4,
                   help="draft tokens proposed per speculative step")
    p.add_argument("--host-loop", action="store_true",
                   help="eval with the per-token host-loop engine instead "
                        "of the on-device chunked decoder")
    p.add_argument("--reference-prompts", action="store_true",
                   help="use the reference's test-side prompt scaffold "
                        "verbatim (for imported pretrained checkpoints)")
    p.add_argument("--deterministic-keys", action="store_true",
                   help="content-derived per-problem synthesis salts: the "
                        "robustness oracle becomes batch-invariant and "
                        "reproducible (Gurobi-like); use with GT labels "
                        "produced under the same oracle procedure")
    p.add_argument("--matched-shots", action="store_true",
                   help="generate few-shot examples per query with the "
                        "query's own physics parameters (mitigates the "
                        "measured 2-shot parameter-copying defect)")
    args = p.parse_args(argv)

    os.makedirs(args.root, exist_ok=True)
    stages = (["corpus", "tokenizer", "train", "dpo_data", "dpo", "eval",
               "aggregate"]
              if args.stage == "all" else [args.stage])
    for s in stages:
        if s == "train":
            stage_train(args, roles=args.role)
        else:
            globals()[f"stage_{s}"](args)


if __name__ == "__main__":
    main()
