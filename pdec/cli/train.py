"""Training CLI: SFT and DPO (reference ``run_training.sh`` /
``run_dpo_train.sh`` + ``train/train_finetune.py`` / ``train_dpo.py``).

    python -m pdec.cli.train --mode sft \\
        --data datasets/heat_nc1.jsonl datasets/wave_nc1.jsonl \\
        --balance 0.5 0.5 --total 128000 \\
        --base <hf-dir> --run-dir runs/sft \\
        [train.learning_rate=4e-5 ...]

Overrides use the dotted config syntax (pdec.runtime.config).
"""

from __future__ import annotations

import argparse
import json
import os
import random


def _load_rows(path):
    rows = []
    with open(path) as f:
        for line in f:
            if line.strip():
                rows.append(json.loads(line))
    return rows


def _batch_iterator(packed, micro_batch, grad_accum, seed):
    """Epoch-cycling iterator over [accum, micro, T] batches."""
    import numpy as np

    ids, labels = packed["input_ids"], packed["labels"]
    n = ids.shape[0]
    per_step = micro_batch * grad_accum
    rng = np.random.default_rng(seed)
    while True:
        order = rng.permutation(n)
        for i in range(0, n - per_step + 1, per_step):
            sel = order[i : i + per_step]
            yield {
                "input_ids": ids[sel].reshape(grad_accum, micro_batch, -1),
                "labels": labels[sel].reshape(grad_accum, micro_batch, -1),
            }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", choices=["sft", "dpo"], default="sft")
    p.add_argument("--data", nargs="+", required=True)
    p.add_argument("--balance", type=float, nargs="+", default=[1.0])
    p.add_argument("--total", type=int, default=None)
    p.add_argument("--base", required=True,
                   help="HF checkpoint dir, or preset name (e.g. TINY) for "
                        "random init")
    p.add_argument("--tokenizer", default=None,
                   help="NativeBPETokenizer json (pdec.cpp.tokenizer); "
                        "enables from-scratch presets on text data — the "
                        "preset's vocab_size is replaced by the tokenizer's")
    p.add_argument("--run-dir", default="runs/train")
    p.add_argument("--prompt-format", nargs="+", default=["to_STL"],
                   help="one or more train formats; with several, rows are "
                        "split round-robin (multi-format coder training)")
    p.add_argument("--max-len", type=int, default=4096)
    p.add_argument("--micro-batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--save-interval", type=int, default=500)
    p.add_argument("--backup-interval", type=int, default=100,
                   help="rotating crash-recovery checkpoint cadence; at "
                        "0.47B params each backup writes ~5.6 GB of f32 "
                        "state, so raise it for large presets")
    p.add_argument("--steps-per-dispatch", type=int, default=8,
                   help="lax.scan'd train steps per device dispatch; "
                        "amortizes the per-dispatch host round trip "
                        "(~0.2 s through a device tunnel) without changing "
                        "per-step metrics or checkpoint cadence")
    p.add_argument("--lora-rank", type=int, default=64)
    p.add_argument("--lora-alpha", type=float, default=256.0)
    p.add_argument("--full-finetune", action="store_true")
    p.add_argument("--init-from", default=None,
                   help="run dir of a previous training run; base params "
                        "are restored from its latest checkpoint "
                        "(weights-only) before training — the reference's "
                        "DPO-over-SFT flow, run_dpo_train.sh:12 starting "
                        "from the SFT translator checkpoint")
    p.add_argument("--mesh", type=int, nargs=3, default=None,
                   metavar=("DATA", "FSDP", "TP"))
    p.add_argument("overrides", nargs="*", help="config overrides a.b=c")
    args = p.parse_args(argv)

    import jax

    import pdec.models.config as model_configs
    from pdec.data.pipeline import (
        balance_datasets, create_prompt, create_prompt_dpo, pack_sequences,
        tokenize_dpo, tokenize_sft, pad_rows,
    )
    from pdec.models.lora import init_lora, lora_shardings
    from pdec.models.transformer import init_params, param_shardings
    from pdec.parallel.mesh import MeshConfig, make_mesh, shard_params
    from pdec.runtime.checkpoint import CheckpointManager
    from pdec.runtime.config import RunConfig, apply_overrides, save_config
    from pdec.runtime.logging import JsonlMetricSink, get_logger
    from pdec.train.dpo import make_dpo_step
    from pdec.train.loop import LoopConfig, resume_if_available, train_loop
    from pdec.train.optim import TrainConfig
    from pdec.train.sft import make_sft_step

    logger = get_logger("pdec.cli.train", log_dir=args.run_dir)
    cfg = apply_overrides(RunConfig(run_dir=args.run_dir), args.overrides)
    cfg = apply_overrides(cfg, [f"train.total_steps={args.steps}"])

    # ---- model -----------------------------------------------------------
    if hasattr(model_configs, args.base):
        import dataclasses as _dc

        model_cfg = getattr(model_configs, args.base)
        tokenizer = None
        if args.tokenizer:
            from pdec.cpp.tokenizer import NativeBPETokenizer

            tokenizer = NativeBPETokenizer.load(args.tokenizer)
            model_cfg = _dc.replace(model_cfg,
                                    vocab_size=tokenizer.vocab_size)
        params = init_params(jax.random.PRNGKey(0), model_cfg)
    else:
        from transformers import AutoTokenizer

        from pdec.models.hf_import import load_hf_checkpoint

        model_cfg, params = load_hf_checkpoint(args.base)
        tokenizer = AutoTokenizer.from_pretrained(args.base)
    if tokenizer is None:
        raise SystemExit("random-init presets need --tokenizer (native BPE "
                         "json) for text data; or use an HF --base")

    # serialized config is the run's source of truth: record the RESOLVED
    # model identity (the default ModelSpec.preset must never leak into a
    # run trained with a different --base)
    cfg = apply_overrides(cfg, [
        f"mode={args.mode}",
        f"model.preset={args.base}",
        f"model.lora_rank={args.lora_rank}",
        f"model.lora_alpha={args.lora_alpha}",
        f"data.max_len={args.max_len}",
        f"save_interval={args.save_interval}",
    ])
    if args.init_from:
        cfg = apply_overrides(cfg, [f"model.checkpoint={args.init_from}"])
    save_config(cfg)
    resolved = {
        "base": args.base, "mode": args.mode,
        "model_dims": {
            "n_layers": model_cfg.n_layers, "d_model": model_cfg.d_model,
            "n_heads": model_cfg.n_heads, "d_ff": model_cfg.d_ff,
            "vocab_size": model_cfg.vocab_size,
        },
        "n_params": int(sum(
            v.size for v in jax.tree.leaves(params)
        )),
        "tokenizer": args.tokenizer,
        "data": list(args.data),
        "prompt_formats": list(args.prompt_format),
        "full_finetune": bool(args.full_finetune),
        "micro_batch": args.micro_batch,
        "steps": args.steps,
    }
    with open(os.path.join(args.run_dir, "resolved_model.json"), "w") as f:
        json.dump(resolved, f, indent=2)
    logger.info("resolved model: %s", resolved)

    if args.init_from:
        src = CheckpointManager(args.init_from)
        latest = src.find_latest()
        if latest is None:
            raise SystemExit(f"--init-from {args.init_from}: no checkpoint")
        params = src.restore_params(latest, params)
        logger.info("initialized params from %s", latest)

    # ---- mesh ------------------------------------------------------------
    if args.mesh:
        mesh = make_mesh(MeshConfig(*args.mesh))
    else:
        mesh = make_mesh(MeshConfig(data=1, fsdp=-1, tp=1))
    params = shard_params(params, param_shardings(model_cfg), mesh)

    # ---- data ------------------------------------------------------------
    seed = cfg.data.seed
    datasets = [_load_rows(path) for path in args.data]
    for rows in datasets:
        random.Random(seed).shuffle(rows)
    datasets = balance_datasets(datasets, args.balance, args.total, seed=seed)
    rows = [r for ds in datasets for r in ds]
    random.Random(seed).shuffle(rows)
    logger.info("training rows: %d", len(rows))

    train_cfg = cfg.train
    if args.mode == "sft":
        fmts = args.prompt_format
        prompts = []
        for k, fmt in enumerate(fmts):
            prompts.extend(create_prompt(rows[k::len(fmts)], fmt))
        tokenized = tokenize_sft(prompts, tokenizer)
        packed = pack_sequences(
            tokenized, args.max_len, tokenizer.pad_token_id or 0
        )
        batches = _batch_iterator(
            packed, args.micro_batch, train_cfg.grad_accum, seed
        )
        lora = (
            None if args.full_finetune
            else shard_params(
                init_lora(jax.random.PRNGKey(1), model_cfg,
                          rank=args.lora_rank, alpha=args.lora_alpha),
                lora_shardings(
                    init_lora(jax.random.PRNGKey(1), model_cfg,
                              rank=args.lora_rank, alpha=args.lora_alpha)
                ),
                mesh,
            )
        )
        init_fn, step_fn = make_sft_step(
            model_cfg, train_cfg, train_lora=not args.full_finetune
        )
        state = {"params": params, "lora": lora,
                 "opt_state": init_fn(params, lora)}
    else:
        import numpy as np

        triplets = create_prompt_dpo(rows)
        tokenized = tokenize_dpo(triplets, tokenizer)
        # build [accum, micro, T] padded chosen/rejected batches
        pairs = []
        for t in tokenized:
            c = t["prompt_input_ids"] + t["chosen_input_ids"]
            r = t["prompt_input_ids"] + t["rejected_input_ids"]
            mask_len = len(t["prompt_input_ids"])
            pairs.append((c, r, mask_len))

        def dpo_batches():
            rng = np.random.default_rng(seed)
            micro, accum = args.micro_batch, train_cfg.grad_accum
            per = micro * accum
            while True:
                order = rng.permutation(len(pairs))
                for i in range(0, len(pairs) - per + 1, per):
                    sel = [pairs[j] for j in order[i : i + per]]
                    t_max = args.max_len

                    def pad_batch(seqs, mask_lens):
                        ids = np.zeros((len(seqs), t_max), np.int32)
                        labels = np.full((len(seqs), t_max), -100, np.int32)
                        for k, (s, ml) in enumerate(zip(seqs, mask_lens)):
                            s = s[:t_max]
                            ids[k, : len(s)] = s
                            labels[k, ml : len(s)] = s[ml:]
                        return (
                            ids.reshape(accum, micro, t_max),
                            labels.reshape(accum, micro, t_max),
                        )

                    ci, cl_ = pad_batch([s[0] for s in sel], [s[2] for s in sel])
                    ri, rl = pad_batch([s[1] for s in sel], [s[2] for s in sel])
                    yield {
                        "chosen_input_ids": ci, "chosen_labels": cl_,
                        "rejected_input_ids": ri, "rejected_labels": rl,
                    }

        batches = dpo_batches()
        policy = shard_params(
            init_lora(jax.random.PRNGKey(1), model_cfg, rank=args.lora_rank,
                      alpha=args.lora_alpha),
            lora_shardings(
                init_lora(jax.random.PRNGKey(1), model_cfg,
                          rank=args.lora_rank, alpha=args.lora_alpha)
            ),
            mesh,
        )
        init_fn, dpo_step = make_dpo_step(model_cfg, train_cfg, cfg.dpo)

        def step_fn(params, lora, opt_state, batch):
            new_lora, opt_state, metrics = dpo_step(
                params, lora, None, opt_state, batch
            )
            return params, new_lora, opt_state, metrics

        state = {"params": params, "lora": policy,
                 "opt_state": init_fn(policy)}

    # ---- loop ------------------------------------------------------------
    from pdec.train.optim import cosine_schedule

    ckpt = CheckpointManager(args.run_dir, save_interval=args.save_interval)
    state, start = resume_if_available(ckpt, state)
    sink = JsonlMetricSink(args.run_dir)
    with mesh:
        train_loop(
            step_fn, state, batches,
            LoopConfig(total_steps=args.steps,
                       save_interval=args.save_interval,
                       backup_interval=args.backup_interval,
                       steps_per_dispatch=args.steps_per_dispatch),
            ckpt=ckpt, start_step=start,
            metric_sink=sink,
            lr_schedule=cosine_schedule(train_cfg),
        )
    sink.close()
    logger.info("training complete")


if __name__ == "__main__":
    main()
