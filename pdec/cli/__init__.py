"""Command-line entry points (the reference's L5 python CLIs + L6 bash).

    python -m pdec.cli.datagen    — synthesize a labeled corpus
                                    (replaces the unshipped generator +
                                    simulate_gt.py)
    python -m pdec.cli.train      — SFT / DPO training
                                    (train_finetune.py / train_dpo.py)
    python -m pdec.cli.evaluate   — eval driver sweep
                                    (run_1d_pdecontrol_eval_full.py +
                                    test_pdecontrol.sh)
    python -m pdec.cli.simulate   — GT-label an existing dataset
                                    (simulate_gt.py)
    python -m pdec.cli.dpo_datagen — DPO preference pairs via batched
                                    utility scoring
    python -m pdec.cli.aggregate  — markdown result tables (read_result.py)
    python -m pdec.cli.merge      — LoRA merge + HF export (merge_model.py)
"""
