#!/usr/bin/env python
"""Full-system demo: generate data -> train a tiny translator -> evaluate
through the full pipeline (driver, extraction, IoU metrics).

Everything real except scale: a TINY decoder with a byte tokenizer
memorizes a small nl->sstl corpus, then the standard eval driver measures
it with the standard metrics.  Proves the end-to-end spine
(datagen -> prompts -> tokenize -> SFT -> checkpoint -> inference ->
extraction -> metrics) with no mocks.

    python scripts/demo_e2e.py [--steps 300] [--n 24]
"""

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


class ByteTokenizer:
    bos_token_id = 1
    eos_token_id = 2
    pad_token_id = 0

    def encode(self, text, add_special_tokens=True):
        ids = [3 + (b % 253) for b in text.encode("utf-8")]
        # inference-side encode must produce the bos the training rows start
        # with (HF tokenizers do this via add_special_tokens)
        return ([self.bos_token_id] + ids) if add_special_tokens else ids

    def decode(self, ids):
        return bytes((int(i) - 3) % 253 for i in ids if i > 2).decode(
            "utf-8", errors="ignore"
        )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)  # ~45 min on CPU; minutes on TPU
    p.add_argument("--n", type=int, default=24)
    args = p.parse_args()

    from pdec.data.generator import GeneratorConfig, render_example, sample_problem
    from pdec.data.pipeline import create_prompt, pack_sequences, tokenize_sft
    from pdec.infer.engine import InferenceEngine
    from pdec.models.config import ModelConfig
    from pdec.models.transformer import init_params
    from pdec.pipeline.evaluate import EvalDriver
    from pdec.train.optim import TrainConfig
    from pdec.train.sft import make_sft_step

    cfg = ModelConfig(vocab_size=256, d_model=128, n_layers=3, n_heads=4,
                      n_kv_heads=4, d_ff=256, max_seq=2048, dtype="float32")
    tok = ByteTokenizer()

    # 1. datagen (memorization-scale corpus)
    rng = random.Random(0)
    rows = [
        render_example(sample_problem(rng, GeneratorConfig("heat", 1, False)))
        for _ in range(args.n)
    ]
    print(f"[1/4] generated {len(rows)} nl->sstl examples")

    # 2. prompts -> tokens -> packed batches (the reference to_STL flow)
    prompts = create_prompt(rows, "to_STL")
    tokenized = tokenize_sft(prompts, tok)
    max_len = 1664  # byte-level sequences run ~1.3k tokens
    packed = pack_sequences(tokenized, max_len, tok.pad_token_id)
    print(f"[2/4] packed {packed['input_ids'].shape} tokens")

    # 3. SFT
    params = init_params(jax.random.PRNGKey(0), cfg)
    tcfg = TrainConfig(learning_rate=3e-3, warmup_steps=20,
                       total_steps=args.steps, grad_accum=1, weight_decay=0.0)
    init_fn, step_fn = make_sft_step(cfg, tcfg, train_lora=False)
    opt_state = init_fn(params, None)
    step = jax.jit(step_fn)
    ids = packed["input_ids"]
    labels = packed["labels"]
    nrow = ids.shape[0]
    per = min(8, nrow)
    first = last = None
    for i in range(args.steps):
        sel = np.random.default_rng(i).choice(nrow, per, replace=False)
        batch = {"input_ids": ids[sel][None], "labels": labels[sel][None]}
        params, _, opt_state, metrics = step(params, None, opt_state, batch)
        loss = float(metrics["loss"])
        if first is None:
            first = loss
        last = loss
        if i % 50 == 0:
            print(f"    step {i}: loss {loss:.4f}")
    print(f"[3/4] trained: loss {first:.3f} -> {last:.3f}")

    # 3b. direct generation with the TRAIN-side prompt (memorization check;
    # the standard eval prompt differs from the train prompt for to_STL in
    # the reference too — few_shot_test.py adds a "Spatial Signal Temporal
    # Logic:" preamble the train format lacks — so a toy byte model only
    # regurgitates under the exact train format)
    from pdec.data.prompts import format_train_prompt
    from pdec.eval.extraction import extract_sstl_answer
    from pdec.infer.engine import GenerationConfig

    engine = InferenceEngine(params, cfg, tok, max_len=max_len)
    # the train prompt up to the open fence:
    train_prompts = []
    for r in rows[:4]:
        full = format_train_prompt("nl_to_sstl", nl=r["nl"], sstl="MARK")
        train_prompts.append(full.split("MARK")[0])
    gens = engine.generate(
        train_prompts, GenerationConfig(max_new_tokens=192, temperature=0.0)
    )
    exact = 0
    for r, g in zip(rows[:4], gens):
        pred = extract_sstl_answer(g.text)
        if pred.strip() == r["sstl"].strip():
            exact += 1
    print(f"[3b] train-format regurgitation: {exact}/4 exact sstl matches")
    assert exact >= 3, "end-to-end memorization failed"

    # 4. standard eval driver on the training problems
    driver = EvalDriver(
        {"translator": engine, "coder": engine, "controller": engine},
        temperature=0.0, max_new_tokens=192, eval_robustness=False,
    )
    res = driver.run(rows[:8], eval_method="to_STL", shots=0, seed=0)
    print("[4/4] eval metrics:", {
        k: round(v, 4) for k, v in res.metrics.items()
        if isinstance(v, float)
    })
    ious = [p.get("iou") for p in res.predictions]
    print("    per-example IoU:", ious)
    sample = res.predictions[0].get("predicted_sstl", "")[:110]
    print("    sample prediction:", sample)
    # NOTE: the driver's to_STL eval uses the TEST prompt format, which in
    # the reference too differs from the train format (adds a "Spatial
    # Signal Temporal Logic:" preamble) — a toy byte-level memorizer cannot
    # bridge that, so low IoU here is expected; [3b] is the spine check.
    ok = [v for v in ious if isinstance(v, float)]
    assert last < first * 0.2, "training failed to reduce loss"
    print("DEMO OK" + (f" (parse rate {len(ok)}/{len(ious)})" if ious else ""))


if __name__ == "__main__":
    main()
