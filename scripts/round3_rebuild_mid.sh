#!/bin/bash
# Round-3 MID (0.47B) family rebuild + protocol sweep, in cost order.
#
# MID checkpoints are not in git; this regenerates the family from the
# committed seeds/configs (corpus seed 0, committed tokenizer, 3000 SFT
# steps per role, the committed pairs_r3b.jsonl identity-pool DPO set)
# using the chunked-dispatch train loop, then sweeps the utility-gain
# method pair first (the paper's headline comparison) and the cheap
# methods after.  Every stage is idempotent and resumes after a drop.
set -uo pipefail
cd "$(dirname "$0")/.."

echo "=== [0/6] speculative-decoding chip measurement (BASE family) ==="
# ~10 min; validates speculative serving on-chip before the MID sweep
# leans on it (the image lacks /usr/bin/time, so the first attempt in
# round3_rebuild.sh stage 5 recorded nothing)
bash scripts/round3_spec_bench.sh runs/real BASE || echo "SPEC BENCH FAILED"

echo "=== [1/6] MID corpus (deterministic regen, seed 0) ==="
if [ ! -f runs/mid/corpus/corpus.jsonl ]; then
  python scripts/real_run.py corpus --root runs/mid --corpus-n 131072
fi

echo "=== [2/5] SFT translator + coder (MID, 3000 steps each) ==="
for role in translator coder; do
  if [ -z "$(ls runs/mid/$role/checkpoint-step-3000 2>/dev/null)" ]; then
    python scripts/real_run.py train --root runs/mid --preset MID \
      --role "$role" --backup-interval 500
  fi
done

echo "=== [3/6] controller DPO on the committed identity-pool pairs ==="
if [ -z "$(ls runs/mid/controller/checkpoint-step-1998 2>/dev/null)" ]; then
  cp datasets/dpo/pairs_r3b.jsonl runs/mid/dpo_pairs.jsonl
  python scripts/real_run.py dpo --root runs/mid --preset MID \
    --dpo-steps 2000 --backup-interval 500
fi

echo "=== [4/6] DRAFT model for speculative serving (7.4M, minutes) ==="
if [ -z "$(ls runs/mid/draft/checkpoint-* 2>/dev/null)" ]; then
  python scripts/real_run.py train --root runs/mid --role draft \
    --role-preset draft=DRAFT --steps 1500 || echo "DRAFT TRAIN FAILED"
fi

# MID decode dominates the sweep cost (0.47B vs the 57M BASE); serve
# speculatively (exact target distribution — Leviathan acceptance), and
# fall back to plain decode per method if the speculative pass fails.
# The per-combo metrics cache makes the fallback resume, not redo.
sweep() {
  local m="$1"
  python scripts/real_run.py eval --root runs/mid --preset MID \
    --repeats 3 --eval-max 512 --methods "$m" \
    --speculative --role-preset draft=DRAFT \
    || python scripts/real_run.py eval --root runs/mid --preset MID \
         --repeats 3 --eval-max 512 --methods "$m" \
    || echo "SWEEP FAILED: $m"
  python scripts/real_run.py aggregate --root runs/mid \
    || echo "AGGREGATE FAILED"
}

echo "=== [5/6] utility-gain pair sweep (headline comparison) ==="
for m in to_python_two_step full_pipeline; do sweep "$m"; done

echo "=== [6/6] remaining methods, cost order ==="
for m in to_STL to_python_no_STL to_python_direct_with_sstl_cot \
         reasoning_only; do sweep "$m"; done

echo "=== round3_rebuild_mid.sh DONE ==="
