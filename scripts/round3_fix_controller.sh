#!/bin/bash
# Round-3 controller fix: regenerate DPO pairs WITH the identity subgoal in
# the candidate pool (pdec/pipeline/dpo_datagen.py), retrain the BASE
# controller, invalidate its full_pipeline eval cells, and re-sweep them so
# the committed utility-gain table reflects the fixed controller.
set -uo pipefail
cd "$(dirname "$0")/.."

echo "=== [1/4] identity-pool DPO pairs ==="
mkdir -p datasets/dpo
for kind in heat wave; do
  for nc in 1 2 3; do
    out="datasets/dpo/r3b_${kind}_nc${nc}.jsonl"
    if [ ! -f "$out" ]; then
      python -m pdec.cli.dpo_datagen --kind "$kind" --nc "$nc" \
        --n 4000 --candidates 4 --seed 7 --out "$out" \
        || echo "DATAGEN FAILED: $kind nc$nc"
    else
      echo "$out exists, skipping"
    fi
  done
done
cat datasets/dpo/r3b_*.jsonl > datasets/dpo/pairs_r3b.jsonl
wc -l datasets/dpo/pairs_r3b.jsonl

echo "=== [2/4] BASE controller retrain ==="
cp datasets/dpo/pairs_r3b.jsonl runs/real/dpo_pairs.jsonl
rm -rf runs/real/controller
python scripts/real_run.py dpo --root runs/real --preset BASE --dpo-steps 2000

echo "=== [3/4] invalidate + re-sweep BASE full_pipeline ==="
rm -rf runs/real/eval/*/full_pipeline
python scripts/real_run.py eval --root runs/real --preset BASE \
  --repeats 3 --eval-max 512 --methods full_pipeline

echo "=== [4/4] aggregate ==="
python scripts/real_run.py aggregate --root runs/real

echo "=== round3_fix_controller.sh DONE ==="
