#!/bin/bash
# Round-3 sequential chip pipeline (one TPU chip; stages share it serially):
#   1. 24k-problem DPO pair datagen (>=20k pairs, batched TPU utility scoring)
#   2. MID controller DPO training (0.47B, policy LoRA over SFT translator)
#   3. BASE controller retrain on the same big pair set
# Eval sweeps and benches are launched separately (they need timing info).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== [1/3] DPO pairs (24k problems x 4 candidates) ==="
mkdir -p datasets/dpo
for kind in heat wave; do
  for nc in 1 2 3; do
    out="datasets/dpo/r3_${kind}_nc${nc}.jsonl"
    if [ ! -f "$out" ]; then
      python -m pdec.cli.dpo_datagen --kind "$kind" --nc "$nc" \
        --n 4000 --candidates 4 --seed 7 --out "$out"
    else
      echo "$out exists, skipping"
    fi
  done
done
cat datasets/dpo/r3_*.jsonl > datasets/dpo/pairs_r3.jsonl
wc -l datasets/dpo/pairs_r3.jsonl

echo "=== [2/3] MID controller DPO ==="
cp datasets/dpo/pairs_r3.jsonl runs/mid/dpo_pairs.jsonl
rm -rf runs/mid/controller
python scripts/real_run.py dpo --root runs/mid --preset MID --dpo-steps 2000

echo "=== [3/3] BASE controller retrain on big pairs ==="
cp datasets/dpo/pairs_r3.jsonl runs/real/dpo_pairs.jsonl
rm -rf runs/real/controller
python scripts/real_run.py dpo --root runs/real --preset BASE --dpo-steps 2000

echo "=== round3_chip.sh DONE ==="
