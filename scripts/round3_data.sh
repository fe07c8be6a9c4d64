#!/bin/bash
# Round-3 pod-scale datagen: the reference's 2M-sample corpus
# (README.md:34; BASELINE.md target 3) as a deterministic shard fleet.
# A defined slice (shards 0-12, ~102k rows) is GT-labeled with batched TPU
# synthesis and the labeling throughput recorded; the rest generate
# unlabeled (shards are idempotent, so interrupted runs just resume).
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=runs/corpus2m
TOTAL=2000000
SHARDS=256

echo "=== labeled slice: shards 0-12 (~102k rows) ==="
python -m pdec.cli.datagen --out-dir "$OUT" --total "$TOTAL" \
  --n-shards "$SHARDS" --shards 0-12 --label --seed 11

echo "=== remaining shards (unlabeled) ==="
python -m pdec.cli.datagen --out-dir "$OUT" --total "$TOTAL" \
  --n-shards "$SHARDS" --seed 11

echo "=== merge + stats ==="
python -m pdec.cli.datagen --out-dir "$OUT" --merge

echo "=== round3_data.sh DONE ==="
