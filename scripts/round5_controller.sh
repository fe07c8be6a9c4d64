#!/bin/bash
# Round-5 controller pipeline (VERDICT r4 next #1), STRICTLY gated:
#
#   gate  the redesigned candidate pool (disjunct commitments + structured
#         decompositions, `propose_subgoals`) must show >=5% mean relative
#         capturable oracle gain on a MAJORITY of cells
#         (runs/real/oracle_headroom_r5.json, written by round5_queue3 c2)
#         — otherwise this script exits 3 and the negative result stands
#         with the artifact; no chip-hours go to DPO.
#   1     mint pairs per (family, nc) with the new pool
#   2     retrain the BASE controller (6,000 DPO steps)
#   3     resweep full_pipeline under the fixed serve gate + deterministic
#         oracle; regenerate utility-gain tables
#
# Idempotent: every stage keys on its artifact.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

N_PER_CELL="${N_PER_CELL:-12000}"
DPO_STEPS_BASE="${DPO_STEPS_BASE:-6000}"

echo "=== [gate] round-5 pool headroom $(date -u) ==="
python - <<'EOF' || exit 3
import json, sys
try:
    cells = json.load(open("runs/real/oracle_headroom_r5.json"))["cells"]
except Exception as e:
    sys.exit(f"no r5 oracle artifact: {e}")
ok = {k: round(c.get("capturable_rel_pct", 0.0), 2) for k, c in cells.items()}
n_pass = sum(1 for v in ok.values() if v >= 5.0)
print(f"capturable_rel_pct per cell: {ok}  -> {n_pass}/{len(ok)} >= 5%")
if n_pass * 2 <= len(ok):
    print("GATE FAILED: majority of cells below 5% capturable relative "
          "gain; negative result stands, skipping DPO retrain")
    sys.exit(1)
EOF

echo "=== [1/3] round-5 DPO pairs (decomposition pool) $(date -u) ==="
mkdir -p datasets/dpo
for kind in heat wave; do
  for nc in 1 2 3; do
    out="datasets/dpo/r5_${kind}_nc${nc}.jsonl"
    if [ ! -f "$out" ]; then
      python -m pdec.cli.dpo_datagen --kind "$kind" --nc "$nc" \
        --n "$N_PER_CELL" --candidates 8 --seed 55 \
        --score-seeds 2 --floor 0.03 --out "$out" \
        || echo "DATAGEN FAILED: $kind nc$nc"
    fi
  done
done
cat datasets/dpo/r5_*.jsonl > datasets/dpo/pairs_r5.jsonl
wc -l datasets/dpo/pairs_r5.jsonl

echo "=== [2/3] retrain BASE controller $(date -u) ==="
root=runs/real
if [ ! -f "$root/controller/.r5_done" ]; then
  cp datasets/dpo/pairs_r5.jsonl "$root/dpo_pairs.jsonl"
  if [ -d "$root/controller" ] && [ ! -d "$root/controller_r4" ]; then
    mv "$root/controller" "$root/controller_r4"
  fi
  if python scripts/real_run.py dpo --root "$root" --preset BASE \
      --dpo-steps "$DPO_STEPS_BASE"; then
    touch "$root/controller/.r5_done"
  else
    echo "DPO TRAIN FAILED"
  fi
fi

echo "=== [3/3] resweep full_pipeline with the r5 controller $(date -u) ==="
rm -f runs/real/eval/.r5_ctl_resweep
rm -rf runs/real/eval/*/full_pipeline
python scripts/real_run.py eval --root runs/real --preset BASE \
  --repeats 3 --eval-max 512 --methods full_pipeline --deterministic-keys \
  && touch runs/real/eval/.r5_ctl_resweep || echo "RESWEEP FAILED"
python scripts/real_run.py aggregate --root runs/real || true
echo "=== round5_controller.sh DONE $(date -u) ==="
