#!/bin/bash
# Round-4 controller-utility-gain pipeline (VERDICT r3 next-steps #1).
#
# The round-3 conclusion: the identity-anchored controller neither hurts
# nor helps — clean per-cell gain within sampling variance, because the
# preference labels themselves sat inside the multi-start synthesis noise
# floor.  Round-4 levers, in order:
#   0. ORACLE GATE: score the candidate pool with the production chained
#      utility and multi-seed averaging; if no cell shows headroom a
#      perfect controller could capture, stop (artifact either way).
#   1. lower-noise labels: --score-seeds 2 (averaged utilities) with a
#      matched --floor 0.03; disjunct-commitment candidates (the MILP
#      integer-branching analogue) widen the pool where or-specs live.
#   2. scale: ~6x round-3's pair count, minted per (family, nc) cell.
#   3. longer DPO at BASE (reference ran DPO to step 16,000,
#      run_testing.sh:17; 57M trains fast) and a refreshed MID controller.
#   4. re-sweep ONLY full_pipeline (the treatment arm; the
#      to_python_two_step baseline tables are already committed), then
#      regenerate the utility-gain tables.
#
# Idempotent: every stage keys on its artifact and skips when present.
set -u  # no -e: each stage reports and continues where safe

cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

N_PER_CELL="${N_PER_CELL:-24000}"
DPO_STEPS_BASE="${DPO_STEPS_BASE:-6000}"
DPO_STEPS_MID="${DPO_STEPS_MID:-2000}"

echo "=== [0/5] oracle headroom gate ==="
if [ ! -f runs/real/oracle_headroom.json ]; then
  python scripts/oracle_headroom.py --n 256 --seeds 2 --floor 0.03 \
    --out runs/real/oracle_headroom.json || echo "ORACLE FAILED"
else
  echo "oracle artifact exists, skipping"
fi
python - <<'EOF'
import json, sys
try:
    r = json.load(open("runs/real/oracle_headroom.json"))["cells"]
except Exception as e:
    sys.exit(f"no oracle artifact: {e}")
worst = max(c["intervene_rate"] for c in r.values())
print("max intervene rate across cells:", worst)
EOF

echo "=== [1/5] round-4 DPO pairs (multi-seed chained scoring) ==="
mkdir -p datasets/dpo
for kind in heat wave; do
  for nc in 1 2 3; do
    out="datasets/dpo/r4_${kind}_nc${nc}.jsonl"
    if [ ! -f "$out" ]; then
      python -m pdec.cli.dpo_datagen --kind "$kind" --nc "$nc" \
        --n "$N_PER_CELL" --candidates 6 --seed 47 \
        --score-seeds 2 --floor 0.03 --out "$out" \
        || echo "DATAGEN FAILED: $kind nc$nc"
    else
      echo "$out exists, skipping"
    fi
  done
done
cat datasets/dpo/r4_*.jsonl > datasets/dpo/pairs_r4.jsonl
wc -l datasets/dpo/pairs_r4.jsonl

echo "=== [2/5] retrain BASE controller (longer DPO) ==="
root=runs/real
if [ ! -f "$root/controller/.r4_done" ]; then
  cp datasets/dpo/pairs_r4.jsonl "$root/dpo_pairs.jsonl"
  if [ -d "$root/controller" ] && [ ! -d "$root/controller_r3c" ]; then
    mv "$root/controller" "$root/controller_r3c"
  fi
  if python scripts/real_run.py dpo --root "$root" --preset BASE \
      --dpo-steps "$DPO_STEPS_BASE"; then
    touch "$root/controller/.r4_done"
  else
    echo "DPO TRAIN FAILED: $root"
  fi
else
  echo "BASE controller already retrained"
fi

echo "=== [3/5] retrain MID controller ==="
root=runs/mid
if [ "${SKIP_MID:-0}" = "1" ]; then
  echo "SKIP_MID=1: deferring MID controller retrain (BASE path first)"
elif [ ! -f "$root/controller/.r4_done" ]; then
  cp datasets/dpo/pairs_r4.jsonl "$root/dpo_pairs.jsonl"
  if [ -d "$root/controller" ] && [ ! -d "$root/controller_r3" ]; then
    mv "$root/controller" "$root/controller_r3"
  fi
  if python scripts/real_run.py dpo --root "$root" --preset MID \
      --dpo-steps "$DPO_STEPS_MID"; then
    touch "$root/controller/.r4_done"
  else
    echo "DPO TRAIN FAILED: $root"
  fi
else
  echo "MID controller already retrained"
fi

echo "=== [4/5] re-sweep full_pipeline (treatment arm only) ==="
root=runs/real
if [ -f "$root/controller/.r4_done" ]; then
  rm -rf "$root"/eval/*/full_pipeline
  python scripts/real_run.py eval --root "$root" --preset BASE \
    --repeats 3 --eval-max 512 --methods full_pipeline \
    || echo "SWEEP FAILED: $root"
fi

echo "=== [5/5] aggregate utility-gain tables ==="
python scripts/real_run.py aggregate --root runs/real

echo "=== round4_controller.sh DONE ==="
