#!/bin/bash
# Chained-utility controller upgrade.
#
# Round 3 measured that with PLAIN utility (synthesize on the subgoal,
# score on GT) a non-identity subgoal almost always loses, so the
# identity-pool DPO controller learned to do (nearly) nothing: tie rates
# 72-98%, gains within a few %.  Chained two-phase synthesis
# (pdec.eval.robustness.eval_robustness_batch(chain=True)) makes the
# subgoal a warm start for the true objective — the gradient analogue of
# a Gurobi MIP start — so a good subgoal can guide the search and a bad
# one cannot sabotage it.  This script:
#   1. rescores the already-swept utility-gain method pair with chained
#      utility (no regeneration; archives the timid-controller tables),
#   2. regenerates DPO pairs under chained scoring (identity candidate =
#      the no-controller baseline; winners certify genuine guidance),
#   3. retrains the BASE and MID controllers on them,
#   4. re-sweeps full_pipeline for both families,
#   5. re-aggregates (utility_gain.md + utility_gain_chained.md).
set -uo pipefail
cd "$(dirname "$0")/.."

echo "=== [1/5] rescore pair cells with chained utility ==="
for root in runs/mid runs/real; do
  python scripts/real_run.py rescore --root "$root" --repeats 3 \
    --eval-max 512 --methods to_python_two_step full_pipeline \
    || echo "RESCORE FAILED: $root"
  python scripts/real_run.py aggregate --root "$root" \
    || echo "AGGREGATE FAILED: $root"
  # archive the identity-pool ("timid") controller's chained table before
  # the re-sweep overwrites its full_pipeline predictions — ONCE: a
  # resume after the retrain must not clobber the archived provenance
  # record with post-retrain data
  if [ -f "$root/eval/results/utility_gain_chained.md" ] \
      && [ ! -f "$root/eval/results/utility_gain_chained_r3b.md" ]; then
    cp "$root/eval/results/utility_gain_chained.md" \
       "$root/eval/results/utility_gain_chained_r3b.md"
  fi
done

echo "=== [2/5] chained DPO pairs ==="
mkdir -p datasets/dpo
for kind in heat wave; do
  for nc in 1 2 3; do
    out="datasets/dpo/r3c_${kind}_nc${nc}.jsonl"
    if [ ! -f "$out" ]; then
      python -m pdec.cli.dpo_datagen --kind "$kind" --nc "$nc" \
        --n 8000 --candidates 6 --seed 7 --out "$out" \
        || echo "DATAGEN FAILED: $kind nc$nc"
    else
      echo "$out exists, skipping"
    fi
  done
done
cat datasets/dpo/r3c_*.jsonl > datasets/dpo/pairs_r3c.jsonl
wc -l datasets/dpo/pairs_r3c.jsonl

echo "=== [3/5] retrain controllers on chained pairs ==="
for spec in "runs/real BASE" "runs/mid MID"; do
  set -- $spec; root=$1; preset=$2
  # completion sentinel, written only after a clean dpo exit: keying the
  # skip on controller_r3b existing would wedge permanently after a
  # failed retrain (old controller moved aside, new one never trained)
  if [ -f "$root/controller/.r3c_done" ]; then
    echo "$root controller already retrained, skipping"
    continue
  fi
  cp datasets/dpo/pairs_r3c.jsonl "$root/dpo_pairs.jsonl"
  if [ -d "$root/controller" ] && [ ! -d "$root/controller_r3b" ]; then
    mv "$root/controller" "$root/controller_r3b"
  fi
  if python scripts/real_run.py dpo --root "$root" --preset "$preset" \
      --dpo-steps 2000; then
    touch "$root/controller/.r3c_done"
  else
    echo "DPO TRAIN FAILED: $root (re-run resumes/retries)"
  fi
done

echo "=== [4/5] re-sweep full_pipeline with chained controllers ==="
for spec in "runs/mid MID" "runs/real BASE"; do
  set -- $spec; root=$1; preset=$2
  rm -rf "$root"/eval/*/full_pipeline
  python scripts/real_run.py eval --root "$root" --preset "$preset" \
    --repeats 3 --eval-max 512 --methods full_pipeline \
    || echo "SWEEP FAILED: $root"
done

echo "=== [5/5] aggregate ==="
python scripts/real_run.py aggregate --root runs/mid
python scripts/real_run.py aggregate --root runs/real

echo "=== round3_chained_controller.sh DONE ==="
