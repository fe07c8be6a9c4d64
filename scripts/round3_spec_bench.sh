#!/bin/bash
# Speculative-decoding measurement on the real chip (run AFTER
# round3_master.sh so it never contends with the protocol sweep):
#   1. train the MID family's draft model (TINY-class, MID tokenizer,
#      all SFT formats) if absent,
#   2. run one generation-heavy eval cell twice - speculative vs plain -
#      and report the wall-clock ratio (per-combo times are in the sweep
#      log lines); greedy equality of the two metrics.json files is the
#      correctness check (temp 0.2 sampling differs by design, so the
#      timing cells run the same seeds but are compared on wall-clock,
#      not content).
set -uo pipefail
cd "$(dirname "$0")/.."

# family root + preset are parameters so the bench runs against whichever
# family has live checkpoints on this VM (checkpoints are not in git)
ROOT="${1:-runs/mid}"
PRESET="${2:-MID}"

if [ ! -d "$ROOT/draft" ] || [ -z "$(ls "$ROOT"/draft/checkpoint-* 2>/dev/null)" ]; then
  python scripts/real_run.py train --root "$ROOT" --role draft \
    --role-preset draft=DRAFT --steps 1500 \
    || echo "DRAFT TRAIN FAILED"
fi

for mode in spec plain; do
  out="/tmp/specbench_$mode"
  rm -rf "$out"; mkdir -p "$out"
  ln -s "$(pwd)/$ROOT"/tokenizer.json "$(pwd)/$ROOT"/translator \
        "$(pwd)/$ROOT"/coder "$(pwd)/$ROOT"/controller \
        "$(pwd)/$ROOT"/draft "$out"/ 2>/dev/null || true
  extra=""
  [ "$mode" = spec ] && extra="--speculative --role-preset draft=DRAFT"
  echo "=== $mode ==="
  t0=$(date +%s)
  python scripts/real_run.py eval --root "$out" \
    --preset "$PRESET" $extra --repeats 1 --eval-max 128 \
    --methods to_python_two_step --datasets heat_nc1_512 2>&1 \
    | grep -E "done \| elapsed" || echo "$mode RUN FAILED"
  echo "$mode wall: $(( $(date +%s) - t0 ))s"
done
echo "=== round3_spec_bench.sh DONE ==="
