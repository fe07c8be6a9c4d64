#!/bin/bash
# Round-3 master sequence (chip-serial, resumable at every step):
#
#   1. protocol sweep of the utility-gain method pair for both families
#      (MID runs with the identity-pool controller -> the "timid" record),
#   2. chained-controller upgrade (scripts/round3_chained_controller.sh):
#      rescore the pair cells with chained utility (archiving the timid
#      tables), regenerate DPO pairs under chained scoring, retrain both
#      controllers, re-sweep full_pipeline,
#   3. the remaining four formats at the protocol - AFTER the retrain, so
#      reasoning_only (controller+coder) reflects the shipped controller,
#   4. final aggregate.
#
# Each stage is idempotent (per-combo metrics cache, exists-checks), so
# re-running this script resumes wherever the tunnel last dropped.
set -uo pipefail
cd "$(dirname "$0")/.."

run_phase() {
  local root="$1" preset="$2"; shift 2
  echo "=== phase: $root ($preset) methods: $* ==="
  python scripts/real_run.py eval --root "$root" --preset "$preset" \
    --repeats 3 --eval-max 512 --methods "$@" \
    || echo "PHASE FAILED: $root $*"
  python scripts/real_run.py aggregate --root "$root" \
    || echo "AGGREGATE FAILED: $root"
}

run_phase runs/mid  MID  to_python_two_step full_pipeline
run_phase runs/real BASE to_python_two_step full_pipeline

bash scripts/round3_chained_controller.sh

run_phase runs/mid  MID  to_STL to_python_no_STL reasoning_only to_python_direct_with_sstl_cot
run_phase runs/real BASE to_STL to_python_no_STL reasoning_only to_python_direct_with_sstl_cot

echo "=== round3_master.sh DONE ==="
