#!/bin/bash
# Round-3 eval sweep, priority-ordered for a bounded chip budget.
#
# Reference protocol: 512 examples x 6 datasets x 5 methods x 0/2-shot x
# 3 repeat samplings at temp 0.2 (test_pdecontrol.sh:29-36,
# infer_pdecontrol.sh:36-38), for both MID (0.47B) and BASE families.
#
# Phases run the utility-gain method pair (to_python_two_step +
# full_pipeline) for BOTH roots first, so the controller-vs-no-controller
# comparison lands even if the round ends mid-sweep; cheaper methods
# follow.  Every phase is resumable (per-combo metrics.json cache) and
# aggregation re-runs after each phase so partial tables are always
# current.
set -uo pipefail
cd "$(dirname "$0")/.."

# Existing per-combo caches predate the 3-repeat protocol and the big-pair
# controllers -> move aside once (same guard as round3_eval.sh).
for root in runs/mid runs/real; do
  if [ -d "$root/eval" ] && [ ! -d "$root/eval_r2" ]; then
    mv "$root/eval" "$root/eval_r2"
    echo "moved $root/eval -> $root/eval_r2 (pre-protocol results)"
  fi
done

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
run_phase runs/mid  MID  to_STL to_python_no_STL reasoning_only to_python_direct_with_sstl_cot
run_phase runs/real BASE to_STL to_python_no_STL reasoning_only to_python_direct_with_sstl_cot

echo "=== round3_eval2.sh DONE ==="
