#!/bin/bash
# Round-5 chip queue, stage B (after round5_bench.sh):
#   b1  BASE full_pipeline resweep under the new serve-time UTILITY gate
#       (VERDICT r4 weak #1: no cell's clean CI may sit below zero)
#   b2  matched-shots A/B on the 2-shot cells (VERDICT r4 #5: parameter-
#       copying mitigation, measured by scripts/audit_two_shot.py)
#   b3  MID sweep, utility-gain method pair (VERDICT r4 #2)
#   b4  MID sweep, remaining methods (completes the 72-cell protocol)
# Every stage is resumable/idempotent; safe to kill at stage boundaries
# (kill $(cat /tmp/r5queue.pid)).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

echo "=== [b1] BASE full_pipeline resweep (utility gate) $(date -u) ==="
if [ ! -f runs/real/eval/.r5_gate_resweep ]; then
  rm -rf runs/real/eval/*/full_pipeline
  python scripts/real_run.py eval --root runs/real --preset BASE \
    --repeats 3 --eval-max 512 --methods full_pipeline \
    && touch runs/real/eval/.r5_gate_resweep \
    || echo "B1 FAILED"
fi
python scripts/real_run.py aggregate --root runs/real || echo "B1 AGG FAILED"
echo "=== [b1] done $(date -u) ==="

echo "=== [b2] matched-shots A/B, 2-shot cells $(date -u) ==="
mkdir -p runs/real_matched
for f in tokenizer.json translator coder controller draft; do
  [ -e "runs/real_matched/$f" ] || [ -e "runs/real/$f" ] \
    && ln -sfn "../real/$f" "runs/real_matched/$f" || true
done
python scripts/real_run.py eval --root runs/real_matched --preset BASE \
  --repeats 3 --eval-max 512 --methods to_python_two_step --shots 2 \
  --matched-shots || echo "B2 FAILED"
python scripts/audit_two_shot.py runs/real_matched/eval \
  | tee runs/real_matched/AUDIT.txt
python scripts/real_run.py aggregate --root runs/real_matched || true
echo "=== [b2] done $(date -u) ==="

# MID decode dominates sweep cost: serve speculatively (exact target
# distribution; the engine self-heals HBM OOM by batch halving), fall back
# to plain decode on nonzero exit — the per-combo cache makes the fallback
# a resume, not a redo (round4_queue.sh lineage).
mid_sweep() {
  python scripts/real_run.py eval --root runs/mid --preset MID \
    --repeats 3 --eval-max 512 --methods "$@" \
    --speculative --role-preset draft=DRAFT \
    || python scripts/real_run.py eval --root runs/mid --preset MID \
         --repeats 3 --eval-max 512 --methods "$@" \
    || echo "MID SWEEP FAILED: $*"
  python scripts/real_run.py aggregate --root runs/mid || echo "AGG FAILED"
}

echo "=== [b3] MID sweep: utility-gain method pair $(date -u) ==="
mid_sweep to_python_two_step full_pipeline
echo "=== [b3] done $(date -u) ==="

echo "=== [b4] MID sweep: remaining methods $(date -u) ==="
mid_sweep to_STL to_python_no_STL reasoning_only to_python_direct_with_sstl_cot
echo "=== [b4] done $(date -u) ==="

echo "=== round5_queue.sh DONE $(date -u) ==="
