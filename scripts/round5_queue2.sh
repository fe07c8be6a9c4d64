#!/bin/bash
# Round-5 chip queue, stage C (replaces the b3/b4 tail of round5_queue.sh,
# which was stopped at the b2->b3 boundary so the serve-gate fix could land
# first):
#   c0  finish stage b2's post-steps (the in-flight matched-shots eval kept
#       running when the b-queue shell was stopped)
#   c1  BASE full_pipeline resweep under the FIXED gate: non-intervened
#       examples now get the exact no-controller coder prompt (the round-5
#       b1 resweep measured the 'intermediate problem' prompt framing — not
#       the interventions — as the source of every CI-negative wave cell)
#   c2  oracle headroom of the round-5 decomposition candidate pool
#       (VERDICT r4 next #1: gate before spending chip on DPO retraining)
#   c3  MID sweep, utility-gain method pair (VERDICT r4 #2)
#   c4  MID sweep, remaining methods (completes the 72-cell protocol)
# Every stage is resumable/idempotent; safe to kill at stage boundaries
# (kill $(cat /tmp/r5queue2.pid)).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

echo "=== [c0] wait for in-flight b2 eval, then b2 post-steps $(date -u) ==="
while kill -0 "$(cat /tmp/r5queue_b2eval.pid 2>/dev/null || echo 0)" 2>/dev/null; do
  sleep 20
done
python scripts/audit_two_shot.py runs/real_matched/eval \
  | tee runs/real_matched/AUDIT.txt
python scripts/real_run.py aggregate --root runs/real_matched || true
echo "=== [c0] done $(date -u) ==="

echo "=== [c1] BASE full_pipeline resweep (fixed gate) $(date -u) ==="
rm -f runs/real/eval/.r5_gate_resweep
rm -rf runs/real/eval/*/full_pipeline
python scripts/real_run.py eval --root runs/real --preset BASE \
  --repeats 3 --eval-max 512 --methods full_pipeline \
  && touch runs/real/eval/.r5_gate_resweep \
  || echo "C1 FAILED"
python scripts/real_run.py aggregate --root runs/real || echo "C1 AGG FAILED"
echo "=== [c1] done $(date -u) ==="

echo "=== [c2] round-5 pool oracle headroom $(date -u) ==="
python scripts/oracle_headroom.py --n 256 --seeds 2 --candidates 8 \
  --out runs/real/oracle_headroom_r5.json || echo "C2 FAILED"
echo "=== [c2] done $(date -u) ==="

mid_sweep() {
  python scripts/real_run.py eval --root runs/mid --preset MID \
    --repeats 3 --eval-max 512 --methods "$@" \
    --speculative --role-preset draft=DRAFT \
    || python scripts/real_run.py eval --root runs/mid --preset MID \
         --repeats 3 --eval-max 512 --methods "$@" \
    || echo "MID SWEEP FAILED: $*"
  python scripts/real_run.py aggregate --root runs/mid || echo "AGG FAILED"
}

echo "=== [c3] MID sweep: utility-gain method pair $(date -u) ==="
mid_sweep to_python_two_step full_pipeline
echo "=== [c3] done $(date -u) ==="

echo "=== [c4] MID sweep: remaining methods $(date -u) ==="
mid_sweep to_STL to_python_no_STL reasoning_only to_python_direct_with_sstl_cot
echo "=== [c4] done $(date -u) ==="

echo "=== round5_queue2.sh DONE $(date -u) ==="
