#!/bin/bash
# Round-5 chip queue, stage D (after round5_queue2.sh c1+c2; replaces its
# c3/c4 tail so the deterministic oracle lands first):
#   d1  relabel the committed test suites with the canonical deterministic
#       oracle (family-default config + content-derived salts) — the
#       procedure the protocol's robustness-accuracy metric presumes
#   d2  rescore every BASE cell's cached predictions under the same oracle
#       (no generation; synthesis cost only) + re-aggregate
#   d2b rescore the matched-shots cells the same way
#   d3  serving-tier comparison bench (VERDICT r4 weak #5)
#   d4  MID sweep, utility-gain method pair, deterministic oracle
#   d5  MID sweep, remaining methods
# Resumable/idempotent; safe to kill at stage boundaries
# (kill $(cat /tmp/r5queue3.pid)).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

echo "=== [d1] deterministic relabel of test suites $(date -u) ==="
if [ ! -f datasets/test/ORACLE.json ]; then
  python scripts/label_eval_suite.py --relabel-deterministic || echo "D1 FAILED"
fi
echo "=== [d1] done $(date -u) ==="

echo "=== [d2] rescore BASE cells under the deterministic oracle $(date -u) ==="
if [ ! -f runs/real/eval/.r5_det_rescore ]; then
  python scripts/real_run.py rescore --root runs/real --repeats 3 \
    --eval-max 512 --deterministic-keys \
    && touch runs/real/eval/.r5_det_rescore \
    || echo "D2 FAILED"
fi
python scripts/real_run.py aggregate --root runs/real || echo "D2 AGG FAILED"
echo "=== [d2] done $(date -u) ==="

echo "=== [d2a] re-run the OOM'd matched wave_nc1 2-shot cell $(date -u) ==="
# failed at XLA compile-time HBM OOM before the self-heal covered compile
# errors (commit 'Self-heal compile-time HBM OOM'); per-combo cache makes
# this a no-op once metrics.json exists
python scripts/real_run.py eval --root runs/real_matched --preset BASE \
  --repeats 3 --eval-max 512 --methods to_python_two_step --shots 2 \
  --matched-shots --datasets wave_nc1_512 --deterministic-keys \
  || echo "D2A FAILED"
python scripts/audit_two_shot.py runs/real_matched/eval \
  | tee runs/real_matched/AUDIT.txt || true
echo "=== [d2a] done $(date -u) ==="

echo "=== [d2b] rescore matched-shots cells $(date -u) ==="
if [ ! -f runs/real_matched/eval/.r5_det_rescore ]; then
  python scripts/real_run.py rescore --root runs/real_matched --repeats 3 \
    --eval-max 512 --methods to_python_two_step --shots 2 \
    --deterministic-keys \
    && touch runs/real_matched/eval/.r5_det_rescore || echo "D2B FAILED"
fi
python scripts/real_run.py aggregate --root runs/real_matched || true
echo "=== [d2b] done $(date -u) ==="

echo "=== [d3] serving-tier comparison $(date -u) ==="
if [ ! -f docs/serving_tiers.json ]; then
  python benchmarks/bench_serving_tiers.py runs/real BASE 128 \
    || echo "D3 FAILED"
fi
echo "=== [d3] done $(date -u) ==="

mid_sweep() {
  python scripts/real_run.py eval --root runs/mid --preset MID \
    --repeats 3 --eval-max 512 --methods "$@" \
    --deterministic-keys \
    --speculative --role-preset draft=DRAFT \
    || python scripts/real_run.py eval --root runs/mid --preset MID \
         --repeats 3 --eval-max 512 --methods "$@" --deterministic-keys \
    || echo "MID SWEEP FAILED: $*"
  python scripts/real_run.py aggregate --root runs/mid || echo "AGG FAILED"
}

echo "=== [d4] MID sweep: utility-gain method pair $(date -u) ==="
mid_sweep to_python_two_step full_pipeline
echo "=== [d4] done $(date -u) ==="

echo "=== [d5] MID sweep: remaining methods $(date -u) ==="
mid_sweep to_STL to_python_no_STL reasoning_only to_python_direct_with_sstl_cot
echo "=== [d5] done $(date -u) ==="

echo "=== [d6] rescore any pre-round-5 MID cells under the oracle $(date -u) ==="
python scripts/real_run.py rescore --root runs/mid --repeats 3 \
  --eval-max 512 --deterministic-keys || echo "D6 FAILED"
python scripts/real_run.py aggregate --root runs/mid || true
echo "=== [d6] done $(date -u) ==="

echo "=== round5_queue3.sh DONE $(date -u) ==="
