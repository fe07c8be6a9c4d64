#!/bin/bash
# Round-5 final chip sequence (replaces queue3's d2..d6 after the compile
# backlog incident; every stage idempotent, ordered by verdict value per
# remaining chip-minute):
#   f1  rescore the two utility-method arms (to_python_two_step,
#       full_pipeline) under the deterministic oracle + aggregate
#       -> the "no cell CI below zero" acceptance artifact
#   f2  re-run the OOM'd matched wave_nc1 2-shot cell; rescore + audit the
#       matched root
#   f3  MID sweep, utility pair, PLAIN decode (speculative would need a
#       fresh ~15-min tunnel compile; plain MID decode is cache-warm)
#   f4  serving-tier bench (new engine executables - compile risk, so last)
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

echo "=== [f1] deterministic rescore: utility arms $(date -u) ==="
if [ ! -f runs/real/eval/.r5_det_rescore ]; then
  python scripts/real_run.py rescore --root runs/real --repeats 3 \
    --eval-max 512 --deterministic-keys \
    --methods to_python_two_step full_pipeline \
    && touch runs/real/eval/.r5_det_rescore \
    || echo "F1 FAILED"
fi
python scripts/real_run.py aggregate --root runs/real || echo "F1 AGG FAILED"
echo "=== [f1] done $(date -u) ==="

echo "=== [f2] matched root: missing cell + rescore $(date -u) ==="
python scripts/real_run.py eval --root runs/real_matched --preset BASE \
  --repeats 3 --eval-max 512 --methods to_python_two_step --shots 2 \
  --matched-shots --datasets wave_nc1_512 --deterministic-keys \
  || echo "F2 EVAL FAILED"
python scripts/real_run.py rescore --root runs/real_matched --repeats 3 \
  --eval-max 512 --methods to_python_two_step --shots 2 \
  --deterministic-keys || echo "F2 RESCORE FAILED"
python scripts/audit_two_shot.py runs/real_matched/eval \
  | tee runs/real_matched/AUDIT.txt || true
python scripts/real_run.py aggregate --root runs/real_matched || true
echo "=== [f2] done $(date -u) ==="

echo "=== [f3] MID sweep: utility pair, plain decode $(date -u) ==="
python scripts/real_run.py eval --root runs/mid --preset MID \
  --repeats 3 --eval-max 512 --methods to_python_two_step full_pipeline \
  --deterministic-keys || echo "F3 FAILED"
python scripts/real_run.py aggregate --root runs/mid || true
echo "=== [f3] done $(date -u) ==="

echo "=== [f4] serving-tier bench $(date -u) ==="
if [ ! -f docs/serving_tiers.json ]; then
  python benchmarks/bench_serving_tiers.py runs/real BASE 128 \
    || echo "F4 FAILED"
fi
echo "=== round5_final.sh DONE $(date -u) ==="
