#!/bin/bash
# Round-5 tail after round5_fix.sh: rescore the cached cells of the three
# methods the default rescore list omits (controller methods + CoT), so
# every committed protocol table is scored against the canonical
# deterministic oracle and the relabeled GT suites; then re-aggregate.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

echo "=== [h0] retry matched wave_nc1 2-shot (tunnel-OOM self-heal) $(date -u) ==="
# previous attempt died at remote-compile HTTP 500 (hidden HBM OOM,
# 25.35G > 15.75G); _is_hbm_oom now treats tunnel remote-compile 500s as
# OOM-suspect so the batch-halving recovery engages
python scripts/real_run.py eval --root runs/real_matched --preset BASE \
  --repeats 3 --eval-max 512 --methods to_python_two_step --shots 2 \
  --matched-shots --datasets wave_nc1_512 --deterministic-keys \
  || echo "H0 EVAL FAILED"
python scripts/real_run.py rescore --root runs/real_matched --repeats 3 \
  --eval-max 512 --methods to_python_two_step --shots 2 \
  --deterministic-keys || echo "H0 RESCORE FAILED"
python scripts/audit_two_shot.py runs/real_matched/eval \
  | tee runs/real_matched/AUDIT.txt || true
python scripts/real_run.py aggregate --root runs/real_matched || true
echo "=== [h0] done $(date -u) ==="

echo "=== [h1] rescore controller/CoT method cells $(date -u) ==="
python scripts/real_run.py rescore --root runs/real --repeats 3 \
  --eval-max 512 --deterministic-keys \
  --methods to_python_direct_with_sstl_cot reasoning_only full_pipeline \
  || echo "H1 FAILED"
python scripts/real_run.py aggregate --root runs/real || echo "H1 AGG FAILED"
echo "=== round5_fix2.sh DONE $(date -u) ==="
