#!/bin/bash
# Round-5 tail after round5_fix.sh: rescore the cached cells of the three
# methods the default rescore list omits (controller methods + CoT), so
# every committed protocol table is scored against the canonical
# deterministic oracle and the relabeled GT suites; then re-aggregate.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

echo "=== [h1] rescore controller/CoT method cells $(date -u) ==="
python scripts/real_run.py rescore --root runs/real --repeats 3 \
  --eval-max 512 --deterministic-keys \
  --methods to_python_direct_with_sstl_cot reasoning_only full_pipeline \
  || echo "H1 FAILED"
python scripts/real_run.py aggregate --root runs/real || echo "H1 AGG FAILED"
echo "=== round5_fix2.sh DONE $(date -u) ==="
