#!/bin/bash
# Round-5 tail, attempt 3. h0's failure was re-diagnosed: the 25.35G
# compile OOM was never the decode engine — it was the robustness-scoring
# synthesis graph, inflated by model-generated programs demanding
# pathological grids (the matched wave_nc1 2-shot coder garbles t_final/
# dt). eval_robustness_batch now clamps oversize programs to _FAILED and
# scales the lane cap with the horizon bucket, so the cell can score.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

echo "=== [i0] matched wave_nc1 2-shot with size guard $(date -u) ==="
python scripts/real_run.py eval --root runs/real_matched --preset BASE \
  --repeats 3 --eval-max 512 --methods to_python_two_step --shots 2 \
  --matched-shots --datasets wave_nc1_512 --deterministic-keys \
  || echo "I0 EVAL FAILED"
python scripts/audit_two_shot.py runs/real_matched/eval \
  | tee runs/real_matched/AUDIT.txt || true
python scripts/real_run.py aggregate --root runs/real_matched || true
echo "=== [i0] done $(date -u) ==="

echo "=== [i1] resume controller/CoT method rescore $(date -u) ==="
python scripts/real_run.py rescore --root runs/real --repeats 3 \
  --eval-max 512 --deterministic-keys \
  --methods to_python_direct_with_sstl_cot reasoning_only full_pipeline \
  || echo "I1 FAILED"
python scripts/real_run.py aggregate --root runs/real || echo "I1 AGG FAILED"
echo "=== round5_fix3.sh DONE $(date -u) ==="
