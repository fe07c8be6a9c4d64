#!/bin/bash
# Round-4 chip queue: runs AFTER scripts/round4_controller.sh releases the
# chip, in VERDICT priority order:
#   q1  7B LoRA train-step bench (VERDICT #6 — last missing 7B row)
#   q2  MID sweep, utility-gain method pair (VERDICT #3, #8 — the
#       controller-vs-baseline comparison at 0.47B scale)
#   q3  full 2M-corpus GT labeling (VERDICT #5 — artifact, not
#       extrapolation; ~3.7 h at the measured 151.8 solves/s/chip)
#   q4  MID sweep, remaining methods (completes the 72-cell protocol)
# Every stage is resumable/idempotent and the queue is safe to kill at any
# stage boundary (kill $(cat /tmp/r4queue.pid)).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

CTL_PID="${1:-$(cat /tmp/r4ctl.pid 2>/dev/null || true)}"
if [ -n "${CTL_PID:-}" ]; then
  echo "waiting for controller pipeline (pid $CTL_PID) to release the chip"
  while kill -0 "$CTL_PID" 2>/dev/null; do sleep 60; done
fi
echo "chip free: starting queue $(date -u)"

echo "=== [q1] 7B LoRA train bench ==="
python benchmarks/bench_7b_train.py DEEPSEEK_7B 1024 4 1 \
  2>&1 | tee /tmp/bench_7b_train.log | grep -v xla_bridge
python benchmarks/bench_7b_train.py DEEPSEEK_7B 1024 4 4 \
  2>&1 | tee -a /tmp/bench_7b_train.log | grep -v xla_bridge
echo "=== [q1] done $(date -u) ==="

echo "=== [q1b] prefix-cache prefill gain (TPU) ==="
python benchmarks/bench_prefix_cache.py MID 64 448 \
  2>&1 | tee /tmp/bench_prefix.log | grep -v xla_bridge
echo "=== [q1b] done $(date -u) ==="

# MID decode dominates sweep cost: serve speculatively (exact target
# distribution; the engine now self-heals HBM OOM by batch halving), fall
# back to plain decode if the speculative pass still exits nonzero — the
# per-combo cache makes the fallback a resume, not a redo. real_run.py
# eval now exits 1 on any failed combo, so the fallback actually fires
# (the round-3 MID sweep died because it did not).
mid_sweep() {
  python scripts/real_run.py eval --root runs/mid --preset MID \
    --repeats 3 --eval-max 512 --methods "$@" \
    --speculative --role-preset draft=DRAFT \
    || python scripts/real_run.py eval --root runs/mid --preset MID \
         --repeats 3 --eval-max 512 --methods "$@" \
    || echo "MID SWEEP FAILED: $*"
  python scripts/real_run.py aggregate --root runs/mid || echo "AGG FAILED"
}

echo "=== [q2] MID sweep: utility-gain method pair ==="
mid_sweep to_python_two_step full_pipeline
echo "=== [q2] done $(date -u) ==="

echo "=== [q3] 2M corpus labeling ==="
# shard .jsonl files were pruned post-stats (regenerable, deterministic in
# (seed, shard_id)); this regenerates every shard WITH labels. The merged
# corpus.jsonl is not rebuilt (multi-GB, regenerable via --merge);
# STATS.json is the committed artifact.
python -m pdec.cli.datagen --out-dir runs/corpus2m --total 2000000 \
  --n-shards 256 --shards 0-255 --label --seed 11 || echo "Q3 FAILED"
python scripts/corpus_stats.py runs/corpus2m || true
echo "=== [q3] done $(date -u) ==="

echo "=== [q4] MID sweep: remaining methods ==="
mid_sweep to_STL to_python_no_STL reasoning_only to_python_direct_with_sstl_cot
echo "=== [q4] done $(date -u) ==="

echo "=== round4_queue.sh DONE $(date -u) ==="
