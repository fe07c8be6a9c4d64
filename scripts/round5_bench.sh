#!/bin/bash
# Round-5 chip queue, stage A: the two evidence benches VERDICT r4 #3 asked
# for, scheduled FIRST this round so controller work cannot monopolize the
# chip again.
#   a1  7B LoRA train-step bench  -> fills docs/PERF.md "pending on-chip run"
#   a2  prefix-cache prefill gain -> replaces the CPU-indicative number
# Safe to kill between stages: kill $(cat /tmp/r5bench.pid).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

echo "=== [a1] 7B LoRA train bench $(date -u) ==="
python benchmarks/bench_7b_train.py DEEPSEEK_7B 1024 4 1 \
  2>&1 | tee /tmp/bench_7b_train.log | grep -v xla_bridge
python benchmarks/bench_7b_train.py DEEPSEEK_7B 1024 4 4 \
  2>&1 | tee -a /tmp/bench_7b_train.log | grep -v xla_bridge
echo "=== [a1] done $(date -u) ==="

echo "=== [a2] prefix-cache prefill gain (TPU) $(date -u) ==="
python benchmarks/bench_prefix_cache.py MID 64 448 \
  2>&1 | tee /tmp/bench_prefix.log | grep -v xla_bridge
echo "=== [a2] done $(date -u) ==="

echo "=== round5_bench.sh DONE $(date -u) ==="
