#!/bin/bash
# Wrapper: finish queue2's c1/c2 tail (its shell was stopped at the
# boundary so queue3 could take over), then run round5_queue3.sh.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

echo "=== [wrap] waiting for in-flight c1 eval $(date -u) ==="
while kill -0 "$(cat /tmp/r5_c1eval.pid 2>/dev/null || echo 0)" 2>/dev/null; do
  sleep 20
done
touch runs/real/eval/.r5_gate_resweep
python scripts/real_run.py aggregate --root runs/real || echo "C1 AGG FAILED"
echo "=== [wrap] c1 aggregated $(date -u) ==="

echo "=== [c2] round-5 pool oracle headroom $(date -u) ==="
if [ ! -f runs/real/oracle_headroom_r5.json ]; then
  python scripts/oracle_headroom.py --n 256 --seeds 2 --candidates 8 \
    --out runs/real/oracle_headroom_r5.json || echo "C2 FAILED"
fi
echo "=== [c2] done $(date -u) ==="

exec bash scripts/round5_queue3.sh
