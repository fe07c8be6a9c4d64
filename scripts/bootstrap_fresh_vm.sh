#!/bin/bash
# Fresh-VM bootstrap: regenerate every non-committed artifact (corpora,
# checkpoints) from committed seeds/configs and finish any incomplete
# protocol sweep cells.  Composes the round-3 rebuild sequences; every
# stage is idempotent, so this single script is the only thing a new VM
# (or a new round) needs to launch:
#
#   nohup bash scripts/bootstrap_fresh_vm.sh > /tmp/bootstrap.log 2>&1 &
#
# Cost on one v5e chip (measured round 3): BASE family ~1.2 h train +
# ~1 h sweep; MID family ~2-5 h train (chunked dispatch) + sweep.
set -uo pipefail
cd "$(dirname "$0")/.."

echo "=== BASE family (57M): rebuild + protocol sweep ==="
bash scripts/round3_rebuild.sh

echo "=== BASE gated full_pipeline + chained rescore ==="
python scripts/real_run.py eval --root runs/real --preset BASE \
  --repeats 3 --eval-max 512 --methods full_pipeline || true
python scripts/real_run.py rescore --root runs/real --repeats 3 \
  --eval-max 512 --methods to_python_two_step full_pipeline || true
python scripts/real_run.py aggregate --root runs/real || true

echo "=== MID family (0.47B): rebuild + protocol sweep ==="
bash scripts/round3_rebuild_mid.sh

echo "=== bootstrap_fresh_vm.sh DONE ==="
