#!/bin/bash
# Round-3 eval sweeps at the REFERENCE protocol: 512 examples x 6 datasets
# x 5 methods x 0/2-shot x 3 repeat samplings (temp 0.2, seed 0) for both
# the MID (0.47B) and BASE model families
# (test_pdecontrol.sh:29-36, infer_pdecontrol.sh:36-38).
#
# Round-2 combos used 256 examples / 1 repeat; they are moved aside once
# (eval_r2/) so the new sweep starts clean and stays resumable per-combo.
set -euo pipefail
cd "$(dirname "$0")/.."

for root in runs/mid runs/real; do
  if [ -d "$root/eval" ] && [ ! -d "$root/eval_r2" ]; then
    mv "$root/eval" "$root/eval_r2"
    echo "moved $root/eval -> $root/eval_r2 (old 256-example protocol)"
  fi
done

echo "=== MID sweep ==="
python scripts/real_run.py eval --root runs/mid --preset MID \
  --repeats 3 --eval-max 512
python scripts/real_run.py aggregate --root runs/mid

echo "=== BASE sweep ==="
python scripts/real_run.py eval --root runs/real --preset BASE \
  --repeats 3 --eval-max 512
python scripts/real_run.py aggregate --root runs/real

echo "=== round3_eval.sh DONE ==="
