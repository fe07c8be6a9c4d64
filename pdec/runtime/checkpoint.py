"""Checkpointing with the reference's dual-stream layout, on orbax.

Reference behavior being reproduced (``train/utils/trainer.py:53-118``,
``train/scripts/train.sh:56-60``):

- a rotating stream ``backups/checkpoint-<step>`` with ``save_total_limit``
  retention for crash recovery (full state: params/lora + optimizer),
- a persistent stream ``checkpoint-step-<step>`` every ``save_interval``
  steps, with optimizer state stripped from older entries to save disk
  (the ``RemoveStateCallback`` trade-off: old persistent checkpoints are
  weights-only and not resumable),
- ``find_latest_checkpoint`` for shell-free resume.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Dict, List, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(
        self,
        run_dir: str,
        save_total_limit: int = 2,  # reference train.sh:81
        save_interval: int = 500,
        keep_optimizer_in_last_n: int = 1,
    ):
        self.run_dir = os.path.abspath(run_dir)
        self.backups_dir = os.path.join(self.run_dir, "backups")
        self.save_total_limit = save_total_limit
        self.save_interval = save_interval
        self.keep_optimizer_in_last_n = keep_optimizer_in_last_n
        os.makedirs(self.backups_dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    # -- rotating stream -------------------------------------------------

    def save_backup(self, step: int, state: Dict[str, Any]):
        path = os.path.join(self.backups_dir, f"checkpoint-{step}")
        self._ckpt.save(path, state, force=True)
        self._ckpt.wait_until_finished()
        self._rotate()

    def _rotate(self):
        entries = self._list(self.backups_dir, r"checkpoint-(\d+)$")
        for step, path in entries[: -self.save_total_limit]:
            shutil.rmtree(path, ignore_errors=True)

    # -- persistent stream ------------------------------------------------

    def save_step(self, step: int, state: Dict[str, Any]):
        """Persistent ``checkpoint-step-N``; strips optimizer state from
        older persistent checkpoints (RemoveStateCallback semantics).

        Weights and optimizer state are separate orbax sub-checkpoints so
        the strip is a directory removal, like the reference's deletion of
        optimizer/scheduler/rng files (``trainer.py:63-86``).
        """
        path = os.path.join(self.run_dir, f"checkpoint-step-{step}")
        weights = {k: v for k, v in state.items() if k != "opt_state"}
        self._ckpt.save(os.path.join(path, "weights"), weights, force=True)
        if "opt_state" in state:
            self._ckpt.save(
                os.path.join(path, "opt_state"), state["opt_state"], force=True
            )
        self._ckpt.wait_until_finished()
        entries = self._list(self.run_dir, r"checkpoint-step-(\d+)$")
        for s, p in entries[: -self.keep_optimizer_in_last_n]:
            opt_path = os.path.join(p, "opt_state")
            if os.path.exists(opt_path):
                shutil.rmtree(opt_path, ignore_errors=True)

    def restore_step(self, path: str, like: Dict[str, Any]) -> Dict[str, Any]:
        """Restore a persistent checkpoint; ``opt_state`` only if present."""
        weights_like = {k: v for k, v in like.items() if k != "opt_state"}
        state = dict(self._ckpt.restore(os.path.join(path, "weights"), weights_like))
        opt_path = os.path.join(path, "opt_state")
        if "opt_state" in like and os.path.exists(opt_path):
            state["opt_state"] = self._ckpt.restore(opt_path, like["opt_state"])
        return state

    def restore_weights(self, path: str) -> Dict[str, Any]:
        """Template-free restore of the weight subtrees (params + adapters).

        Works for both streams: persistent ``checkpoint-step-N`` (weights
        sub-checkpoint) and rotating ``backups/checkpoint-N`` (full state,
        whose optimizer-state structure the caller need not reconstruct —
        orbax restores the saved tree as-is and we drop ``opt_state``).
        """
        if "checkpoint-step-" in os.path.basename(path):
            return dict(self._ckpt.restore(os.path.join(path, "weights")))
        full = self._ckpt.restore(path)
        return {k: v for k, v in full.items() if k != "opt_state"}

    def restore_params(self, path: str, like_params: Any = None) -> Any:
        """Restore only the ``params`` subtree from any checkpoint layout."""
        return self.restore_weights(path)["params"]

    # -- restore -----------------------------------------------------------

    def find_latest(self) -> Optional[str]:
        candidates = self._list(self.backups_dir, r"checkpoint-(\d+)$")
        candidates += self._list(self.run_dir, r"checkpoint-step-(\d+)$")
        if not candidates:
            return None
        return max(candidates, key=lambda e: e[0])[1]

    def restore(self, path: str, like: Dict[str, Any]) -> Dict[str, Any]:
        return self._ckpt.restore(path, like)

    @staticmethod
    def step_of(path: str) -> int:
        m = re.search(r"checkpoint(?:-step)?-(\d+)$", path)
        return int(m.group(1)) if m else 0

    @staticmethod
    def _list(root: str, pattern: str) -> List:
        out = []
        if not os.path.isdir(root):
            return out
        for name in os.listdir(root):
            m = re.match(pattern, name)
            if m:
                out.append((int(m.group(1)), os.path.join(root, name)))
        return sorted(out)
