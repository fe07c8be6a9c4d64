"""Runtime tests: config overrides, checkpoint dual streams + resume."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdec.runtime.checkpoint import CheckpointManager
from pdec.runtime.config import RunConfig, apply_overrides, load_config, save_config


class TestConfig:
    def test_roundtrip(self, tmp_path):
        cfg = RunConfig(run_dir=str(tmp_path))
        path = save_config(cfg)
        loaded = load_config(path)
        assert loaded["mode"] == "sft"
        assert loaded["train"]["learning_rate"] == 4e-5
        assert loaded["data"]["max_len"] == 4096
        assert loaded["synthesis"]["n_starts"] == 6

    def test_overrides(self):
        cfg = RunConfig()
        cfg = apply_overrides(
            cfg,
            ["train.learning_rate=1e-4", "data.prompt_format=to_python_no_STL",
             "mesh_tp=4", "synthesis.n_iters=10"],
        )
        assert cfg.train.learning_rate == 1e-4
        assert cfg.data.prompt_format == "to_python_no_STL"
        assert cfg.mesh_tp == 4
        assert cfg.synthesis.n_iters == 10  # NamedTuple replace path

    def test_bad_override_rejected(self):
        with pytest.raises(AttributeError):
            apply_overrides(RunConfig(), ["nonexistent.key=1"])


class TestCheckpoints:
    def _state(self, v):
        return {
            "params": {"w": jnp.full((4,), float(v))},
            "step": jnp.asarray(v),
        }

    def test_backup_rotation(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), save_total_limit=2)
        for step in (10, 20, 30):
            mgr.save_backup(step, self._state(step))
        names = sorted(os.listdir(mgr.backups_dir))
        assert names == ["checkpoint-20", "checkpoint-30"]

    def test_latest_and_restore(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path))
        mgr.save_backup(10, self._state(10))
        mgr.save_backup(25, self._state(25))
        latest = mgr.find_latest()
        assert latest.endswith("checkpoint-25")
        restored = mgr.restore(latest, self._state(0))
        assert float(restored["params"]["w"][0]) == 25.0
        assert mgr.step_of(latest) == 25

    def test_persistent_stream_strips_optimizer(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), keep_optimizer_in_last_n=1)
        state = {
            "params": {"w": jnp.ones((2,))},
            "opt_state": {"m": jnp.zeros((2,))},
        }
        mgr.save_step(100, state)
        mgr.save_step(200, state)
        assert not os.path.exists(
            os.path.join(str(tmp_path), "checkpoint-step-100", "opt_state")
        )
        assert os.path.exists(
            os.path.join(str(tmp_path), "checkpoint-step-200", "opt_state")
        )
        # stripped checkpoint still restores weights
        restored = mgr.restore_step(
            os.path.join(str(tmp_path), "checkpoint-step-100"),
            {"params": {"w": jnp.zeros((2,))}, "opt_state": {"m": jnp.zeros((2,))}},
        )
        assert "params" in restored and "opt_state" not in restored
        # latest keeps full state
        full = mgr.restore_step(
            os.path.join(str(tmp_path), "checkpoint-step-200"),
            {"params": {"w": jnp.zeros((2,))}, "opt_state": {"m": jnp.zeros((2,))}},
        )
        assert "opt_state" in full

    def test_restore_weights_template_free(self, tmp_path):
        """restore_weights works on BOTH streams without reconstructing the
        optimizer-state template (the --init-from / eval-loader path)."""
        mgr = CheckpointManager(str(tmp_path))
        state = {
            "params": {"w": jnp.full((3,), 7.0)},
            "lora": {"a": jnp.full((2,), 2.0)},
            "opt_state": {"m": jnp.zeros((3,))},
        }
        mgr.save_backup(10, state)
        mgr.save_step(10, state)

        for path in (
            os.path.join(mgr.backups_dir, "checkpoint-10"),
            os.path.join(str(tmp_path), "checkpoint-step-10"),
        ):
            w = mgr.restore_weights(path)
            assert "opt_state" not in w
            assert float(w["params"]["w"][0]) == 7.0
            assert float(w["lora"]["a"][0]) == 2.0
            assert float(mgr.restore_params(path)["w"][1]) == 7.0
