"""Train loop driver tests: checkpoint cadence, resume, validation hook."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from pdec.models.config import TINY
from pdec.models.transformer import init_params
from pdec.runtime.checkpoint import CheckpointManager
from pdec.train.loop import LoopConfig, resume_if_available, train_loop
from pdec.train.optim import TrainConfig
from pdec.train.sft import make_sft_step


def _batches(key):
    def gen():
        k = key
        while True:
            k, sub = jax.random.split(k)
            tokens = jax.random.randint(sub, (1, 2, 16), 0, TINY.vocab_size)
            yield {"input_ids": tokens, "labels": tokens}
    return gen()


def test_loop_with_checkpoints_and_validation(tmp_path):
    params = init_params(jax.random.PRNGKey(0), TINY)
    tcfg = TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=12)
    init_fn, step_fn = make_sft_step(TINY, tcfg, train_lora=False)
    state = {"params": params, "lora": None, "opt_state": init_fn(params, None)}
    ckpt = CheckpointManager(str(tmp_path), save_interval=6)
    seen = []

    def validate_fn(state, step):
        seen.append(step)
        return {"loss": 1.0}

    metrics_log = []
    state, step = train_loop(
        step_fn, state, _batches(jax.random.PRNGKey(1)),
        LoopConfig(total_steps=12, save_interval=6, backup_interval=4,
                   log_every=4),
        ckpt=ckpt, validate_fn=validate_fn,
        metric_sink=lambda s, m: metrics_log.append((s, m)),
    )
    assert step == 12
    assert seen == [6, 12]
    assert ckpt.find_latest() is not None
    assert any("loss" in m for _, m in metrics_log)


def test_resume_from_checkpoint(tmp_path):
    params = init_params(jax.random.PRNGKey(0), TINY)
    tcfg = TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=20)
    init_fn, step_fn = make_sft_step(TINY, tcfg, train_lora=False)
    state = {"params": params, "lora": None, "opt_state": init_fn(params, None)}
    ckpt = CheckpointManager(str(tmp_path))

    state, step = train_loop(
        step_fn, state, _batches(jax.random.PRNGKey(1)),
        LoopConfig(total_steps=8, save_interval=100, backup_interval=4),
        ckpt=ckpt,
    )
    assert step == 8

    # fresh process: resume picks up the step-8 backup
    fresh = {
        "params": init_params(jax.random.PRNGKey(9), TINY),
        "lora": None,
        "opt_state": init_fn(params, None),
    }
    resumed, start = resume_if_available(ckpt, fresh)
    assert start == 8
    a = np.asarray(jax.tree.leaves(state["params"])[0])
    b = np.asarray(jax.tree.leaves(resumed["params"])[0])
    np.testing.assert_array_equal(a, b)
