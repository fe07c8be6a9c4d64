"""Training tests: SFT/DPO steps learn; sharded step runs on an 8-CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdec.models.config import TINY
from pdec.models.lora import init_lora, lora_shardings
from pdec.models.transformer import (
    IGNORE_INDEX,
    init_params,
    param_shardings,
)
from pdec.parallel.mesh import MeshConfig, batch_sharding, make_mesh, shard_params
from pdec.train.dpo import DPOConfig, make_dpo_step
from pdec.train.optim import TrainConfig
from pdec.train.sft import make_sft_step

CFG = TINY
TCFG = TrainConfig(learning_rate=1e-3, warmup_steps=2, total_steps=100, grad_accum=2)


def _sft_batch(key, accum=2, micro=2, t=32):
    tokens = jax.random.randint(key, (accum, micro, t), 0, CFG.vocab_size)
    labels = tokens
    return {"input_ids": tokens, "labels": labels}


def test_sft_full_finetune_learns():
    params = init_params(jax.random.PRNGKey(0), CFG)
    init_fn, step_fn = make_sft_step(CFG, TCFG, train_lora=False)
    opt_state = init_fn(params, None)
    batch = _sft_batch(jax.random.PRNGKey(1))
    step = jax.jit(step_fn)
    losses = []
    for _ in range(8):
        params, _, opt_state, metrics = step(params, None, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_sft_lora_learns_and_freezes_base():
    params = init_params(jax.random.PRNGKey(0), CFG)
    lora = init_lora(jax.random.PRNGKey(2), CFG, rank=4, alpha=8)
    init_fn, step_fn = make_sft_step(CFG, TCFG, train_lora=True)
    opt_state = init_fn(params, lora)
    batch = _sft_batch(jax.random.PRNGKey(3))
    step = jax.jit(step_fn)
    base_before = jax.tree.map(lambda x: x.copy(), params)
    losses = []
    for _ in range(8):
        params, lora, opt_state, metrics = step(params, lora, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    # base params untouched
    for a, b in zip(jax.tree.leaves(base_before), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dpo_step_improves_preference():
    params = init_params(jax.random.PRNGKey(0), CFG)
    policy = init_lora(jax.random.PRNGKey(1), CFG, rank=4, alpha=8)
    key = jax.random.PRNGKey(4)
    t = 24
    chosen = jax.random.randint(key, (2, 3, t), 0, CFG.vocab_size)
    rejected = jax.random.randint(jax.random.PRNGKey(5), (2, 3, t), 0, CFG.vocab_size)

    def lab(x):
        # mask the first half as prompt
        return jnp.where(jnp.arange(t)[None, None, :] < t // 2, IGNORE_INDEX, x)

    batch = {
        "chosen_input_ids": chosen,
        "chosen_labels": lab(chosen),
        "rejected_input_ids": rejected,
        "rejected_labels": lab(rejected),
    }
    init_fn, step_fn = make_dpo_step(CFG, TCFG, DPOConfig(beta=0.1, rpo_alpha=1.0))
    opt_state = init_fn(policy)
    step = jax.jit(step_fn)
    margins, losses = [], []
    for _ in range(10):
        policy, opt_state, metrics = step(params, policy, None, opt_state, batch)
        margins.append(float(metrics["reward_margin"]))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert margins[-1] > margins[0]  # policy prefers chosen over rejected


def test_sharded_sft_step_on_8_device_mesh():
    """The full-finetune step compiles and runs with FSDP+TP sharding on the
    virtual 8-CPU mesh (2 fsdp x 2 tp x 2 data)."""
    # this is the largest XLA:CPU compile in the suite; with the executable
    # caches of every preceding test still resident, the compiler has been
    # observed to segfault here in full-suite runs (passes in isolation
    # and with shorter prefixes). Dropping cached executables first keeps
    # the compile within the crash-free envelope.
    jax.clear_caches()
    assert jax.device_count() == 8
    mesh = make_mesh(MeshConfig(data=2, fsdp=2, tp=2))
    params = init_params(jax.random.PRNGKey(0), CFG)
    params = shard_params(params, param_shardings(CFG), mesh)

    init_fn, step_fn = make_sft_step(CFG, TCFG, train_lora=False)
    with mesh:
        opt_state = init_fn(params, None)
        batch = _sft_batch(jax.random.PRNGKey(1), accum=2, micro=4)
        batch = jax.device_put(batch, batch_sharding(mesh, batch_axis=1))
        step = jax.jit(step_fn)
        losses = []
        for _ in range(6):
            params, _, opt_state, metrics = step(params, None, opt_state, batch)
            losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_sharded_lora_dpo_on_mesh():
    mesh = make_mesh(MeshConfig(data=1, fsdp=4, tp=2))
    params = init_params(jax.random.PRNGKey(0), CFG)
    params = shard_params(params, param_shardings(CFG), mesh)
    policy = init_lora(jax.random.PRNGKey(1), CFG, rank=4, alpha=8)
    policy = shard_params(policy, lora_shardings(policy), mesh)

    key = jax.random.PRNGKey(4)
    t = 16
    mk = lambda k: jax.random.randint(k, (1, 2, t), 0, CFG.vocab_size)
    batch = {
        "chosen_input_ids": mk(key),
        "chosen_labels": mk(key),
        "rejected_input_ids": mk(jax.random.PRNGKey(5)),
        "rejected_labels": mk(jax.random.PRNGKey(5)),
    }
    init_fn, step_fn = make_dpo_step(CFG, TCFG)
    with mesh:
        opt_state = init_fn(policy)
        policy, opt_state, metrics = jax.jit(step_fn)(
            params, policy, None, opt_state, batch
        )
    assert np.isfinite(float(metrics["loss"]))


def test_chunked_dispatch_matches_per_step(tmp_path):
    """steps_per_dispatch>1 (lax.scan'd chunks, donated carry) must produce
    the same training trajectory and the same per-step metric records as
    the per-step loop (pdec.train.loop._train_loop_chunked)."""
    from pdec.train.loop import LoopConfig, train_loop

    def run(steps_per_dispatch):
        params = init_params(jax.random.PRNGKey(0), CFG)
        init_fn, step_fn = make_sft_step(CFG, TCFG, train_lora=False)
        state = {"params": params, "lora": None,
                 "opt_state": init_fn(params, None)}
        rng = np.random.default_rng(0)

        def batches():
            while True:
                tokens = rng.integers(
                    0, CFG.vocab_size, (2, 2, 32), dtype=np.int32
                )
                yield {"input_ids": tokens, "labels": tokens}

        records = []
        state, step = train_loop(
            step_fn, state, batches(),
            LoopConfig(total_steps=7, save_interval=100,
                       backup_interval=5, log_every=100,
                       steps_per_dispatch=steps_per_dispatch),
            metric_sink=lambda s, m: records.append((s, m["loss"])),
        )
        assert step == 7
        return state, records

    ref_state, ref_records = run(1)
    chk_state, chk_records = run(3)  # chunks: 3, 2 (backup@5), 2

    assert [s for s, _ in chk_records] == [s for s, _ in ref_records]
    for (_, a), (_, b) in zip(ref_records, chk_records):
        np.testing.assert_allclose(a, b, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ref_state["params"]),
                    jax.tree.leaves(chk_state["params"])):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
        )
