"""Model tests: forward shapes, cache-decode parity, LoRA semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pdec.models.config import TINY
from pdec.models.lora import init_lora, merge_lora
from pdec.models.transformer import (
    IGNORE_INDEX,
    forward,
    init_kv_cache,
    init_params,
    loss_fn,
)

CFG = TINY


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), CFG)


def test_forward_shapes(params):
    tokens = jnp.ones((2, 16), jnp.int32)
    logits, cache = forward(params, tokens, CFG)
    assert logits.shape == (2, 16, CFG.vocab_size)
    assert cache is None
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_causality(params):
    """Changing a future token must not change past logits."""
    key = jax.random.PRNGKey(1)
    tokens = jax.random.randint(key, (1, 12), 0, CFG.vocab_size)
    logits1, _ = forward(params, tokens, CFG)
    tokens2 = tokens.at[0, 8].set((tokens[0, 8] + 1) % CFG.vocab_size)
    logits2, _ = forward(params, tokens2, CFG)
    np.testing.assert_allclose(
        np.asarray(logits1[0, :8]), np.asarray(logits2[0, :8]), atol=1e-5
    )
    assert not np.allclose(np.asarray(logits1[0, 8:]), np.asarray(logits2[0, 8:]))


def test_kv_cache_decode_matches_full_forward(params):
    key = jax.random.PRNGKey(2)
    tokens = jax.random.randint(key, (2, 10), 0, CFG.vocab_size)
    full_logits, _ = forward(params, tokens, CFG)

    # prefill 6, then decode 4 tokens one at a time
    cache = init_kv_cache(CFG, batch=2, max_len=16)
    prefill_logits, cache = forward(params, tokens[:, :6], CFG, kv_cache=cache)
    np.testing.assert_allclose(
        np.asarray(full_logits[:, :6]), np.asarray(prefill_logits), atol=2e-2,
        rtol=1e-2,
    )
    for i in range(6, 10):
        step_logits, cache = forward(params, tokens[:, i : i + 1], CFG, kv_cache=cache)
        np.testing.assert_allclose(
            np.asarray(full_logits[:, i]), np.asarray(step_logits[:, 0]),
            atol=2e-2, rtol=1e-2,
        )


def test_loss_masking(params):
    tokens = jnp.ones((1, 8), jnp.int32)
    labels_all_masked = jnp.full((1, 8), IGNORE_INDEX)
    # fully masked labels -> zero loss (and no NaN)
    loss = loss_fn(params, tokens, labels_all_masked, CFG)
    assert float(loss) == 0.0
    labels = jnp.where(jnp.arange(8) < 4, IGNORE_INDEX, tokens)
    loss = loss_fn(params, tokens, labels, CFG)
    assert float(loss) > 0


def test_tiny_training_reduces_loss(params):
    """A few Adam steps on one batch must reduce the SFT loss."""
    key = jax.random.PRNGKey(3)
    tokens = jax.random.randint(key, (4, 32), 0, CFG.vocab_size)
    labels = tokens
    opt = optax.adam(1e-3)

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(p, tokens, labels, CFG)
        )(p)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    p = params
    s = opt.init(p)
    first = None
    for i in range(10):
        p, s, loss = step(p, s)
        if first is None:
            first = float(loss)
    assert float(loss) < first


def test_lora_zero_at_init(params):
    lora = init_lora(jax.random.PRNGKey(4), CFG, rank=4, alpha=8)
    tokens = jnp.ones((1, 8), jnp.int32)
    base, _ = forward(params, tokens, CFG)
    with_lora, _ = forward(params, tokens, CFG, lora=lora)
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_lora), atol=1e-6)


def test_lora_merge_equivalence(params):
    key = jax.random.PRNGKey(5)
    lora = init_lora(key, CFG, rank=4, alpha=8)
    # give B nonzero values so the delta is active
    lora["layers"] = jax.tree.map(
        lambda v: v + 0.01 * jax.random.normal(key, v.shape, v.dtype),
        lora["layers"],
    )
    tokens = jax.random.randint(key, (2, 8), 0, CFG.vocab_size)
    with_lora, _ = forward(params, tokens, CFG, lora=lora)
    merged = merge_lora(params, lora)
    merged_out, _ = forward(merged, tokens, CFG)
    # fp32 reassociation through stacked layers: x@W + (x@A)@B*s vs
    # x@(W + A@B*s) differ at ~5e-3 on logits
    np.testing.assert_allclose(
        np.asarray(with_lora), np.asarray(merged_out), atol=2e-2, rtol=2e-2
    )


def test_remat_matches(params):
    tokens = jnp.ones((1, 16), jnp.int32)
    a, _ = forward(params, tokens, CFG, remat=False)
    b, _ = forward(params, tokens, CFG, remat=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
