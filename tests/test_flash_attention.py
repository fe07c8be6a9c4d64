"""Interpret-mode parity tests for the Pallas flash-attention kernel.

The kernel is device-validated on TPU (benchmarks/flash_check.py, PARITY
N5); this suite runs the same kernel through the Pallas interpreter on CPU
so regressions surface without a TPU session.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdec.ops.attention import attention_reference
from pdec.ops.flash_attention import _flash_forward


def _rand_qkv(key, b, t, hq, hkv, d):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, t, hq, d), jnp.float32)
    k = jax.random.normal(kk, (b, t, hkv, d), jnp.float32)
    v = jax.random.normal(kv, (b, t, hkv, d), jnp.float32)
    return q, k, v


@pytest.mark.parametrize(
    "t,hq,hkv,q_block,kv_block",
    [
        (256, 4, 4, 256, 256),  # single q block, MHA
        (512, 4, 2, 256, 256),  # multi-block causal skipping, GQA
        (256, 8, 2, 128, 128),  # group of 4, smaller tiles
    ],
)
def test_flash_forward_matches_reference(t, hq, hkv, q_block, kv_block):
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), 2, t, hq, hkv, 64)
    got = _flash_forward(q, k, v, q_block, kv_block, interpret=True)
    want = attention_reference(q, k, v, causal=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )


def test_flash_forward_causality(monkeypatch):
    """Future kv must not leak: perturbing k/v at position j only changes
    outputs at positions >= j."""
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), 1, 256, 2, 2, 64)
    base = _flash_forward(q, k, v, 128, 128, interpret=True)
    k2 = k.at[:, 200].add(10.0)
    v2 = v.at[:, 200].add(10.0)
    out = _flash_forward(q, k2, v2, 128, 128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out[:, :200]), np.asarray(base[:, :200]), atol=1e-5
    )
    assert not np.allclose(np.asarray(out[:, 200:]), np.asarray(base[:, 200:]))
