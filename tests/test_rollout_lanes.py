"""Lane-major rollout kernel: reference parity + adjoint correctness.

Pallas kernels run in interpret mode on CPU; the executable spec
(`rollout_lanes_reference`) provides the ground truth, and the adjoint is
checked against autodiff through the reference.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pdec.ops.rollout_lanes as rl
from pdec.ops.rollout_lanes import (
    pack_lanes,
    rollout_lanes_reference,
    unpack_lanes,
)
from pdec.physics.heat import build_heat_system
from pdec.physics.rollout import rollout_states


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """Force interpret-mode pallas_call on CPU."""
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(rl.pl, "pallas_call", patched)


def make_instances(n_inst=5, s=6, n_chunks=4, chunk=8, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 5)
    a = jax.random.normal(ks[0], (n_inst, s, s)) * (0.5 / s)
    a = a + jnp.eye(s)[None] * 0.7
    b = jax.random.normal(ks[1], (n_inst, s))
    c = jax.random.normal(ks[2], (n_inst, s)) * 0.1
    x0 = jax.random.normal(ks[3], (n_inst, s))
    u = jax.random.normal(ks[4], (n_inst, n_chunks))
    return a, b, c, x0, u


def test_reference_matches_plain_rollout():
    """The lane-major executable spec == the production scan rollout."""
    a, b, c, x0, u = make_instances()
    chunk, stride = 8, 2
    s_pad = 8
    at = pack_lanes(a, s_pad)
    bt, ct, x0t = (pack_lanes(v, s_pad) for v in (b, c, x0))
    ut = pack_lanes(u)
    y = rollout_lanes_reference(at, bt, ct, x0t, ut, chunk, stride)
    got = unpack_lanes(y, a.shape[0])  # [B, T//stride, s_pad]

    for i in range(a.shape[0]):
        fine_u = jnp.repeat(u[i], chunk)
        states = rollout_states(a[i], b[i], c[i], x0[i], fine_u)
        expect = states[stride::stride]  # states at k = stride, 2*stride, ...
        np.testing.assert_allclose(
            np.asarray(got[i][:, : a.shape[1]]), np.asarray(expect),
            rtol=2e-5, atol=2e-5,
        )


def test_kernel_matches_reference_interpret():
    a, b, c, x0, u = make_instances(n_inst=3, s=5, n_chunks=3, chunk=4)
    chunk, stride = 4, 2
    s_pad = 8
    args = (
        pack_lanes(a, s_pad),
        pack_lanes(b, s_pad),
        pack_lanes(c, s_pad),
        pack_lanes(x0, s_pad),
        pack_lanes(u),
    )
    ref = rollout_lanes_reference(*args, chunk, stride)
    got = rl.rollout_lanes(*args, chunk, stride)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_adjoint_matches_autodiff():
    a, b, c, x0, u = make_instances(n_inst=2, s=4, n_chunks=3, chunk=4)
    chunk, stride = 4, 2
    s_pad = 8
    at = pack_lanes(a, s_pad)
    bt, ct, x0t = (pack_lanes(v, s_pad) for v in (b, c, x0))
    ut = pack_lanes(u)
    key = jax.random.PRNGKey(3)

    def loss_kernel(ut):
        y = rl.rollout_lanes(at, bt, ct, x0t, ut, chunk, stride)
        w = jax.random.normal(key, y.shape)
        return jnp.sum(y * w)

    def loss_ref(ut):
        y = rollout_lanes_reference(at, bt, ct, x0t, ut, chunk, stride)
        w = jax.random.normal(key, y.shape)
        return jnp.sum(y * w)

    g_kernel = jax.grad(loss_kernel)(ut)
    g_ref = jax.grad(loss_ref)(ut)
    np.testing.assert_allclose(np.asarray(g_kernel), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_physics_system_through_lanes():
    """A real heat system rolled out through the lane layout."""
    n = 8
    xpart = jnp.linspace(0.0, 1.0, n + 1)
    a_d, b_d, c_d, x0 = build_heat_system(
        xpart, jnp.ones((n,)), jnp.ones((n,)), jnp.asarray(1.5),
        jnp.asarray(0.02),
    )
    chunk, stride = 8, 4
    n_chunks = 4
    u = jnp.linspace(-1.0, 1.0, n_chunks)
    s_pad = 8
    args = (
        pack_lanes(a_d[None], s_pad),
        pack_lanes(b_d[None], s_pad),
        pack_lanes(c_d[None], s_pad),
        pack_lanes(x0[None], s_pad),
        pack_lanes(u[None]),
    )
    y = unpack_lanes(
        rollout_lanes_reference(*args, chunk, stride), 1
    )[0][:, :n]
    states = rollout_states(a_d, b_d, c_d, x0, jnp.repeat(u, chunk))
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(states[stride::stride]), rtol=1e-4, atol=1e-4
    )
