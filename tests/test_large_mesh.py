"""Large-mesh implicit rollout (Thomas solver) tests."""

import jax
import jax.numpy as jnp
import numpy as np

from pdec.ops.tridiag import thomas_solve
from pdec.physics.heat import build_heat_system
from pdec.physics.large_mesh import rollout_heat_implicit
from pdec.physics.rollout import rollout_states


def test_thomas_solve_matches_dense():
    key = jax.random.PRNGKey(0)
    n = 64
    diag = 4.0 + jax.random.uniform(key, (n,))
    off = jax.random.uniform(jax.random.PRNGKey(1), (n - 1,)) - 0.5
    rhs = jax.random.normal(jax.random.PRNGKey(2), (n,))
    lower = jnp.concatenate([jnp.zeros((1,)), off])
    upper = jnp.concatenate([off, jnp.zeros((1,))])
    x = thomas_solve(lower, diag, upper, rhs)
    dense = jnp.diag(diag) + jnp.diag(off, 1) + jnp.diag(off, -1)
    np.testing.assert_allclose(
        np.asarray(dense @ x), np.asarray(rhs), atol=1e-5
    )


def test_implicit_rollout_matches_dense_propagator():
    """On a corpus-sized mesh the O(N) implicit path must reproduce the
    dense-propagator rollout exactly (same theta scheme, same assembly)."""
    n = 30
    xpart = jnp.linspace(0.0, 100.0, n + 1)
    rho_e = jnp.full((n,), 0.5)
    elastic_e = jnp.full((n,), 1.2)
    g0 = jnp.asarray(300.0)
    dt = jnp.asarray(0.05)
    controls = 50.0 * jnp.sin(jnp.linspace(0.0, 6.0, 200))

    a_d, b_d, c_d, x0 = build_heat_system(xpart, rho_e, elastic_e, g0, dt)
    want = rollout_states(a_d, b_d, c_d, x0, controls)
    got = rollout_heat_implicit(xpart, rho_e, elastic_e, g0, dt, controls)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-3
    )


def test_implicit_rollout_scales_to_fine_mesh():
    """N = 4096 nodes: the dense path would need a 4096^2 propagator and an
    O(N^3) factorization; the tridiagonal path just runs."""
    n = 4096
    xpart = jnp.linspace(0.0, 100.0, n + 1)
    rho_e = jnp.full((n,), 0.5)
    elastic_e = jnp.full((n,), 1.2)
    states = jax.jit(rollout_heat_implicit)(
        xpart, rho_e, elastic_e, jnp.asarray(300.0), jnp.asarray(0.05),
        jnp.full((20,), 25.0),
    )
    assert states.shape == (21, n)
    assert np.isfinite(np.asarray(states)).all()
    # diffusion from a uniform start stays near the initial temperature
    assert abs(float(states[-1, n // 2]) - 300.0) < 50.0


def test_implicit_rollout_batches_under_vmap():
    n = 128
    xpart = jnp.linspace(0.0, 100.0, n + 1)
    rho_e = jnp.full((n,), 0.5)
    elastic_e = jnp.full((n,), 1.2)
    controls = jnp.stack([jnp.full((50,), u) for u in (-20.0, 0.0, 20.0)])
    out = jax.vmap(
        lambda c: rollout_heat_implicit(
            xpart, rho_e, elastic_e, jnp.asarray(300.0), jnp.asarray(0.05), c
        )
    )(controls)
    assert out.shape == (3, 51, n)
    # stronger heating ends warmer at the controlled end
    assert float(out[2, -1, -1]) > float(out[0, -1, -1])
