"""Multi-material coupled thermoelastic rod (BASELINE stretch config #3).

The only control is the boundary heat input; the elastic rod moves through
thermal expansion.  Verifies the physics signs/invariants and synthesizes a
nested always/until spec constraining BOTH fields.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdec.control.synthesis import SynthesisConfig, synthesize
from pdec.physics.coupled import coupled_system
from pdec.physics.rollout import rollout_trajectory
from pdec.stl.ast import Clause, Until, compile_spec

N = 8
L = 1.0
DT = 0.05
MAX_STEPS = 96


def _system(alpha=0.1, e_in=1.0, e_out=2.0):
    """Two-material rod: stiffer outer thirds, softer middle."""
    xpart = jnp.linspace(0.0, L, N + 1)
    mids = 0.5 * (xpart[:-1] + xpart[1:])
    inner = (mids > L / 3) & (mids < 2 * L / 3)
    wave_e = jnp.where(inner, e_in, e_out)
    return coupled_system(
        xpart,
        heat_rho_e=jnp.ones((N,)),
        heat_k_e=jnp.ones((N,)),
        wave_rho_e=jnp.ones((N,)),
        wave_e_e=wave_e,
        alpha_e=jnp.full((N,), alpha),
        g0=0.0,
        dt=jnp.asarray(DT),
        n_steps=MAX_STEPS,
        u_scale=jnp.asarray(4.0),
    )


def _traj(system, controls):
    return rollout_trajectory(
        system.a_d, system.b_d, system.c_d, system.x0, controls,
        system.g0, system.n_out,
    )


def test_zero_control_is_stress_free():
    """At T == g0 everywhere, both fields stay at rest (the T_ref = g0
    baseline must cancel the coupling load exactly)."""
    sys_ = _system()
    traj = _traj(sys_, jnp.zeros((MAX_STEPS,)))
    np.testing.assert_allclose(np.asarray(traj), 0.0, atol=1e-6)


def test_heating_expands_the_rod():
    """Positive heat input raises temperatures and pushes the free tip to
    positive displacement; the clamped end stays at zero."""
    sys_ = _system()
    traj = np.asarray(_traj(sys_, jnp.full((MAX_STEPS,), 2.0)))
    temps = traj[:, : N + 1]
    disp = traj[:, N + 1:]
    assert temps[-1, N] > 0.5  # tip temperature rose
    assert disp[-1, -1] > 0.01, f"tip displacement {disp[-1, -1]}"
    np.testing.assert_allclose(disp[:, 0], 0.0, atol=1e-7)  # clamped
    # cooling contracts: negative input -> negative tip displacement
    traj2 = np.asarray(_traj(sys_, jnp.full((MAX_STEPS,), -2.0)))
    assert traj2[-1, -1] < -0.01


def test_coupled_until_always_synthesis():
    """Config #3 verbatim: a nested always/until spec over both fields —
    keep the mid-rod temperature capped ALWAYS, and keep the tip
    displacement small UNTIL it must exceed a target late in the horizon.
    Gradient synthesis must find a positive-robustness control."""
    sys_ = _system()
    # temperature clauses live on [0, L]; displacement on [2L, 3L]
    cap = Clause.make("G", (0.0, 4.8), (0.0, 1.0), 0.0, 3.5, "<")
    u = Until.make(
        (2.0, 4.5),
        Clause.make("G", (0, 1), (2.0 + 0.25, 3.0), 0.0, 0.2, "<"),
        Clause.make("G", (0, 1), (2.0 + 0.75, 3.0), 0.0, 0.05, ">"),
    )
    spec = compile_spec(("and", cap, u))
    cl, pr = jnp.asarray(spec.clauses), jnp.asarray(spec.program)
    res = synthesize(
        sys_, cl, pr, jax.random.PRNGKey(0), MAX_STEPS, SynthesisConfig()
    )
    rho = float(res.robustness)
    assert rho > 0, f"coupled until/always spec not satisfied: rho={rho}"
    # and the found control actually respects the temperature cap
    traj = np.asarray(_traj(sys_, jnp.repeat(np.asarray(res.controls), 16)))
    assert traj[:, : N + 1].max() < 3.5


def test_multi_material_changes_response():
    """Material layout matters: a softer middle third yields a different
    tip response than a uniform rod under the same heating."""
    soft = _system(e_in=0.5, e_out=2.0)
    uniform = _system(e_in=2.0, e_out=2.0)
    c = jnp.full((MAX_STEPS,), 2.0)
    tip_soft = float(np.asarray(_traj(soft, c))[-1, -1])
    tip_uni = float(np.asarray(_traj(uniform, c))[-1, -1])
    assert abs(tip_soft - tip_uni) > 1e-4
