"""Control synthesis tests: reachability, optimality vs brute force,
disjunction coverage via multi-start, batching."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdec.control.synthesis import (
    SynthesisConfig,
    evaluate_controls,
    synthesize,
    synthesize_batch,
)
from pdec.physics.heat import build_heat_system
from pdec.physics.problem import DiscreteSystem, stack_systems
from pdec.stl.ast import Clause, compile_spec, stack_specs

MAX_STEPS = 96
CHUNK = 16
N_CHUNKS = MAX_STEPS // CHUNK
CFG = SynthesisConfig(chunk=CHUNK, n_iters=40, n_starts=4, lr=0.2)


def small_heat_system(n=8, length=1.0, g0=0.0, dt=0.05, alpha=1.0, u_scale=4.0):
    xpart = jnp.linspace(0.0, length, n + 1)
    a_d, b_d, c_d, x0 = build_heat_system(
        xpart, jnp.ones((n,)), jnp.full((n,), alpha), jnp.asarray(g0),
        jnp.asarray(dt),
    )
    return DiscreteSystem(
        a_d=a_d, b_d=b_d, c_d=c_d, x0=x0, g0=jnp.asarray(g0), xs=xpart,
        dt=jnp.asarray(dt), n_steps=jnp.asarray(MAX_STEPS, jnp.int32),
        u_scale=jnp.asarray(u_scale), n_out=n,
    )


@functools.partial(jax.jit, static_argnames=("max_steps", "config"))
def _synth(system, clauses, program, key, max_steps, config):
    return synthesize(system, clauses, program, key, max_steps, config)


def test_heat_reachability():
    """Heating spec achievable only with positive control input."""
    sys = small_heat_system()
    spec = compile_spec(
        Clause.make("G", (3.0, 5.0), (0.5, 1.0), 0.0, 1.0, ">")
    )
    cl, pr = jnp.asarray(spec.clauses), jnp.asarray(spec.program)
    zero_rho = evaluate_controls(sys, jnp.zeros((N_CHUNKS,)), cl, pr, MAX_STEPS, CHUNK)
    assert float(zero_rho) < 0  # unreachable without control
    res = _synth(sys, cl, pr, jax.random.PRNGKey(0), MAX_STEPS, CFG)
    assert float(res.robustness) > 0.3
    # result is self-consistent: re-evaluating the controls matches
    re_rho = evaluate_controls(sys, res.controls, cl, pr, MAX_STEPS, CHUNK)
    assert float(re_rho) == pytest.approx(float(res.robustness), abs=1e-5)


def test_beats_constant_control_grid():
    """Synthesis must at least match the best constant control."""
    sys = small_heat_system()
    spec = compile_spec(
        ("and",
         Clause.make("G", (2.0, 3.0), (0.5, 1.0), 0.0, 0.8, ">"),
         Clause.make("G", (4.0, 5.0), (0.5, 1.0), 0.0, 1.5, "<"))
    )
    cl, pr = jnp.asarray(spec.clauses), jnp.asarray(spec.program)

    grid = jnp.linspace(-4.0, 4.0, 81)
    const_rhos = jax.vmap(
        lambda u: evaluate_controls(
            sys, jnp.full((N_CHUNKS,), u), cl, pr, MAX_STEPS, CHUNK
        )
    )(grid)
    best_const = float(jnp.max(const_rhos))

    res = _synth(sys, cl, pr, jax.random.PRNGKey(1), MAX_STEPS, CFG)
    assert float(res.robustness) >= best_const - 0.02


def test_disjunction_multistart():
    """(G hot) or (G cold): gradient from one branch; multi-start covers it."""
    sys = small_heat_system()
    spec = compile_spec(
        ("or",
         Clause.make("G", (3.0, 5.0), (0.5, 1.0), 0.0, 1.2, ">"),
         Clause.make("G", (3.0, 5.0), (0.5, 1.0), 0.0, -1.2, "<"))
    )
    cl, pr = jnp.asarray(spec.clauses), jnp.asarray(spec.program)
    res = _synth(sys, cl, pr, jax.random.PRNGKey(2), MAX_STEPS, CFG)
    assert float(res.robustness) > 0.3


def test_infeasible_spec_reports_negative():
    """Contradictory conjunction stays negative but synthesis still returns."""
    sys = small_heat_system()
    spec = compile_spec(
        ("and",
         Clause.make("G", (3.0, 5.0), (0.5, 1.0), 0.0, 1.0, ">"),
         Clause.make("G", (3.0, 5.0), (0.5, 1.0), 0.0, -1.0, "<"))
    )
    cl, pr = jnp.asarray(spec.clauses), jnp.asarray(spec.program)
    res = _synth(sys, cl, pr, jax.random.PRNGKey(3), MAX_STEPS, CFG)
    assert float(res.robustness) < 0
    assert bool(jnp.isfinite(res.robustness))


def test_batched_matches_single():
    systems = [small_heat_system(), small_heat_system(alpha=0.5)]
    specs = [
        compile_spec(Clause.make("G", (3.0, 5.0), (0.5, 1.0), 0.0, 1.0, ">")),
        # note: region must exclude the x=0 Dirichlet node (pinned at 0),
        # otherwise u < -0.5 is structurally infeasible
        compile_spec(Clause.make("F", (1.0, 5.0), (0.4, 1.0), 0.0, -0.5, "<")),
    ]
    cl, pr = stack_specs(specs)
    stacked = stack_systems(systems)
    batched = jax.jit(
        functools.partial(synthesize_batch, max_steps=MAX_STEPS, config=CFG)
    )
    res = batched(stacked, jnp.asarray(cl), jnp.asarray(pr), key=jax.random.PRNGKey(0))
    assert res.robustness.shape == (2,)
    for i, (s, spec) in enumerate(zip(systems, specs)):
        single = _synth(
            s, jnp.asarray(spec.clauses), jnp.asarray(spec.program),
            jax.random.PRNGKey(9), MAX_STEPS, CFG,
        )
        # same problem, different keys: agree within optimization noise
        assert float(res.robustness[i]) == pytest.approx(
            float(single.robustness), abs=0.1
        )
        assert float(res.robustness[i]) > 0
