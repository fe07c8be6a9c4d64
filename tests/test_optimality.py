"""Optimality tolerance harness.

The reference's ground truth is a Gurobi MILP global optimum; its recorded
optima are not in the snapshot (SURVEY.md §0.1), so global optimality is
checked against exhaustive grid search on problems small enough to
enumerate: synthesis must reach the best 2-phase control's robustness
within 1% of the problem's field scale (the BASELINE.md tolerance).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdec.control.synthesis import (
    SynthesisConfig,
    evaluate_controls,
    synthesize,
)
from pdec.stl.ast import Clause, compile_spec

from tests.test_control import CHUNK, MAX_STEPS, N_CHUNKS, small_heat_system

CFG = SynthesisConfig(chunk=CHUNK, n_iters=50, n_starts=6, eval_stride=2,
                      lr=0.25)


@functools.partial(jax.jit, static_argnames=())
def _grid_best(system, cl, pr, grid):
    """Exhaustive 2-phase control search: u = u1 for the first half of the
    horizon, u2 for the second."""

    def rho_of(u1, u2):
        half = N_CHUNKS // 2
        controls = jnp.concatenate(
            [jnp.full((half,), u1), jnp.full((N_CHUNKS - half,), u2)]
        )
        return evaluate_controls(system, controls, cl, pr, MAX_STEPS, CHUNK)

    rhos = jax.vmap(lambda u1: jax.vmap(lambda u2: rho_of(u1, u2))(grid))(grid)
    return jnp.max(rhos)


FORMULAS = [
    # heat-then-cool: genuinely needs a 2-phase control
    ("and",
     Clause.make("G", (1.5, 2.5), (0.5, 1.0), 0.0, 0.6, ">"),
     Clause.make("G", (4.0, 4.8), (0.5, 1.0), 0.0, 0.2, "<")),
    # tracking: hold the field near a profile
    Clause.make("G", (2.0, 4.5), (0.4, 1.0), 0.5, 0.3, "="),
    # disjunctive: two distant basins
    ("or",
     Clause.make("G", (3.0, 4.5), (0.5, 1.0), 0.0, 1.1, ">"),
     Clause.make("G", (3.0, 4.5), (0.5, 1.0), 0.0, -1.1, "<")),
]


@pytest.mark.parametrize("fidx", range(len(FORMULAS)))
def test_synthesis_within_tolerance_of_grid_optimum(fidx):
    system = small_heat_system()
    spec = compile_spec(FORMULAS[fidx])
    cl, pr = jnp.asarray(spec.clauses), jnp.asarray(spec.program)

    grid = jnp.linspace(-4.0, 4.0, 65)
    best_grid = float(_grid_best(system, cl, pr, grid))

    res = synthesize(system, cl, pr, jax.random.PRNGKey(fidx), MAX_STEPS, CFG)
    rho = float(res.robustness)

    # 1% of the field scale (profiles here are O(1))
    tolerance = 0.01 * 1.0
    assert rho >= best_grid - tolerance, (
        f"synthesis {rho:.4f} below grid optimum {best_grid:.4f}"
    )


@pytest.mark.parametrize("fidx", range(len(FORMULAS)))
def test_defaults_within_tolerance_of_grid_optimum(fidx):
    """Pin the SHIPPED ``SynthesisConfig.for_family("heat")`` defaults —
    exactly what bench.py and the eval path run — to the 1% tolerance.  A future
    "faster" default that degrades solution quality must fail here, not
    just shift an offline study (VERDICT r2 weak #2)."""
    system = small_heat_system()
    spec = compile_spec(FORMULAS[fidx])
    cl, pr = jnp.asarray(spec.clauses), jnp.asarray(spec.program)

    grid = jnp.linspace(-4.0, 4.0, 65)
    best_grid = float(_grid_best(system, cl, pr, grid))

    res = synthesize(
        system, cl, pr, jax.random.PRNGKey(fidx), MAX_STEPS,
        SynthesisConfig.for_family("heat"),
    )
    rho = float(res.robustness)

    tolerance = 0.01 * 1.0
    assert rho >= best_grid - tolerance, (
        f"shipped defaults {rho:.4f} below grid optimum {best_grid:.4f}"
    )


# Crafted or-heavy specs (VERDICT r3 #10).  The reference resolves
# disjunctions globally via MILP integer branching (SURVEY.md §7.3's named
# correctness risk for the gradient rebuild); these cases are built so a
# single-basin local method fails: distant basins, disjuncts nested under
# conjunctions, four-way choices, and eventually-style disjuncts.
OR_FORMULAS = [
    # four-way basin choice: or(or(hot, cold), or(track-high, track-low))
    ("or",
     ("or",
      Clause.make("G", (3.0, 4.5), (0.5, 1.0), 0.0, 1.1, ">"),
      Clause.make("G", (3.0, 4.5), (0.5, 1.0), 0.0, -1.1, "<")),
     ("or",
      Clause.make("G", (3.0, 4.5), (0.4, 1.0), 0.5, 0.3, "="),
      Clause.make("G", (3.0, 4.5), (0.4, 1.0), -0.5, -0.3, "="))),
    # disjunction under conjunction: warm up early AND end in one of two
    # far-apart states — committing to the wrong disjunct early is
    # unrecoverable within the horizon
    ("and",
     Clause.make("G", (1.0, 2.0), (0.4, 1.0), 0.0, 0.3, ">"),
     ("or",
      Clause.make("G", (4.0, 4.8), (0.5, 1.0), 0.0, 1.0, ">"),
      Clause.make("G", (4.0, 4.8), (0.5, 1.0), 0.0, -0.6, "<"))),
    # asymmetric basins: a tracking disjunct (margin capped near 0) vs a
    # threshold disjunct whose margin keeps growing with effort — the
    # global optimum is the threshold branch, a lazy local method
    # satisfies the tracker and stops
    ("or",
     Clause.make("G", (2.0, 4.5), (0.4, 1.0), 0.0, 0.0, "="),
     Clause.make("G", (3.0, 4.5), (0.5, 1.0), 0.0, 0.8, ">")),
    # eventually-one-of-two: reach either extreme at some point late
    ("or",
     Clause.make("F", (3.5, 4.8), (0.5, 1.0), 0.0, 1.4, ">"),
     Clause.make("F", (3.5, 4.8), (0.5, 1.0), 0.0, -1.4, "<")),
]


@pytest.mark.parametrize("fidx", range(len(OR_FORMULAS)))
def test_disjunction_stress_at_shipped_defaults(fidx):
    """Or-heavy specs at the SHIPPED heat defaults must still clear the
    exhaustive 2-phase grid optimum within the 1% tolerance — the
    multi-start batching is the rebuild's answer to MILP integer
    branching, so it is pinned here on specs designed to defeat a
    single-basin local optimizer."""
    system = small_heat_system()
    spec = compile_spec(OR_FORMULAS[fidx])
    cl, pr = jnp.asarray(spec.clauses), jnp.asarray(spec.program)

    grid = jnp.linspace(-4.0, 4.0, 65)
    best_grid = float(_grid_best(system, cl, pr, grid))

    res = synthesize(
        system, cl, pr, jax.random.PRNGKey(100 + fidx), MAX_STEPS,
        SynthesisConfig.for_family("heat"),
    )
    rho = float(res.robustness)

    tolerance = 0.01 * 1.0
    assert rho >= best_grid - tolerance, (
        f"or-stress[{fidx}] {rho:.4f} below grid optimum {best_grid:.4f}"
    )


def test_wave_defaults_within_tolerance_of_grid_optimum():
    """Wave family (second-order dynamics, unit-circle spectra): the
    shipped ``for_family("wave")`` defaults (coarser eval/sel strides —
    wave's fine grid is 20x heat's in time) must also clear the
    exhaustive 2-phase grid optimum
    within the 1% tolerance.  The heat-only harness left wave quality
    vouched only by end-to-end tests (the family where controller
    guidance matters most — see docs/ROUND3.md)."""
    from pdec.physics.problem import problem_from_program
    from pdec.stl.program import parse_fem_program
    from tests.test_wave_synthesis import WAVE_PROGRAM

    prog = parse_fem_program(WAVE_PROGRAM)
    max_steps = 256
    system = problem_from_program(prog, max_steps=max_steps)
    spec = compile_spec(prog.formula)
    cl, pr = jnp.asarray(spec.clauses), jnp.asarray(spec.program)

    cfg = SynthesisConfig.for_family("wave")
    n_chunks = max_steps // cfg.chunk
    half = n_chunks // 2
    grid = jnp.linspace(-1.0, 1.0, 65) * system.u_scale

    @jax.jit
    def grid_best():
        def rho_of(u1, u2):
            controls = jnp.concatenate(
                [jnp.full((half,), u1), jnp.full((n_chunks - half,), u2)]
            )
            return evaluate_controls(system, controls, cl, pr, max_steps,
                                     cfg.chunk)
        rhos = jax.vmap(
            lambda u1: jax.vmap(lambda u2: rho_of(u1, u2))(grid)
        )(grid)
        return jnp.max(rhos)

    best_grid = float(grid_best())
    res = synthesize(system, cl, pr, jax.random.PRNGKey(0), max_steps, cfg)
    rho = float(res.robustness)
    assert rho >= best_grid - 0.01, (
        f"wave defaults {rho:.4f} below grid optimum {best_grid:.4f}"
    )
