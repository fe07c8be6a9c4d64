"""Until-operator tests: semantics vs a brute-force oracle, smooth
convergence, parse round-trip, and gradient synthesis of an until spec.

U is beyond the reference's G/F-only dialect
(``eval_script.py:344-354``) — it is the BASELINE stretch config #3
surface ("nested STL always/until specs").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdec.control.synthesis import SynthesisConfig, synthesize
from pdec.stl.ast import Clause, Until, compile_spec
from pdec.stl.parse_latex import (
    format_sstl_latex,
    parse_clause_latex,
    parse_sstl_latex,
)
from pdec.stl.semantics import robustness, smooth_robustness

from tests.test_control import MAX_STEPS, small_heat_system


def _oracle_until(traj, ts, xs, u: Until):
    """Brute-force quantitative STL until at t = 0 (python loops)."""

    def pred_margin(c: Clause, t_idx):
        mask = (xs >= min(c.x0, c.x1) - 1e-6) & (xs <= max(c.x0, c.x1) + 1e-6)
        mu = c.m * np.asarray(xs) + c.b
        diff = np.asarray(traj[t_idx]) - mu
        if c.cmp_str in (">", ">="):
            vals = diff
        elif c.cmp_str in ("<", "<="):
            vals = -diff
        else:
            vals = -np.abs(diff)
        # node-only margin (intervals here align with grid nodes)
        return vals[np.asarray(mask)].min()

    ts_np = np.asarray(ts)
    best = -np.inf
    for t_idx in range(len(ts_np)):
        if not (u.t0 - 1e-6 <= ts_np[t_idx] <= u.t1 + 1e-6):
            continue
        rhs = pred_margin(u.rhs, t_idx)
        lhs_prefix = min(pred_margin(u.lhs, s) for s in range(t_idx + 1))
        best = max(best, min(rhs, lhs_prefix))
    return best


def _toy_trajectory():
    """Deterministic ramp field: u(t, x) = t - x."""
    ts = jnp.linspace(0.0, 1.0, 21)
    xs = jnp.linspace(0.0, 1.0, 9)
    traj = ts[:, None] - xs[None, :]
    return traj, ts, xs


@pytest.mark.parametrize("seed", range(4))
def test_until_hard_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    traj, ts, xs = _toy_trajectory()
    u = Until.make(
        (float(rng.uniform(0.1, 0.4)), float(rng.uniform(0.5, 0.9))),
        Clause.make("G", (0, 1), (0.0, 0.5), 0.0,
                    float(rng.uniform(-0.8, 0.2)), ">"),
        Clause.make("G", (0, 1), (0.5, 1.0), 0.0,
                    float(rng.uniform(-0.5, 0.5)), ">"),
    )
    spec = compile_spec(u)
    got = float(robustness(traj, ts, xs, jnp.asarray(spec.clauses),
                           jnp.asarray(spec.program)))
    want = _oracle_until(traj, ts, xs, u)
    assert got == pytest.approx(want, abs=1e-5)


def test_until_inside_junction_tree():
    """(clause AND until) compiles to 3 rows and evaluates both sides."""
    traj, ts, xs = _toy_trajectory()
    g_clause = Clause.make("G", (0.0, 0.5), (0.0, 1.0), 0.0, -2.0, ">")
    u = Until.make(
        (0.3, 0.8),
        Clause.make("G", (0, 1), (0.0, 0.5), 0.0, -1.0, ">"),
        Clause.make("G", (0, 1), (0.5, 1.0), 0.0, 0.0, ">"),
    )
    spec = compile_spec(("and", g_clause, u))
    assert spec.n_clauses == 3
    got = float(robustness(traj, ts, xs, jnp.asarray(spec.clauses),
                           jnp.asarray(spec.program)))
    u_only = compile_spec(u)
    u_val = float(robustness(traj, ts, xs, jnp.asarray(u_only.clauses),
                             jnp.asarray(u_only.program)))
    g_only = compile_spec(g_clause)
    g_val = float(robustness(traj, ts, xs, jnp.asarray(g_only.clauses),
                             jnp.asarray(g_only.program)))
    assert got == pytest.approx(min(g_val, u_val), abs=1e-6)


def test_until_smooth_converges_to_hard():
    traj, ts, xs = _toy_trajectory()
    u = Until.make(
        (0.2, 0.9),
        Clause.make("G", (0, 1), (0.0, 0.5), 0.0, -0.5, ">"),
        Clause.make("G", (0, 1), (0.5, 1.0), 0.0, 0.1, ">"),
    )
    spec = compile_spec(u)
    cl, pr = jnp.asarray(spec.clauses), jnp.asarray(spec.program)
    hard = float(robustness(traj, ts, xs, cl, pr))
    gaps = [
        abs(float(smooth_robustness(traj, ts, xs, cl, pr, tau)) - hard)
        for tau in (0.2, 0.02, 0.002)
    ]
    assert gaps[-1] < 5e-3
    assert gaps[0] > gaps[-1]  # monotone-ish convergence in tau


def test_until_parse_roundtrip():
    text = (
        "U_[[1.5, 4.0]] (\\forall x \\in [0, 1]  "
        "(u(x) - (0 \\cdot x + 0.8) < 0), \\forall x \\in [0, 1]  "
        "(u(x) - (0 \\cdot x + 0.45) > 0))"
    )
    u = parse_clause_latex(text)
    assert isinstance(u, Until)
    assert (u.t0, u.t1) == (1.5, 4.0)
    assert u.lhs.cmp_str == "<" and u.lhs.b == pytest.approx(0.8)
    assert u.rhs.cmp_str == ">" and u.rhs.b == pytest.approx(0.45)
    # round-trip through the formatter, also inside a junction
    formula = ("and", Clause.make("G", (0.0, 1.0), (0, 1), 0.0, -3.0, ">"), u)
    text2 = format_sstl_latex(formula)
    formula2 = parse_sstl_latex(text2)
    assert format_sstl_latex(formula2) == text2


def test_until_synthesis_two_phase():
    """'Stay below 0.8 until (within [1.5, 4]) the field exceeds 0.45':
    the synthesized control must heat enough to satisfy the RHS while the
    LHS cap forbids overshoot — verified against a 2-phase grid search."""
    import functools

    from tests.test_control import CHUNK, N_CHUNKS
    from pdec.control.synthesis import evaluate_controls

    system = small_heat_system()
    u = Until.make(
        (1.5, 4.0),
        Clause.make("G", (0, 1), (0.0, 1.0), 0.0, 1.6, "<"),
        Clause.make("G", (0, 1), (0.4, 1.0), 0.0, 0.45, ">"),
    )
    spec = compile_spec(u)
    cl, pr = jnp.asarray(spec.clauses), jnp.asarray(spec.program)

    @functools.partial(jax.jit)
    def grid_best(grid):
        def rho_of(u1, u2):
            half = N_CHUNKS // 2
            controls = jnp.concatenate(
                [jnp.full((half,), u1), jnp.full((N_CHUNKS - half,), u2)]
            )
            return evaluate_controls(system, controls, cl, pr, MAX_STEPS, CHUNK)

        rhos = jax.vmap(lambda a: jax.vmap(lambda b: rho_of(a, b))(grid))(grid)
        return jnp.max(rhos)

    best_grid = float(grid_best(jnp.linspace(-4.0, 4.0, 65)))
    res = synthesize(system, cl, pr, jax.random.PRNGKey(0), MAX_STEPS,
                     SynthesisConfig())
    rho = float(res.robustness)
    assert rho > 0, f"until spec unreachable: {rho}"
    assert rho >= best_grid - 0.01, (rho, best_grid)
