"""Robustness semantics tests: hard min/max, smooth convergence, batching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdec.stl.ast import Clause, compile_spec, stack_specs
from pdec.stl.semantics import robustness, smooth_robustness


def grid(T=21, X=11, t_max=2.0, x_max=10.0):
    ts = jnp.linspace(0.0, t_max, T)
    xs = jnp.linspace(0.0, x_max, X)
    return ts, xs


def test_g_clause_constant_field():
    ts, xs = grid()
    traj = jnp.full((21, 11), 5.0)
    # G_[0,2] forall x in [0,10]: u - 3 > 0  -> rho = 2
    c = Clause.make("G", (0.0, 2.0), (0.0, 10.0), 0.0, 3.0, ">")
    spec = compile_spec(c)
    r = robustness(traj, ts, xs, spec.clauses, spec.program)
    assert float(r) == pytest.approx(2.0, abs=1e-5)


def test_f_clause_picks_best_time():
    ts, xs = grid()
    # field ramps in time: u(t, x) = t
    traj = jnp.broadcast_to(ts[:, None], (21, 11))
    c = Clause.make("F", (0.0, 2.0), (0.0, 10.0), 0.0, 0.0, ">")
    spec = compile_spec(c)
    r = robustness(traj, ts, xs, spec.clauses, spec.program)
    assert float(r) == pytest.approx(2.0, abs=1e-5)  # max over time
    cg = Clause.make("G", (0.0, 2.0), (0.0, 10.0), 0.0, 0.0, ">")
    spec_g = compile_spec(cg)
    rg = robustness(traj, ts, xs, spec_g.clauses, spec_g.program)
    assert float(rg) == pytest.approx(0.0, abs=1e-5)  # min over time


def test_spatial_forall_min():
    ts, xs = grid()
    # u(t, x) = x: forall x in [2, 6]: u - 0 > 0 -> min at x=2
    traj = jnp.broadcast_to(xs[None, :], (21, 11))
    c = Clause.make("G", (0.0, 2.0), (2.0, 6.0), 0.0, 0.0, ">")
    spec = compile_spec(c)
    r = robustness(traj, ts, xs, spec.clauses, spec.program)
    assert float(r) == pytest.approx(2.0, abs=1e-5)


def test_spatial_interpolated_endpoints():
    ts, xs = grid()
    traj = jnp.broadcast_to(xs[None, :], (21, 11))
    # interval [2.5, 3.5] contains node x=3 plus interpolated ends
    c = Clause.make("G", (0.0, 2.0), (2.5, 3.5), 0.0, 0.0, ">")
    spec = compile_spec(c)
    r = robustness(traj, ts, xs, spec.clauses, spec.program)
    assert float(r) == pytest.approx(2.5, abs=1e-5)
    # interval with no interior node still evaluates by interpolation
    c2 = Clause.make("G", (0.0, 2.0), (3.2, 3.8), 0.0, 0.0, ">")
    spec2 = compile_spec(c2)
    r2 = robustness(traj, ts, xs, spec2.clauses, spec2.program)
    assert float(r2) == pytest.approx(3.2, abs=1e-5)


def test_lt_and_eq_margins():
    ts, xs = grid()
    traj = jnp.full((21, 11), 5.0)
    c_lt = Clause.make("G", (0.0, 2.0), (0.0, 10.0), 0.0, 8.0, "<")
    spec = compile_spec(c_lt)
    assert float(
        robustness(traj, ts, xs, spec.clauses, spec.program)
    ) == pytest.approx(3.0, abs=1e-5)
    c_eq = Clause.make("G", (0.0, 2.0), (0.0, 10.0), 0.0, 6.0, "=")
    spec = compile_spec(c_eq)
    assert float(
        robustness(traj, ts, xs, spec.clauses, spec.program)
    ) == pytest.approx(-1.0, abs=1e-5)


def test_linear_profile():
    ts, xs = grid()
    traj = jnp.broadcast_to(2.0 * xs[None, :] + 1.0, (21, 11))
    # u - (2x + 0.5) > 0 -> margin 0.5 everywhere
    c = Clause.make("G", (0.0, 2.0), (0.0, 10.0), 2.0, 0.5, ">")
    spec = compile_spec(c)
    assert float(
        robustness(traj, ts, xs, spec.clauses, spec.program)
    ) == pytest.approx(0.5, abs=1e-4)


def test_and_or_junctions():
    ts, xs = grid()
    traj = jnp.full((21, 11), 5.0)
    good = Clause.make("G", (0.0, 2.0), (0.0, 10.0), 0.0, 3.0, ">")  # +2
    bad = Clause.make("G", (0.0, 2.0), (0.0, 10.0), 0.0, 8.0, ">")  # -3
    spec_and = compile_spec(("and", good, bad))
    spec_or = compile_spec(("or", good, bad))
    assert float(
        robustness(traj, ts, xs, spec_and.clauses, spec_and.program)
    ) == pytest.approx(-3.0, abs=1e-5)
    assert float(
        robustness(traj, ts, xs, spec_or.clauses, spec_or.program)
    ) == pytest.approx(2.0, abs=1e-5)


def test_nested_junction_tree():
    ts, xs = grid()
    traj = jnp.full((21, 11), 5.0)

    def clause(thr):
        return Clause.make("G", (0.0, 2.0), (0.0, 10.0), 0.0, thr, ">")

    # (a AND b) OR (c AND d) with rho a=+4, b=+3, c=-1, d=-2 -> max(3, -2) = 3
    f = ("or", ("and", clause(1.0), clause(2.0)), ("and", clause(6.0), clause(7.0)))
    spec = compile_spec(f)
    assert float(
        robustness(traj, ts, xs, spec.clauses, spec.program)
    ) == pytest.approx(3.0, abs=1e-5)


def test_time_window_masking():
    ts, xs = grid()
    # u = 10 for t < 1, u = 0 for t >= 1
    traj = jnp.where(ts[:, None] < 1.0, 10.0, 0.0) * jnp.ones((1, 11))
    c = Clause.make("G", (0.0, 0.9), (0.0, 10.0), 0.0, 5.0, ">")
    spec = compile_spec(c)
    assert float(robustness(traj, ts, xs, spec.clauses, spec.program)) == pytest.approx(
        5.0, abs=1e-5
    )
    c2 = Clause.make("G", (1.1, 2.0), (0.0, 10.0), 0.0, 5.0, ">")
    spec2 = compile_spec(c2)
    assert float(
        robustness(traj, ts, xs, spec2.clauses, spec2.program)
    ) == pytest.approx(-5.0, abs=1e-5)


def test_smooth_converges_to_hard():
    ts, xs = grid()
    key = jax.random.PRNGKey(0)
    traj = 5.0 + jax.random.normal(key, (21, 11))
    f = (
        "or",
        ("and",
         Clause.make("G", (0.0, 1.0), (0.0, 5.0), 0.1, 3.0, ">"),
         Clause.make("F", (0.5, 2.0), (2.0, 8.0), 0.0, 6.0, "<")),
        Clause.make("F", (0.0, 2.0), (0.0, 10.0), 0.0, 4.0, ">"),
    )
    spec = compile_spec(f)
    hard = float(robustness(traj, ts, xs, spec.clauses, spec.program))
    prev_err = np.inf
    for tau in (0.5, 0.1, 0.02, 0.004):
        smooth = float(
            smooth_robustness(traj, ts, xs, spec.clauses, spec.program, tau)
        )
        err = abs(smooth - hard)
        assert err <= prev_err + 1e-4
        prev_err = err
    assert prev_err < 0.02


def test_smooth_is_differentiable():
    ts, xs = grid()
    c = Clause.make("G", (0.0, 2.0), (0.0, 10.0), 0.0, 3.0, ">")
    spec = compile_spec(c)

    def loss(traj):
        return -smooth_robustness(traj, ts, xs, spec.clauses, spec.program, 0.1)

    g = jax.grad(loss)(jnp.full((21, 11), 5.0))
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).sum()) > 0.0


def test_vmap_batching():
    ts, xs = grid()
    trajs = jnp.stack([jnp.full((21, 11), v) for v in (1.0, 5.0, 9.0)])
    specs = [
        compile_spec(Clause.make("G", (0.0, 2.0), (0.0, 10.0), 0.0, thr, ">"))
        for thr in (0.0, 3.0, 10.0)
    ]
    cl, pr = stack_specs(specs)
    batched = jax.vmap(robustness, in_axes=(0, None, None, 0, 0))
    out = batched(trajs, ts, xs, jnp.asarray(cl), jnp.asarray(pr))
    np.testing.assert_allclose(np.asarray(out), [1.0, 2.0, -1.0], atol=1e-5)
