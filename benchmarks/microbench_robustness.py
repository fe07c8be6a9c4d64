"""Bisect the smooth-robustness backward cost on the live device."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time
import jax, jax.numpy as jnp, numpy as np
from pdec.stl.ast import Clause, compile_spec
from pdec.stl.semantics import (
    smooth_robustness, _clause_robustness_smooth, _run_rpn,
    _clause_time_signal_smooth, _softmin_where,
)

B = 2048 * 8
T, X = 321, 31
key = jax.random.PRNGKey(0)
traj = jax.random.normal(key, (B, T, X)) * 10 + 300
ts = jnp.linspace(0, 16, T)
xs = jnp.linspace(0, 100, X)
spec = compile_spec(
    ("and", Clause.make("G", (1, 5), (10, 60), 0.1, 300, ">"),
            Clause.make("F", (6, 12), (20, 80), -0.1, 310, "<")),
    max_clauses=4, max_prog=8,
)
cl, pr = jnp.asarray(spec.clauses), jnp.asarray(spec.program)
tau = 0.5


def timeit(name, fn, *args):
    r = fn(*args); np.asarray(jax.tree.leaves(r)[0])
    times = []
    for _ in range(3):
        t0 = time.perf_counter(); r = fn(*args); np.asarray(jax.tree.leaves(r)[0])
        times.append(time.perf_counter() - t0)
    print(f"{name}: {min(times)*1000:.1f} ms")


def full(traj):
    return jnp.sum(jax.vmap(lambda t: smooth_robustness(t, ts, xs, cl, pr, tau))(traj))

def clauses_only(traj):
    def one(t):
        return jnp.sum(jax.vmap(lambda row: _clause_robustness_smooth(t, ts, xs, row, tau))(cl))
    return jnp.sum(jax.vmap(one)(traj))

def spatial_only(traj):
    def one(t):
        return jnp.sum(jax.vmap(lambda row: _clause_time_signal_smooth(t, ts, xs, row, tau))(cl))
    return jnp.sum(jax.vmap(one)(traj))

def rpn_only(vals):
    return jnp.sum(jax.vmap(lambda v: _run_rpn(
        v, pr,
        lambda a, b: -tau * jnp.logaddexp(-a / tau, -b / tau),
        lambda a, b: tau * jnp.logaddexp(a / tau, b / tau)))(vals))

vals = jax.random.normal(key, (B, 4))
timeit("full fwd", jax.jit(full), traj)
timeit("full bwd", jax.jit(jax.grad(full)), traj)
timeit("clauses fwd", jax.jit(clauses_only), traj)
timeit("clauses bwd", jax.jit(jax.grad(clauses_only)), traj)
timeit("spatial fwd", jax.jit(spatial_only), traj)
timeit("spatial bwd", jax.jit(jax.grad(spatial_only)), traj)
timeit("rpn fwd", jax.jit(rpn_only), vals)
timeit("rpn bwd", jax.jit(jax.grad(rpn_only)), vals)
