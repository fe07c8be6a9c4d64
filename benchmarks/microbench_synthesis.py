"""Microbenchmark: synthesis hot-loop components on the live device."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time, functools
import jax, jax.numpy as jnp, numpy as np
import random
from pdec.data.generator import GeneratorConfig, sample_problem
from pdec.physics.problem import problem_from_program, stack_systems, trajectory_times
from pdec.physics.rollout import precompute_chunk_operators, rollout_trajectory_chunked
from pdec.stl.ast import compile_spec, stack_specs
from pdec.stl.semantics import smooth_robustness
from pdec.control.fused import fused_smooth_robustness, make_clause_tables

B, STARTS, MAX_STEPS, CHUNK = 2048, 8, 320, 16
rng = random.Random(0)
systems, specs = [], []
while len(systems) < B:
    ex = sample_problem(rng, GeneratorConfig(kind="heat", n_clauses=rng.choice([1,2,3])))
    n_steps = int(round(ex.program.t_final / ex.program.dt))
    if n_steps > MAX_STEPS: continue
    systems.append(problem_from_program(ex.program, max_steps=MAX_STEPS))
    specs.append(compile_spec(ex.formula, 4, 8))
S = stack_systems(systems)
cl, pr = (jnp.asarray(a) for a in stack_specs(specs))
theta = jax.random.normal(jax.random.PRNGKey(0), (B, STARTS, MAX_STEPS // CHUNK))

def timeit(name, fn, *args):
    r = fn(*args); np.asarray(jax.tree.leaves(r)[0])  # compile+barrier
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); r = fn(*args); np.asarray(jax.tree.leaves(r)[0])
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1000:.1f} ms")

def rollout_only(theta):
    def per_problem(sys_i, th_i):
        ops = precompute_chunk_operators(sys_i.a_d, sys_i.b_d, sys_i.c_d, CHUNK)
        def per_start(th):
            u = sys_i.u_scale * jnp.tanh(th)
            traj = rollout_trajectory_chunked(*ops, sys_i.x0, u, sys_i.g0, sys_i.n_out)
            return jnp.sum(traj)
        return jax.vmap(per_start)(th_i)
    return jax.vmap(per_problem)(S, theta)

def fused_obj(theta):
    def per_problem(sys_i, cl_i, pr_i, th_i):
        ops = precompute_chunk_operators(sys_i.a_d, sys_i.b_d, sys_i.c_d, CHUNK)
        tables = make_clause_tables(cl_i, sys_i.xs)
        def per_start(th):
            u = sys_i.u_scale * jnp.tanh(th)
            return fused_smooth_robustness(*ops, sys_i.x0, sys_i.g0, sys_i.n_out, u, tables, pr_i, sys_i.dt, sys_i.n_steps, 0.1)
        return jax.vmap(per_start)(th_i)
    return jax.vmap(per_problem)(S, cl, pr, theta)

def unfused_obj(theta):
    def per_problem(sys_i, cl_i, pr_i, th_i):
        ops = precompute_chunk_operators(sys_i.a_d, sys_i.b_d, sys_i.c_d, CHUNK)
        ts = trajectory_times(sys_i.dt, sys_i.n_steps, MAX_STEPS)
        def per_start(th):
            u = sys_i.u_scale * jnp.tanh(th)
            traj = rollout_trajectory_chunked(*ops, sys_i.x0, u, sys_i.g0, sys_i.n_out)
            return smooth_robustness(traj, ts, sys_i.xs, cl_i, pr_i, 0.1)
        return jax.vmap(per_start)(th_i)
    return jax.vmap(per_problem)(S, cl, pr, theta)

timeit("rollout fwd", jax.jit(rollout_only), theta)
timeit("rollout fwd+bwd", jax.jit(jax.grad(lambda th: jnp.sum(rollout_only(th)))), theta)
timeit("fused fwd", jax.jit(fused_obj), theta)
timeit("fused fwd+bwd", jax.jit(jax.grad(lambda th: jnp.sum(fused_obj(th)))), theta)
timeit("unfused fwd", jax.jit(unfused_obj), theta)
timeit("unfused fwd+bwd", jax.jit(jax.grad(lambda th: jnp.sum(unfused_obj(th)))), theta)
