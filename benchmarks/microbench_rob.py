"""Isolate the smooth-robustness reduction cost and race rewrite candidates.

Stages (B problems x 6 starts, traj [81, 32] per instance):
  G0 affine traj einsum only, fwd+bwd
  G1 current smooth_robustness on a given traj, fwd+bwd (grad wrt traj)
  G2 precompiled-clause-table variant: no select/interp in the hot loop,
     joint (t,x) logsumexp for G clauses, additive -inf masks
  G3 G2 at half batch (latency vs throughput bound check)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import build_batch
from pdec.physics.problem import trajectory_times
from pdec.physics.spectral import spectral_trajectory_strided
from pdec.stl.ast import CMP_EQ, CMP_GE, CMP_GT, CMP_LE, CMP_LT, TEMP_F
from pdec.stl.semantics import smooth_robustness

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
MAX_STEPS, CHUNK, STRIDE, STARTS = 320, 16, 4, 6
TAU = 5.0
systems, cl, pr = build_batch(B, MAX_STEPS)
key = jax.random.PRNGKey(0)
n_chunks = MAX_STEPS // CHUNK
theta = jax.random.normal(key, (B, STARTS, n_chunks))


def timeit(name, fn, *args, reps=3):
    t0 = time.perf_counter()
    r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0])
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        np.asarray(jax.tree.leaves(r)[0])
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1000:.1f} ms   (first call {compile_s:.1f} s)",
          flush=True)
    return r


def affine_ops(sys_i):
    def traj_of(u):
        return spectral_trajectory_strided(
            sys_i.spectral, u, sys_i.g0, sys_i.n_out, CHUNK, STRIDE
        )

    zeros = jnp.zeros((n_chunks,))
    return traj_of(zeros), jax.jacfwd(traj_of)(zeros)


T0, W = jax.jit(jax.vmap(affine_ops))(systems)
_ = np.asarray(T0[0])

# trajectories for robustness-only stages
def mk_traj(theta, T0, W):
    def per_problem(sys_i, t0_i, w_i, th_i):
        def per_start(th):
            u = sys_i.u_scale * jnp.tanh(th)
            return t0_i + jnp.einsum("txc,c->tx", w_i, u)
        return jax.vmap(per_start)(th_i)
    return jax.vmap(per_problem)(systems, T0, W, theta)


TRAJ = jax.jit(mk_traj)(theta, T0, W)
_ = np.asarray(TRAJ[0, 0, 0])
print(f"traj {TRAJ.shape}", flush=True)


def g0(theta, T0, W):
    return jnp.sum(mk_traj(theta, T0, W))


timeit("G0 traj einsum fwd+bwd      ", jax.jit(jax.grad(g0)), theta, T0, W)


def g1(traj):
    def per_problem(sys_i, cl_i, pr_i, tr_i):
        ts = trajectory_times(sys_i.dt, sys_i.n_steps, MAX_STEPS)[::STRIDE]

        def per_start(tr):
            return smooth_robustness(tr, ts, sys_i.xs, cl_i, pr_i, TAU)

        return jax.vmap(per_start)(tr_i)

    return jnp.sum(jax.vmap(per_problem)(systems, cl, pr, TRAJ))


timeit("G1 current smooth_rob f+b   ", jax.jit(jax.grad(lambda tr: g1(tr))),
       TRAJ)

# ---- G2: clause tables precompiled on the host side of the iteration ----
# per problem+clause: sign [C], mu over X+2 cols [C, X+2], joint log-mask
# [C, T, X+2] (0 inside time&space window, -inf outside), is_F [C],
# endpoint interp weights folded into an extended trajectory.
_EPS = 1e-6
_NEG = -1e30


def clause_tables(sys_i, cl_i):
    ts = trajectory_times(sys_i.dt, sys_i.n_steps, MAX_STEPS)[::STRIDE]
    xs = sys_i.xs

    def one(row):
        temp_op, t0_, t1_, x0, x1, m, b, cmp = tuple(row[i] for i in range(8))
        lo, hi = jnp.minimum(x0, x1), jnp.maximum(x0, x1)
        # endpoint hat weights [2, X]
        h = xs[1] - xs[0]
        q = jnp.clip(jnp.stack([lo, hi]), xs[0], xs[-1])
        wq = jnp.maximum(0.0, 1.0 - jnp.abs(q[:, None] - xs[None, :]) / h)
        wq = wq / jnp.maximum(jnp.sum(wq, axis=1, keepdims=True), 1e-9)
        mu_nodes = m * xs + b
        mu_ends = m * q + b
        mu = jnp.concatenate([mu_nodes, mu_ends])  # [X+2]
        sign = jnp.where(
            (cmp == CMP_LT) | (cmp == CMP_LE), -1.0, 1.0
        )
        is_eq = (cmp == CMP_EQ)
        mask_x = (xs >= lo - _EPS) & (xs <= hi + _EPS)
        mask_x = jnp.concatenate([mask_x, jnp.ones((2,), bool)])
        mask_t = (ts >= t0_ - _EPS) & (ts <= t1_ + _EPS)
        # nonempty guard (same as _ensure_nonempty)
        center = jnp.abs(ts - 0.5 * (t0_ + t1_))
        nearest = jnp.argmin(center)
        mask_t = jnp.where(jnp.any(mask_t), mask_t,
                           jnp.arange(ts.shape[0]) == nearest)
        logmask = jnp.where(mask_t[:, None] & mask_x[None, :], 0.0, _NEG)
        return wq, mu, sign, is_eq, logmask, (temp_op == TEMP_F), mask_t

    return jax.vmap(one)(cl_i)


TABLES = jax.jit(jax.vmap(clause_tables))(systems, cl)
_ = np.asarray(TABLES[0][0, 0, 0])


def rpn_fast(vals, program, and2, or2):
    # same fixed-stack RPN as semantics._run_rpn
    from pdec.stl.ast import STACK_DEPTH

    def step(carry, token):
        stack, sp = carry
        op, arg = token[0], token[1]

        def do_nop(stack, sp):
            return stack, sp

        def do_push(stack, sp):
            return stack.at[sp].set(vals[arg]), sp + 1

        def do_and(stack, sp):
            return stack.at[sp - 2].set(and2(stack[sp - 2], stack[sp - 1])), sp - 1

        def do_or(stack, sp):
            return stack.at[sp - 2].set(or2(stack[sp - 2], stack[sp - 1])), sp - 1

        stack, sp = jax.lax.switch(jnp.clip(op, 0, 3),
                                   [do_nop, do_push, do_and, do_or], stack, sp)
        return (stack, sp), None

    init = (jnp.zeros((STACK_DEPTH,), vals.dtype), jnp.int32(0))
    (stack, _), _ = jax.lax.scan(step, init, program)
    return stack[0]


def smooth_rob_fast(traj, tables, pr_i, tau):
    wq, mu, sign, is_eq, logmask, is_f, mask_t = tables
    ends = jnp.einsum("tx,cqx->ctq", traj, wq)  # [C, T, 2]
    nodes = jnp.broadcast_to(traj[None], (wq.shape[0],) + traj.shape)
    full = jnp.concatenate([nodes, ends], axis=2)  # [C, T, X+2]
    diff = full - mu[:, None, :]
    marg = jnp.where(is_eq[:, None, None], -jnp.abs(diff),
                     sign[:, None, None] * diff)
    z = -marg / tau + logmask
    # G: joint softmin over (t, x).  F: softmin over x then softmax over t.
    g_val = -tau * jax.scipy.special.logsumexp(z.reshape(z.shape[0], -1),
                                               axis=1)
    inner = -tau * jax.scipy.special.logsumexp(z, axis=2)  # [C, T]
    zt = inner / tau + jnp.where(mask_t, 0.0, _NEG)
    f_val = tau * jax.scipy.special.logsumexp(zt, axis=1)
    vals = jnp.where(is_f, f_val, g_val)

    def and2(a, b):
        return -tau * jnp.logaddexp(-a / tau, -b / tau)

    def or2(a, b):
        return tau * jnp.logaddexp(a / tau, b / tau)

    return rpn_fast(vals, pr_i, and2, or2)


def g2(traj):
    def per_problem(tb_i, pr_i, tr_i):
        return jax.vmap(lambda tr: smooth_rob_fast(tr, tb_i, pr_i, TAU))(tr_i)

    return jnp.sum(jax.vmap(per_problem)(TABLES, pr, TRAJ))


r1 = timeit("G2 fast smooth_rob f+b      ", jax.jit(jax.grad(g2)), TRAJ)

# value parity G1 vs G2
v1 = jax.jit(g1)(TRAJ)
v2 = jax.jit(g2)(TRAJ)
print(f"sum parity: G1={float(v1):.4f} G2={float(v2):.4f}", flush=True)

# per-instance parity
def g1_vals(traj):
    def per_problem(sys_i, cl_i, pr_i, tr_i):
        ts = trajectory_times(sys_i.dt, sys_i.n_steps, MAX_STEPS)[::STRIDE]
        return jax.vmap(
            lambda tr: smooth_robustness(tr, ts, sys_i.xs, cl_i, pr_i, TAU)
        )(tr_i)
    return jax.vmap(per_problem)(systems, cl, pr, TRAJ)


def g2_vals(traj):
    def per_problem(tb_i, pr_i, tr_i):
        return jax.vmap(lambda tr: smooth_rob_fast(tr, tb_i, pr_i, TAU))(tr_i)
    return jax.vmap(per_problem)(TABLES, pr, TRAJ)


a = np.asarray(jax.jit(g1_vals)(TRAJ))
b = np.asarray(jax.jit(g2_vals)(TRAJ))
print(f"per-instance max abs diff: {np.max(np.abs(a - b)):.2e}", flush=True)

# G3: half batch for latency check
half = TRAJ[: B // 2]


def g2h(traj):
    def per_problem(tb_i, pr_i, tr_i):
        return jax.vmap(lambda tr: smooth_rob_fast(tr, tb_i, pr_i, TAU))(tr_i)
    tb_half = jax.tree.map(lambda x: x[: B // 2], TABLES)
    return jnp.sum(jax.vmap(per_problem)(tb_half, pr[: B // 2], traj))


timeit("G3 fast @ half batch f+b    ", jax.jit(jax.grad(g2h)), half)
