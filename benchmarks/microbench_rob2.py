"""Bisect the per-iteration objective cost with scalar outputs only.

All stages: jax.grad wrt theta [B, 6, 20] (1 MB fetch, constant overhead).
  H1 traj einsum only                         (baseline)
  H2 + per-clause margins (select/sign), summed
  H3 + spatial masked softmin per clause, summed over t
  H4 + time softmin/softmax (full clause values), summed
  H5 + RPN junction program (= full objective)
  H6 full objective via stl.semantics (cross-check vs H5)
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
from pdec.stl.ast import CMP_EQ, CMP_LE, CMP_LT, TEMP_F
from pdec.stl.semantics import _run_rpn, smooth_robustness

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
MAX_STEPS, CHUNK, STRIDE, STARTS = 320, 16, 4, 6
TAU = 5.0
systems, cl, pr = build_batch(B, MAX_STEPS)
n_chunks = MAX_STEPS // CHUNK
theta = jax.random.normal(jax.random.PRNGKey(0), (B, STARTS, n_chunks))
_EPS, _NEG = 1e-6, -1e30


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
    print(f"{name}: {min(ts)*1000:.1f} ms   (first {compile_s:.1f} s)",
          flush=True)
    return r


def affine_ops(sys_i):
    def traj_of(u):
        return spectral_trajectory_strided(
            sys_i.spectral, u, sys_i.g0, sys_i.n_out, CHUNK, STRIDE
        )

    z = jnp.zeros((n_chunks,))
    return traj_of(z), jax.jacfwd(traj_of)(z)


T0, W = jax.jit(jax.vmap(affine_ops))(systems)
_ = np.asarray(T0[0])


def tables(sys_i, cl_i):
    ts = trajectory_times(sys_i.dt, sys_i.n_steps, MAX_STEPS)[::STRIDE]
    xs = sys_i.xs

    def one(row):
        temp_op, t0_, t1_, x0, x1, m, b, cmp = tuple(row[i] for i in range(8))
        lo, hi = jnp.minimum(x0, x1), jnp.maximum(x0, x1)
        h = xs[1] - xs[0]
        q = jnp.clip(jnp.stack([lo, hi]), xs[0], xs[-1])
        wq = jnp.maximum(0.0, 1.0 - jnp.abs(q[:, None] - xs[None, :]) / h)
        wq = wq / jnp.maximum(jnp.sum(wq, axis=1, keepdims=True), 1e-9)
        mu = jnp.concatenate([m * xs + b, m * q + b])
        sign = jnp.where((cmp == CMP_LT) | (cmp == CMP_LE), -1.0, 1.0)
        is_eq = cmp == CMP_EQ
        mask_x = (xs >= lo - _EPS) & (xs <= hi + _EPS)
        mask_x = jnp.concatenate([mask_x, jnp.ones((2,), bool)])
        mask_t = (ts >= t0_ - _EPS) & (ts <= t1_ + _EPS)
        center = jnp.abs(ts - 0.5 * (t0_ + t1_))
        mask_t = jnp.where(jnp.any(mask_t), mask_t,
                           jnp.arange(ts.shape[0]) == jnp.argmin(center))
        xmask_log = jnp.where(mask_x, 0.0, _NEG)      # [X+2]
        tmask_log = jnp.where(mask_t, 0.0, _NEG)      # [T]
        return wq, mu, sign, is_eq, xmask_log, tmask_log, temp_op == TEMP_F

    return jax.vmap(one)(cl_i)


TB = jax.jit(jax.vmap(tables))(systems, cl)
_ = np.asarray(TB[0][0, 0, 0])


def margins_of(traj, tb):
    wq, mu, sign, is_eq, xml, tml, is_f = tb
    ends = jnp.einsum("tx,cqx->ctq", traj, wq)
    nodes = jnp.broadcast_to(traj[None], (wq.shape[0],) + traj.shape)
    full = jnp.concatenate([nodes, ends], axis=2)       # [C, T, X+2]
    diff = full - mu[:, None, :]
    return jnp.where(is_eq[:, None, None], -jnp.abs(diff),
                     sign[:, None, None] * diff)


def clause_vals_of(traj, tb, tau):
    wq, mu, sign, is_eq, xml, tml, is_f = tb
    marg = margins_of(traj, tb)
    z = -marg / tau + xml[:, None, :]
    inner = -tau * jax.scipy.special.logsumexp(z, axis=2)      # [C, T] softmin_x
    g_val = -tau * jax.scipy.special.logsumexp(
        (-inner / tau) + tml, axis=1
    )
    f_val = tau * jax.scipy.special.logsumexp(
        (inner / tau) + tml, axis=1
    )
    return jnp.where(is_f, f_val, g_val), inner


def stage(fn):
    # T0/W/TB must be ARGUMENTS of the jitted fn (closing over 400+ MB of
    # concrete arrays bakes them into the HLO -> tunnel compile 413)
    def outer(theta, T0, W, TB):
        def per_problem(t0_i, w_i, tb_i, pr_i, sys_i, th_i):
            def per_start(th):
                u = sys_i.u_scale * jnp.tanh(th)
                traj = t0_i + jnp.einsum("txc,c->tx", w_i, u)
                return fn(traj, tb_i, pr_i)
            return jax.vmap(per_start)(th_i)
        return jnp.sum(jax.vmap(per_problem)(T0, W, TB, pr, systems, theta))
    g = jax.jit(jax.grad(outer))
    return lambda theta: g(theta, T0, W, TB)


timeit("H1 traj only          ", stage(lambda tr, tb, pr_i: jnp.sum(tr)),
       theta)
timeit("H2 +margins           ",
       stage(lambda tr, tb, pr_i: jnp.sum(margins_of(tr, tb))), theta)
timeit("H3 +spatial softmin   ",
       stage(lambda tr, tb, pr_i: jnp.sum(clause_vals_of(tr, tb, TAU)[1])),
       theta)
timeit("H4 +time reduce       ",
       stage(lambda tr, tb, pr_i: jnp.sum(clause_vals_of(tr, tb, TAU)[0])),
       theta)


def full_fast(tr, tb, pr_i):
    vals, _ = clause_vals_of(tr, tb, TAU)

    def and2(a, b):
        return -TAU * jnp.logaddexp(-a / TAU, -b / TAU)

    def or2(a, b):
        return TAU * jnp.logaddexp(a / TAU, b / TAU)

    return _run_rpn(vals, pr_i, and2, or2)


timeit("H5 +RPN (full fast)   ", stage(full_fast), theta)


def full_ref(theta, T0=T0, W=W):
    def per_problem(t0_i, w_i, cl_i, pr_i, sys_i, th_i):
        ts = trajectory_times(sys_i.dt, sys_i.n_steps, MAX_STEPS)[::STRIDE]

        def per_start(th):
            u = sys_i.u_scale * jnp.tanh(th)
            traj = t0_i + jnp.einsum("txc,c->tx", w_i, u)
            return smooth_robustness(traj, ts, sys_i.xs, cl_i, pr_i, TAU)
        return jax.vmap(per_start)(th_i)
    return jnp.sum(jax.vmap(per_problem)(T0, W, cl, pr, systems, theta))


_h6 = jax.jit(jax.grad(full_ref))
timeit("H6 full via semantics ", lambda th: _h6(th, T0, W), theta)

# numeric parity H5 vs H6 (values, not grads)
def vals_fast(theta, T0=T0, W=W, TB=TB):
    def per_problem(t0_i, w_i, tb_i, pr_i, sys_i, th_i):
        def per_start(th):
            u = sys_i.u_scale * jnp.tanh(th)
            traj = t0_i + jnp.einsum("txc,c->tx", w_i, u)
            return full_fast(traj, tb_i, pr_i)
        return jax.vmap(per_start)(th_i)
    return jax.vmap(per_problem)(T0, W, TB, pr, systems, theta)


def vals_ref(theta, T0=T0, W=W):
    def per_problem(t0_i, w_i, cl_i, pr_i, sys_i, th_i):
        ts = trajectory_times(sys_i.dt, sys_i.n_steps, MAX_STEPS)[::STRIDE]

        def per_start(th):
            u = sys_i.u_scale * jnp.tanh(th)
            traj = t0_i + jnp.einsum("txc,c->tx", w_i, u)
            return smooth_robustness(traj, ts, sys_i.xs, cl_i, pr_i, TAU)
        return jax.vmap(per_start)(th_i)
    return jax.vmap(per_problem)(T0, W, cl, pr, systems, theta)


_vf = jax.jit(vals_fast)
a = np.asarray(_vf(theta, T0, W, TB))
_vr = jax.jit(vals_ref)
b = np.asarray(_vr(theta, T0, W))
print(f"H5 vs H6 max abs diff: {np.max(np.abs(a - b)):.3e} "
      f"(mean |v| {np.mean(np.abs(b)):.2f})", flush=True)
