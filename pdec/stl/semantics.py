"""Hard and smooth SSTL robustness semantics over FEM trajectories.

Replaces the Gurobi MILP encoding of STL robustness used by the reference's
external Femformal backend (reference ``README.md:53``,
``eval_robustness_wrapper.py:5-21``).  The MILP computes (and optimizes) the
standard quantitative STL semantics:

    rho(G_[a,b] p)   = min_{t in [a,b]} rho(p, t)
    rho(F_[a,b] p)   = max_{t in [a,b]} rho(p, t)
    rho(forall x p)  = min_{x in [x0,x1]} rho(p, x)
    rho(phi & psi)   = min(rho(phi), rho(psi))
    rho(phi | psi)   = max(rho(phi), rho(psi))
    rho(u - mu > 0)  = u - mu        rho(u - mu < 0) = mu - u
    rho(u - mu = 0)  = -|u - mu|

Here those semantics are direct jittable reductions over a dense trajectory
``u[T, X]`` — no integer variables needed because the trajectory is an
explicit function of the control (see `pdec.control.synthesis`), so
disjunctions are handled by max() in the forward pass and by multi-start in
the optimizer rather than by MILP branching.

`smooth_robustness` swaps min/max for temperature-scaled logsumexp soft
reductions, giving a differentiable underapproximation whose gradients drive
control synthesis; as tau -> 0 it converges to the hard value.

All functions take the fixed-shape `CompiledSpec` arrays (see
`pdec.stl.ast`), are shape-static, and batch with ``vmap`` over
(trajectory, spec) pairs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from pdec.stl.ast import (
    CMP_EQ,
    CMP_GE,
    CMP_GT,
    CMP_LE,
    CMP_LT,
    OP_AND,
    OP_NOP,
    OP_OR,
    OP_PUSH,
    STACK_DEPTH,
    TEMP_F,
    TEMP_U,
)

_BIG = 1e9
_EPS = 1e-6


def spatial_profile(m, b, x):
    """Linear profile mu(x) = m*x + b (reference ``logic.APCont`` lambdas)."""
    return m * x + b


def _hat_weights(xs, x_query):
    """Linear-interpolation weights as a dense [Q, X] matrix (uniform grid).

    Gather-free: ``traj @ W.T`` interpolates every time row at every query —
    a matmul instead of per-point searchsorted, which matters because this
    sits inside the synthesis hot loop (TPU gathers are slow; matmuls are
    free).  FEM grids here are always ``linspace`` (uniform).
    """
    h = xs[1] - xs[0]
    q = jnp.clip(x_query, xs[0], xs[-1])
    w = jnp.maximum(0.0, 1.0 - jnp.abs(q[:, None] - xs[None, :]) / h)
    # normalize guards fp edge cases (weights of interior points already sum
    # to 1 exactly on a uniform grid)
    return w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-9)


def _interp_rows(traj, xs, x_query):
    """Linear interpolation of each time row of ``traj[T, X]`` at ``x_query``."""
    w = _hat_weights(xs, x_query)  # [Q, X]
    return jnp.einsum("tx,qx->tq", traj, w)


def _signed_margin(diff, cmp):
    """Quantitative margin of ``u - mu  <cmp>  0`` given ``diff = u - mu``."""
    gt = diff
    lt = -diff
    eq = -jnp.abs(diff)
    # GE/LE share GT/LT quantitative semantics.
    return jnp.select(
        [
            cmp == CMP_GT,
            cmp == CMP_GE,
            cmp == CMP_LT,
            cmp == CMP_LE,
            cmp == CMP_EQ,
        ],
        [gt, gt, lt, lt, eq],
        default=gt,
    )


def _ensure_nonempty(mask, center_dist):
    """If ``mask`` is all-false, substitute a one-hot at the nearest point."""
    any_in = jnp.any(mask)
    nearest = jnp.argmin(center_dist)
    onehot = jnp.arange(mask.shape[0]) == nearest
    return jnp.where(any_in, mask, onehot)


def _clause_time_signal(traj, ts, xs, clause_row):
    """Spatial-forall margin signal g[T] for one clause.

    g[t] = min over x in [x0, x1] (FEM nodes inside, plus the linearly
    interpolated endpoints, mirroring femformal's per-element predicate
    evaluation at region boundaries).
    """
    _, _, _, x0, x1, m, b, cmp = tuple(clause_row[i] for i in range(8))
    lo = jnp.minimum(x0, x1)
    hi = jnp.maximum(x0, x1)

    mu = spatial_profile(m, b, xs)
    margins = _signed_margin(traj - mu[None, :], cmp)  # [T, X]

    mask_x = (xs >= lo - _EPS) & (xs <= hi + _EPS)  # [X]
    masked = jnp.where(mask_x[None, :], margins, _BIG)
    node_min = jnp.min(masked, axis=1)  # [T]

    # Interpolated endpoints (also covers intervals containing no node).
    xq = jnp.stack([lo, hi])
    u_ends = _interp_rows(traj, xs, xq)  # [T, 2]
    mu_ends = spatial_profile(m, b, xq)
    end_margins = _signed_margin(u_ends - mu_ends[None, :], cmp)
    end_min = jnp.min(end_margins, axis=1)  # [T]

    return jnp.minimum(node_min, end_min)


def _clause_time_signal_smooth(traj, ts, xs, clause_row, tau):
    """Soft-min version of `_clause_time_signal`."""
    _, _, _, x0, x1, m, b, cmp = tuple(clause_row[i] for i in range(8))
    lo = jnp.minimum(x0, x1)
    hi = jnp.maximum(x0, x1)

    mu = spatial_profile(m, b, xs)
    margins = _signed_margin(traj - mu[None, :], cmp)  # [T, X]
    mask_x = (xs >= lo - _EPS) & (xs <= hi + _EPS)

    xq = jnp.stack([lo, hi])
    u_ends = _interp_rows(traj, xs, xq)
    mu_ends = spatial_profile(m, b, xq)
    end_margins = _signed_margin(u_ends - mu_ends[None, :], cmp)  # [T, 2]

    all_margins = jnp.concatenate([margins, end_margins], axis=1)
    all_mask = jnp.concatenate(
        [mask_x, jnp.ones((2,), dtype=bool)], axis=0
    )[None, :]
    all_mask = jnp.broadcast_to(all_mask, all_margins.shape)
    return _softmin_where(all_margins, all_mask, tau, axis=1)


def _softmin_where(z, mask, tau, axis):
    return -tau * logsumexp(-z / tau, axis=axis, where=mask)


def _softmax_where(z, mask, tau, axis):
    return tau * logsumexp(z / tau, axis=axis, where=mask)


def _time_window_mask(ts, t0, t1):
    mask_t = (ts >= t0 - _EPS) & (ts <= t1 + _EPS)
    return _ensure_nonempty(mask_t, jnp.abs(ts - 0.5 * (t0 + t1)))


def _clause_robustness(clause_row, ts, g, g_next):
    """Hard robustness of one clause row given its (and its successor's)
    spatial margin signal ``g[T]``.

    G/F reduce ``g`` over the time window.  U (until, standard quantitative
    STL at t = 0) needs BOTH rows of the compiled pair:

        rho = max_{t in [t0,t1]} min( g_rhs[t], min_{s <= t} g_lhs[s] )

    with the prefix-min computed by an associative scan (parallel on TPU).
    Rows marked TEMP_U_RHS yield a dead value the program never pushes.
    """
    temp_op, t0, t1 = clause_row[0], clause_row[1], clause_row[2]
    mask_t = _time_window_mask(ts, t0, t1)
    g_min = jnp.min(jnp.where(mask_t, g, _BIG))
    g_max = jnp.max(jnp.where(mask_t, g, -_BIG))
    prefix_lhs = jax.lax.associative_scan(jnp.minimum, g)
    u_val = jnp.max(
        jnp.where(mask_t, jnp.minimum(g_next, prefix_lhs), -_BIG)
    )
    return jnp.where(
        temp_op == TEMP_F, g_max,
        jnp.where(temp_op == TEMP_U, u_val, g_min),
    )


def _clause_robustness_smooth(clause_row, ts, g, g_next, tau):
    temp_op, t0, t1 = clause_row[0], clause_row[1], clause_row[2]
    mask_t = _time_window_mask(ts, t0, t1)
    g_min = _softmin_where(g, mask_t, tau, axis=0)
    g_max = _softmax_where(g, mask_t, tau, axis=0)
    # soft prefix-min: -tau * log cum-sum-exp(-g/tau) via associative scan
    prefix_lhs = -tau * jax.lax.associative_scan(jnp.logaddexp, -g / tau)
    pair = -tau * jnp.logaddexp(-g_next / tau, -prefix_lhs / tau)
    u_val = _softmax_where(pair, mask_t, tau, axis=0)
    return jnp.where(
        temp_op == TEMP_F, g_max,
        jnp.where(temp_op == TEMP_U, u_val, g_min),
    )


def _run_rpn(clause_vals, program, and2, or2):
    """Evaluate the postfix junction program over clause robustness values.

    Fixed-depth value stack scanned over program tokens — compiles once for
    every formula shape (no data-dependent Python control flow).

    PERFORMANCE NOTE (round-2 measured): the natural formulation —
    ``lax.switch`` over opcode branches with ``stack.at[sp].set`` — lowers,
    under ``vmap`` with per-instance programs, to per-instance dynamic
    scatters/gathers, which serialize on TPU and dominated the whole
    synthesis iteration (~270 of 340 ms at 12k instances; see
    benchmarks/microbench_rob2.py).  This version is arithmetically
    identical but scatter-free: stack reads/writes go through one-hot
    masks (vectorized compares + selects) and the opcode dispatch is a
    pair of ``where``s, so the vmapped step is pure elementwise work.
    """
    depth = STACK_DEPTH
    idx = jnp.arange(depth)
    cidx = jnp.arange(clause_vals.shape[0])
    zero = jnp.zeros((), dtype=clause_vals.dtype)

    def step(carry, token):
        stack, sp = carry
        op, arg = token[0], token[1]

        v1 = jnp.sum(jnp.where(idx == sp - 1, stack, zero))  # stack[sp-1]
        v2 = jnp.sum(jnp.where(idx == sp - 2, stack, zero))  # stack[sp-2]
        push_val = jnp.sum(jnp.where(cidx == arg, clause_vals, zero))

        is_push = op == OP_PUSH
        is_and = op == OP_AND
        is_or = op == OP_OR
        junc = jnp.where(is_and, and2(v2, v1), or2(v2, v1))

        write_pos = jnp.where(is_push, sp, sp - 2)
        write_val = jnp.where(is_push, push_val, junc)
        do_write = is_push | is_and | is_or
        stack = jnp.where((idx == write_pos) & do_write, write_val, stack)
        sp = sp + jnp.where(
            is_push, 1, jnp.where(is_and | is_or, -1, 0)
        ).astype(sp.dtype)
        return (stack, sp), None

    init = (jnp.zeros((STACK_DEPTH,), dtype=clause_vals.dtype), jnp.int32(0))
    (stack, sp), _ = jax.lax.scan(step, init, program)
    return stack[0]


@functools.partial(jax.jit, static_argnames=())
def robustness(traj, ts, xs, clauses, program):
    """Hard SSTL robustness of ``traj[T, X]`` against a compiled spec.

    Args:
      traj: ``[T, X]`` field values (temperature / displacement) at nodes.
      ts: ``[T]`` time stamps.
      xs: ``[X]`` node positions.
      clauses: ``[MAX_CLAUSES, 8]`` from `compile_spec`.
      program: ``[MAX_PROG, 2]`` from `compile_spec`.
    """
    sig = jax.vmap(
        lambda row: _clause_time_signal(traj, ts, xs, row)
    )(clauses)  # [C, T]
    sig_next = jnp.concatenate([sig[1:], sig[-1:]], axis=0)
    vals = jax.vmap(
        lambda row, g, gn: _clause_robustness(row, ts, g, gn)
    )(clauses, sig, sig_next)
    return _run_rpn(vals, program, jnp.minimum, jnp.maximum)


@functools.partial(jax.jit, static_argnames=())
def smooth_robustness(traj, ts, xs, clauses, program, tau=0.05):
    """Smooth (differentiable) SSTL robustness; tau -> 0 recovers `robustness`."""

    def and2(a, b):
        return -tau * jnp.logaddexp(-a / tau, -b / tau)

    def or2(a, b):
        return tau * jnp.logaddexp(a / tau, b / tau)

    sig = jax.vmap(
        lambda row: _clause_time_signal_smooth(traj, ts, xs, row, tau)
    )(clauses)  # [C, T]
    sig_next = jnp.concatenate([sig[1:], sig[-1:]], axis=0)
    vals = jax.vmap(
        lambda row, g, gn: _clause_robustness_smooth(row, ts, g, gn, tau)
    )(clauses, sig, sig_next)
    return _run_rpn(vals, program, and2, or2)
