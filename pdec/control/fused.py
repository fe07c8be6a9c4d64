"""Fused rollout + smooth robustness: a measured-and-rejected alternative.

STATUS: not on the production path. `pdec.control.synthesis` ships the
"wide" strided objective because on-device measurement
(`benchmarks/microbench_synthesis.py`) shows it beats this streaming
formulation on TPU — the MXU prefers few large parallel reductions over
many small sequential scan steps, including in the backward pass. This
module is retained as the reproducible half of that measurement (the
microbench imports it) and as the reference implementation of the
O(1)-memory streaming objective, which becomes the right trade-off if
horizons ever grow to where the [T, X] trajectory no longer fits HBM.

The naive objective materializes the full trajectory ``[T, X]`` and then
per-clause margin tensors of the same size — at production batch sizes that
is gigabytes of HBM traffic per optimizer iteration, and measurement shows
it is the throughput ceiling (not the rollout FLOPs).

This module streams instead (the flash-attention trick applied to STL):
one ``lax.scan`` over control chunks carries

- the physics state ``x [S]``, and
- per-clause online-logsumexp accumulators (running max + scaled sum),

so each chunk's states are produced (one MXU GEMM via the precomputed chunk
operators), immediately reduced over space (masked softmin over ~33 nodes +
2 interpolated region endpoints), pushed into the temporal accumulators,
and discarded.  Nothing T-sized is ever written to HBM; the backward pass
recomputes chunk margins from the tiny carried state.

Semantics match `pdec.stl.semantics.smooth_robustness` (same softmin /
softmax / signed-margin conventions) up to the treatment of empty time
windows, which cannot occur for corpus specs (windows span many fine
steps); the final *hard* evaluation always runs the exact reference path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pdec.stl.ast import CMP_EQ, CMP_GE, CMP_GT, CMP_LE, CMP_LT, TEMP_F
from pdec.stl.semantics import _hat_weights, _run_rpn

_EPS = 1e-6
_NEG = -1e30


class ClauseTables(NamedTuple):
    """Per-clause constants, precomputed once per problem (outside the
    optimizer loop)."""

    mu: jnp.ndarray  # [C, X] profile at nodes
    node_mask: jnp.ndarray  # [C, X] nodes inside the spatial window
    w_end: jnp.ndarray  # [C, 2, X] interpolation weights at region endpoints
    mu_end: jnp.ndarray  # [C, 2] profile at endpoints
    sign: jnp.ndarray  # [C] +1 for >/>=, -1 for </<=, 0 for =
    t0: jnp.ndarray  # [C]
    t1: jnp.ndarray  # [C]
    tsign: jnp.ndarray  # [C] +1 for F (max), -1 for G (min)


def make_clause_tables(clauses, xs) -> ClauseTables:
    """clauses: [C, 8] compiled rows; xs: [X] node positions."""

    def one(row):
        temp_op, t0, t1, x0, x1, m, b, cmp = tuple(row[i] for i in range(8))
        lo = jnp.minimum(x0, x1)
        hi = jnp.maximum(x0, x1)
        mu = m * xs + b
        node_mask = (xs >= lo - _EPS) & (xs <= hi + _EPS)
        xq = jnp.stack([lo, hi])
        w_end = _hat_weights(xs, xq)  # [2, X]
        mu_end = m * xq + b
        is_gt = (cmp == CMP_GT) | (cmp == CMP_GE)
        is_lt = (cmp == CMP_LT) | (cmp == CMP_LE)
        sign = jnp.where(is_gt, 1.0, jnp.where(is_lt, -1.0, 0.0))
        tsign = jnp.where(temp_op == TEMP_F, 1.0, -1.0)
        return mu, node_mask, w_end, mu_end, sign, t0, t1, tsign

    out = jax.vmap(one)(clauses)
    return ClauseTables(*out)


def _margins(field, tables: ClauseTables):
    """field: [c, X] -> spatial margin signal per clause [C, c].

    margin(u, mu): sign=+1 -> u-mu; sign=-1 -> mu-u; sign=0 (=) -> -|u-mu|.
    """
    diff = field[None, :, :] - tables.mu[:, None, :]  # [C, c, X]
    node_m = jnp.where(
        tables.sign[:, None, None] == 0.0,
        -jnp.abs(diff),
        tables.sign[:, None, None] * diff,
    )
    u_end = jnp.einsum("tx,cex->cte", field, tables.w_end)  # [C, c, 2]
    diff_end = u_end - tables.mu_end[:, None, :]
    end_m = jnp.where(
        tables.sign[:, None, None] == 0.0,
        -jnp.abs(diff_end),
        tables.sign[:, None, None] * diff_end,
    )
    return node_m, end_m


def _spatial_softmin(node_m, end_m, node_mask, tau):
    """Masked softmin over nodes + endpoints -> [C, c]."""
    z = jnp.concatenate([node_m, end_m], axis=2)  # [C, c, X+2]
    mask = jnp.concatenate(
        [
            jnp.broadcast_to(node_mask[:, None, :], node_m.shape),
            jnp.ones(end_m.shape, bool),
        ],
        axis=2,
    )
    neg = jnp.where(mask, -z / tau, _NEG)
    m = jnp.max(neg, axis=2, keepdims=True)
    s = jnp.sum(jnp.where(mask, jnp.exp(neg - m), 0.0), axis=2)
    return -tau * (m[..., 0] + jnp.log(s))


def fused_smooth_robustness(
    p_stack,  # [chunk, S, S]
    qb,  # [chunk, S]
    qc,  # [chunk, S]
    x0,  # [S]
    g0,
    n_out: int,
    chunk_controls,  # [n_chunks]
    tables: ClauseTables,
    program,  # [MAX_PROG, 2] RPN
    dt,
    n_steps,
    tau,
    eval_stride: int = 1,
):
    """Streamed smooth robustness of the controlled rollout.

    ``eval_stride`` > 1 evaluates the objective on every stride-th fine
    step only (the carry still advances exactly): a bandwidth/FLOP cut for
    the optimizer's gradient signal.  The final *hard* robustness is always
    evaluated at full resolution by the caller, so the returned control's
    reported score is exact — stride affects only optimization quality.
    """
    chunk, s, _ = p_stack.shape
    if chunk % eval_stride != 0:
        raise ValueError(f"chunk {chunk} not divisible by stride {eval_stride}")
    n_chunks = chunk_controls.shape[0]
    n_clauses = tables.mu.shape[0]
    if eval_stride > 1:
        # rows at offsets stride-1, 2*stride-1, ..., chunk-1; the last row
        # is the chunk-end state, so the carry stays exact
        sel = jnp.arange(eval_stride - 1, chunk, eval_stride)
        p_stack = p_stack[sel]
        qb = qb[sel]
        qc = qc[sel]
        dt = dt * eval_stride
        n_steps = n_steps // eval_stride
        chunk = chunk // eval_stride
    p_flat = p_stack.reshape(chunk * s, s)

    def field_of(states):
        left = jnp.full((states.shape[0], 1), g0, dtype=states.dtype)
        return jnp.concatenate([left, states[:, :n_out]], axis=1)

    def in_window(t):
        """t: [c] -> [C, c] clause time-window membership."""
        return (t[None, :] >= tables.t0[:, None] - _EPS) & (
            t[None, :] <= tables.t1[:, None] + _EPS
        )

    def accumulate(m_run, s_run, g, valid):
        """Online signed logsumexp: rho = tsign * tau * lse(tsign*g/tau)."""
        z = tables.tsign[:, None] * g / tau  # [C, c]
        z = jnp.where(valid, z, _NEG)
        m_new = jnp.maximum(m_run, jnp.max(z, axis=1))
        s_new = s_run * jnp.exp(m_run - m_new) + jnp.sum(
            jnp.exp(z - m_new[:, None]), axis=1
        )
        return m_new, s_new

    def step(carry, u):
        x, m_run, s_run, k0 = carry
        states = (
            jnp.dot(p_flat, x, precision=jax.lax.Precision.HIGHEST)
            .reshape(chunk, s)
            + qb * u
            + qc
        )
        field = field_of(states)  # [chunk, X]
        node_m, end_m = _margins(field, tables)
        g = _spatial_softmin(node_m, end_m, tables.node_mask, tau)  # [C, chunk]

        ks = k0 + 1 + jnp.arange(chunk)
        t = ks.astype(jnp.float32) * dt
        valid = (ks <= n_steps)[None, :] & in_window(t)
        m_run, s_run = accumulate(m_run, s_run, g, valid)
        return (states[-1], m_run, s_run, k0 + chunk), None

    # t = 0 contribution from the initial state
    field0 = field_of(x0[None, :])
    node_m0, end_m0 = _margins(field0, tables)
    g0_sig = _spatial_softmin(node_m0, end_m0, tables.node_mask, tau)  # [C, 1]
    m_init = jnp.full((n_clauses,), _NEG)
    s_init = jnp.zeros((n_clauses,))
    m_init, s_init = accumulate(
        m_init, s_init, g0_sig, in_window(jnp.zeros((1,)))
    )

    (xf, m_run, s_run, _), _ = jax.lax.scan(
        step, (x0, m_init, s_init, jnp.int32(0)), chunk_controls
    )

    lse = m_run + jnp.log(jnp.maximum(s_run, 1e-30))
    clause_vals = tables.tsign * tau * lse  # [C]
    return _run_rpn(
        clause_vals,
        program,
        lambda a, b: -tau * jnp.logaddexp(-a / tau, -b / tau),
        lambda a, b: tau * jnp.logaddexp(a / tau, b / tau),
    )
