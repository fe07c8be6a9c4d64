"""SSTL IoU semantic-similarity metric, vectorized.

Behavior-compatible rebuild of the reference IoU engine
(``eval_script.py:236-585``), which scores a predicted SSTL formula against
the ground truth by:

1. sweeping a family of hypothetical *spatially-constant* signals
   ``u_p(t) = m_p t + b_p`` over a (m x b) profile grid (50 x 50 after the
   reference's variable-shadowing of ``d_steps`` — both ``dm`` and ``db``
   divide by 50),
2. evaluating, per clause and per profile, a boolean time automaton over a
   ~52-point time grid spanning the union of all clause windows:
   - spatial forall over a ~52-point position grid inside the clause's
     window (vacuous = True outside the domain),
   - G: all-true iff no in-domain failure; otherwise True only at vacuous
     points after the LAST in-domain failure,
   - F: True at t iff vacuous at t or some in-domain success at t' >= t,
   - F arrays are built back-to-front per profile, so their profile blocks
     are REVERSED relative to G arrays (a reference quirk, preserved — both
     operands go through the same machinery, so the metric is consistent),
3. combining clause arrays through the formula's junction tree with
   elementwise AND/OR, and
4. IoU = |intersection| / |union| (1.0 when the union is empty).

Where the reference inserts bits one Python loop iteration at a time, the
whole (clause x profile x time x space) evaluation here is a single
vectorized jitted kernel.

Equality predicates use exact float equality, as in the reference
(``ops['='] = operator.eq``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

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
    Clause,
    compile_spec,
)
from pdec.stl.parse_latex import (
    SSTLParseError,
    _tree_to_formula,
    parse_clause_latex,
    split_sstl_structure,
)

# Reference hyperparameters (``eval_script.py:237-241``), including the
# d_steps shadowing: both grids end up 50-point.
_M_MIN, _M_MAX = -7.0, 7.0
_B_MIN, _B_MAX = -500.0, 500.0
_D_STEPS = 50
_DT_STEPS, _DX_STEPS = 50, 50
_EPS_ARANGE = 1e-7

MAX_IOU_CLAUSES = 8


def _profile_grid() -> tuple[np.ndarray, np.ndarray]:
    dm = (_M_MAX - _M_MIN) / _D_STEPS
    db = (_B_MAX - _B_MIN) / _D_STEPS
    m = np.arange(_M_MIN, _M_MAX, dm)
    b = np.arange(_B_MIN, _B_MAX, db)
    mm, bb = np.meshgrid(m, b, indexing="ij")  # m-major, itertools.product order
    return mm.reshape(-1), bb.reshape(-1)


def _time_grids(t_min, t_max):
    dt = (t_max - t_min) / _DT_STEPS
    fwd = np.arange(t_min, t_max + dt + _EPS_ARANGE, dt)
    bwd = np.arange(t_max, t_min - dt - _EPS_ARANGE, -dt)
    return fwd, bwd, dt


def _pos_grids(x_min, x_max):
    dx = (x_max - x_min) / _DX_STEPS
    fwd = np.arange(x_min, x_max + dx + _EPS_ARANGE, dx)
    bwd = np.arange(x_max, x_min - dx - _EPS_ARANGE, -dx)
    return fwd, bwd, dx


def _cmp_bool(lhs, cmp_code):
    return jnp.select(
        [
            cmp_code == CMP_GT,
            cmp_code == CMP_GE,
            cmp_code == CMP_LT,
            cmp_code == CMP_LE,
            cmp_code == CMP_EQ,
        ],
        [lhs > 0, lhs >= 0, lhs < 0, lhs <= 0, lhs == 0],
        default=lhs > 0,
    )


def _clause_bits(clause_row, is_f, ts, xs, m_p, b_p):
    """Boolean array [P, T] for one clause over the (profile, time) grid."""
    _, t0, t1, x0, x1, m_c, b_c, cmp_code = tuple(clause_row[i] for i in range(8))

    in_time = (ts >= t0) & (ts <= t1)  # [T]
    in_pos = (xs >= x0) & (xs <= x1)  # [X]
    has_pos = jnp.any(in_pos)
    vacuous = ~(in_time & has_pos)  # [T]

    u = m_p[:, None] * ts[None, :] + b_p[:, None]  # [P, T]
    mu = m_c * xs + b_c  # [X]
    lhs = u[:, :, None] - mu[None, None, :]  # [P, T, X]
    cond = _cmp_bool(lhs, cmp_code)

    all_true = jnp.all(cond | ~in_pos[None, None, :], axis=2)  # [P, T]
    fail = in_time[None, :] & has_pos & ~all_true  # in-domain failure [P, T]

    T = ts.shape[0]
    t_idx = jnp.arange(T)

    # G: True everywhere if no failure; else vacuous points strictly after
    # the last failure.
    any_fail = jnp.any(fail, axis=1, keepdims=True)  # [P, 1]
    last_fail = jnp.max(jnp.where(fail, t_idx[None, :], -1), axis=1, keepdims=True)
    g_bits = jnp.where(
        any_fail, vacuous[None, :] & (t_idx[None, :] > last_fail), True
    )

    # F: vacuous or an in-domain success at t' >= t (suffix-OR of successes).
    success = in_time[None, :] & has_pos & all_true
    suffix_any = jnp.cumsum(success[:, ::-1].astype(jnp.int32), axis=1)[:, ::-1] > 0
    f_bits = vacuous[None, :] | suffix_any

    return jnp.where(is_f, f_bits, g_bits)


def _run_bool_rpn(clause_bits, program):
    """Elementwise boolean junction over [C, P*T] clause arrays."""

    def step(carry, token):
        stack, sp = carry
        op, arg = token[0], token[1]

        def do_nop(stack, sp):
            return stack, sp

        def do_push(stack, sp):
            return stack.at[sp].set(clause_bits[arg]), sp + 1

        def do_and(stack, sp):
            return stack.at[sp - 2].set(stack[sp - 2] & stack[sp - 1]), sp - 1

        def do_or(stack, sp):
            return stack.at[sp - 2].set(stack[sp - 2] | stack[sp - 1]), sp - 1

        stack, sp = jax.lax.switch(
            jnp.clip(op, 0, 3), [do_nop, do_push, do_and, do_or], stack, sp
        )
        return (stack, sp), None

    n = clause_bits.shape[1]
    init = (jnp.zeros((MAX_IOU_CLAUSES, n), dtype=bool), jnp.int32(0))
    (stack, _), _ = jax.lax.scan(step, init, program)
    return stack[0]


@functools.partial(jax.jit, static_argnames=())
def _iou_kernel(
    clauses_pred, program_pred, clauses_gt, program_gt,
    ts_fwd, ts_bwd_rev, xs_fwd, m_p, b_p,
):
    def formula_bits(clauses, program):
        def one_clause(row):
            is_f = row[0] == 1.0  # TEMP_F
            # F clauses evaluate on the backward-generated grid (reversed to
            # forward order); G on the forward grid — reference directions.
            ts = jnp.where(is_f, ts_bwd_rev, ts_fwd)
            bits = _clause_bits(row, is_f, ts, xs_fwd, m_p, b_p)  # [P, T]
            # Reference F arrays stack profiles back-to-front.
            bits = jnp.where(is_f, bits[::-1, :], bits)
            return bits.reshape(-1)

        cb = jax.vmap(one_clause)(clauses)  # [C, P*T]
        return _run_bool_rpn(cb, program)

    pred = formula_bits(clauses_pred, program_pred)
    gt = formula_bits(clauses_gt, program_gt)
    inter = jnp.sum(pred & gt)
    union = jnp.sum(pred | gt)
    return jnp.where(union == 0, 1.0, inter / jnp.maximum(union, 1))


def _parse_for_iou(text: str):
    clause_strs, junctions, tree = split_sstl_structure(text)
    if not clause_strs:
        raise SSTLParseError("empty formula")
    clauses = [parse_clause_latex(c) for c in clause_strs]
    if not tree:
        raise SSTLParseError("empty bracket tree")
    node = tree if len(tree) > 1 else tree[0]
    formula = _tree_to_formula(node, clauses, junctions)
    return clauses, compile_spec(formula, MAX_IOU_CLAUSES, 2 * MAX_IOU_CLAUSES)


def eval_iou(pred_sstl: str, gt_sstl: str):
    """IoU between predicted and GT SSTL; ``"failed"`` on parse failure."""
    try:
        clauses_pred, spec_pred = _parse_for_iou(pred_sstl)
        clauses_gt, spec_gt = _parse_for_iou(gt_sstl)
    except Exception:
        return "failed"

    both = clauses_pred + clauses_gt
    t_min = min(c.t0 for c in both)
    t_max = max(c.t1 for c in both)
    x_min = min(c.x0 for c in both)
    x_max = max(c.x1 for c in both)

    ts_fwd, ts_bwd, _ = _time_grids(t_min, t_max)
    xs_fwd, _, _ = _pos_grids(x_min, x_max)
    n = min(len(ts_fwd), len(ts_bwd))
    ts_fwd = ts_fwd[:n]
    ts_bwd_rev = ts_bwd[:n][::-1].copy()
    m_p, b_p = _profile_grid()

    out = _iou_kernel(
        jnp.asarray(spec_pred.clauses), jnp.asarray(spec_pred.program),
        jnp.asarray(spec_gt.clauses), jnp.asarray(spec_gt.program),
        jnp.asarray(ts_fwd, dtype=jnp.float32),
        jnp.asarray(ts_bwd_rev, dtype=jnp.float32),
        jnp.asarray(xs_fwd, dtype=jnp.float32),
        jnp.asarray(m_p, dtype=jnp.float32),
        jnp.asarray(b_p, dtype=jnp.float32),
    )
    return float(out)
