"""Serve-time structural gate for controller-proposed subgoals.

The DPO controller is trained exclusively on *bounded, structure-preserving*
rewrites of the spec (the candidate moves in
``pdec.pipeline.dpo_datagen._perturb_clause``: threshold offset/relax, time
window tighten/early-shift, slope nudge — each touching ONE clause).  At
serve time the model is generative: nothing stops it from emitting a
subgoal outside that training support — a different clause count, a moved
spatial region, a time window shifted far beyond any training move.  The
round-3 sweep measured the cost: on wave_nc3 shots=2 the entire -0.75 mean
utility gain came from ~7/1534 catastrophic out-of-envelope subgoals
(gain < -50 each), many with the wrong clause count, while the median pair
was a tie or a win.

``subgoal_within_envelope`` checks a proposed subgoal against the
translator's spec: same junction structure, same clause ops/comparators,
near-identical spatial intervals (no training move touches them), and
per-clause numeric deltas inside the training-move envelope (with slack).
Pipelines fall back to the base spec when the check fails — the identity
action the controller's own training data anchors on (``select_preference``).

Reference parity note: the reference pipeline has no such gate (it pipes
the controller's SSTL straight to the coder, ``run_testing.sh:11-17``);
this is a deployment-robustness feature of the rebuild, recorded per
example in ``predictions.jsonl`` as ``gate_fallback``.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from pdec.stl.ast import Clause, Formula, formula_clauses

# Envelope bounds mirror ``dpo_datagen._perturb_clause`` move magnitudes,
# widened by a slack factor so borderline-but-benign emissions pass.
_SLACK = 1.3
# relax: up to 0.4*(|b|+1); offset: 0.15*(|b|+1)  -> bound by the larger
_B_DELTA = 0.4
# slope: up to 0.3*(|m|+1e-3)
_M_DELTA = 0.3
# tighten_time: shrink up to 40% of width; early: shift up to 30% of t0
_T_SHIFT = 0.3
_T_SHRINK = 0.4
# spatial interval: no training move touches it — tolerance is formatting
# noise only (re-serialized floats)
_X_RTOL = 0.02


def _junction_ops(f: Formula) -> List[str]:
    """Pre-order junction-operator sequence ('and'/'or')."""
    if isinstance(f, Clause):
        return []
    op, left, right = f
    return [op] + _junction_ops(left) + _junction_ops(right)


def _restrictions(f: Formula):
    """All disjunct-commitments of ``f``: every formula obtainable by
    replacing any subset of ``or`` junctions with one of their children
    (identity included, yielded first).

    Committing to one side of an ``or`` is a *sound* subgoal move —
    satisfying a disjunct implies satisfying the disjunction — and it is
    the gradient analogue of the integer branching the reference's Gurobi
    MILP performs on disjunctions (SURVEY §7.3).  The datagen candidate
    pool makes this move (``dpo_datagen._perturb_formula``), so the gate
    must accept it.  Corpus formulas have <=4 clauses, so the enumeration
    is tiny."""
    if isinstance(f, Clause):
        yield f
        return
    op, left, right = f
    for l in _restrictions(left):
        for r in _restrictions(right):
            yield (op, l, r)
    if op == "or":
        yield from _restrictions(left)
        yield from _restrictions(right)


def _clause_within_envelope(base: Clause, cand: Clause) -> bool:
    if cand.temporal_op != base.temporal_op or cand.cmp != base.cmp:
        return False
    # spatial region is not a legal move
    xtol = _X_RTOL * (abs(base.x1 - base.x0) + 1.0)
    if abs(cand.x0 - base.x0) > xtol or abs(cand.x1 - base.x1) > xtol:
        return False
    # threshold / slope inside the (slacked) move envelope
    if abs(cand.b - base.b) > _SLACK * _B_DELTA * (abs(base.b) + 1.0):
        return False
    if abs(cand.m - base.m) > _SLACK * _M_DELTA * (abs(base.m) + 1e-3):
        return False
    # time window: may shift earlier (<= 30% of t0) or shrink (<= 40% of
    # width), never extend later or widen
    width = max(base.t1 - base.t0, 1e-9)
    shift = _SLACK * _T_SHIFT * max(base.t0, 0.0) + 1e-9
    if cand.t0 < base.t0 - shift:
        return False
    if cand.t0 > base.t0 + _SLACK * _T_SHRINK * width + 1e-9:
        return False
    if cand.t1 > base.t1 * 1.02 + 1e-9:  # no later extension (2% slack)
        return False
    if cand.t1 - cand.t0 > width * (1.0 + 0.05) + 1e-9:  # no widening
        return False
    if cand.t1 <= cand.t0:
        return False
    return True


def _match_against_restrictions(base: Formula, cand: Formula, clause_ok) -> bool:
    cand_ops = _junction_ops(cand)
    cand_cl = formula_clauses(cand)
    for variant in _restrictions(base):
        if _junction_ops(variant) != cand_ops:
            continue
        var_cl = formula_clauses(variant)
        if len(var_cl) != len(cand_cl):
            continue
        if all(clause_ok(b, c) for b, c in zip(var_cl, cand_cl)):
            return True
    return False


def subgoal_within_envelope(base: Formula, cand: Formula) -> bool:
    """True iff ``cand`` is a training-support rewrite of ``base``:
    a disjunct-commitment of ``base`` (possibly identity) whose junction
    structure matches and whose clause-by-clause deltas are inside the
    DPO candidate-move envelope."""
    return _match_against_restrictions(base, cand, _clause_within_envelope)


def same_structure(base: Formula, cand: Formula) -> bool:
    """Structure-only check: junction-operator sequence, clause count, and
    per-clause (temporal op, comparator).  Numeric values — thresholds,
    slopes, time windows, spatial bounds — are NOT checked: they are the
    controller's legitimate domain of intervention, and the anchor spec
    (a *translated* estimate of the true spec) is least reliable exactly
    where the controller helps most.

    Measured on the committed round-3 BASE sweep (offline counterfactual,
    12 cells x ~1530 pairs): structure-only gating fixes every
    catastrophic cell (wave_nc3 shots=2: -11.5% -> -0.2%) while keeping
    the best cell strongly positive (wave_nc1 shots=2: +16.3% -> +8.3%);
    the full numeric envelope (``subgoal_within_envelope``) also fixes the
    negatives but rejects the big out-of-envelope WINS on cells where the
    translator anchor is weak (same cell: -> -16.7%).

    Disjunct commitments of the base (see ``_restrictions``) are accepted
    by both gates."""
    return _match_against_restrictions(
        base, cand,
        lambda b, c: b.temporal_op == c.temporal_op and b.cmp == c.cmp,
    )


def _clause_decomposition_ok(base: Clause, cand: Clause) -> bool:
    """True iff ``cand`` is a structured DECOMPOSITION of ``base`` — the
    round-5 candidate-move classes (``dpo_datagen._clause_decompositions``):

    - time-phase / setup-prefix commitment: an ``F`` clause whose window
      ends no later than the base window (reach the profile at a chosen
      moment, or before the base window opens);
    - spatial focus: the same clause restricted to a sub-region.

    The profile itself (slope/threshold/comparator) must be unchanged —
    a decomposition commits WHERE/WHEN, never to a different objective.
    Tolerances are formatting noise only (latex round-trip)."""
    from pdec.stl.ast import TEMP_F

    if cand.cmp != base.cmp:
        return False
    if abs(cand.b - base.b) > 1e-6 * (abs(base.b) + 1.0):
        return False
    if abs(cand.m - base.m) > 1e-6 * (abs(base.m) + 1e-3):
        return False
    # spatial focus: cand region inside the base region
    xtol = _X_RTOL * (abs(base.x1 - base.x0) + 1.0)
    if cand.x0 < base.x0 - xtol or cand.x1 > base.x1 + xtol:
        return False
    if cand.x1 <= cand.x0:
        return False
    if cand.t1 <= cand.t0:
        return False
    if cand.temporal_op != base.temporal_op and cand.temporal_op != TEMP_F:
        return False
    # committed window must not look past the base window's end
    if cand.t1 > base.t1 * 1.02 + 1e-9:
        return False
    return True


def decomposition_admissible(base: Formula, cand: Formula) -> bool:
    """True iff ``cand`` is a disjunct-commitment of ``base`` with each
    clause either numerically identical (up to formatting noise) or a
    structured decomposition of its counterpart (see
    ``_clause_decomposition_ok``).  Together with ``same_structure`` this
    spans the round-5 DPO candidate pool (``dpo_datagen.propose_subgoals``),
    so a controller trained on that pool can deploy every move class it
    learned; the serve-time UTILITY gate (``pdec.control.serve_gate``)
    remains the safety mechanism for all structurally-admissible moves."""
    return _match_against_restrictions(base, cand, _clause_decomposition_ok)


def gate_subgoal(
    base_sstl: str, cand_sstl: str, numeric_envelope: bool = False,
) -> Tuple[str, bool]:
    """-> (spec to use, fell_back).

    Parses both specs; returns the candidate subgoal when it parses and
    matches the base spec's structure (``same_structure``; additionally the
    full training-move numeric envelope when ``numeric_envelope``), else
    the base spec (identity fallback).  An unparseable *base* passes the
    candidate through unchanged (nothing to anchor the check on — e.g. a
    failed translation), preserving the ungated behavior.
    """
    from pdec.stl.parse_latex import parse_sstl_latex

    try:
        base_f = parse_sstl_latex(base_sstl)
    except Exception:
        return cand_sstl, False
    try:
        cand_f = parse_sstl_latex(cand_sstl)
    except Exception:
        return base_sstl, True
    ok = (
        subgoal_within_envelope(base_f, cand_f)
        if numeric_envelope else same_structure(base_f, cand_f)
    )
    if ok:
        return cand_sstl, False
    return base_sstl, True
