"""Serve-time utility gate: the controller layer must be provably
non-harmful — an intervention is accepted only when its chained utility
beats the identity action by more than the synthesis noise floor
(VERDICT r4: "a guidance layer must never make things worse")."""

import dataclasses
import math
import random

import jax

from pdec.control.serve_gate import (
    GateDecision,
    _formulas_equal,
    utility_gate_batch,
)
from pdec.control.synthesis import SynthesisConfig
from pdec.data.generator import GeneratorConfig, sample_problem
from pdec.stl.ast import Clause
from pdec.stl.parse_latex import format_sstl_latex, parse_sstl_latex

FAST = SynthesisConfig(n_iters=8, n_starts=2, polish_iters=0)


def _example(seed=3, kind="heat", nc=1):
    return sample_problem(random.Random(seed), GeneratorConfig(kind=kind, n_clauses=nc))


def _bump_first_clause(formula, **deltas):
    done = [False]

    def walk(f):
        if isinstance(f, Clause):
            if done[0]:
                return f
            done[0] = True
            return dataclasses.replace(
                f, **{k: getattr(f, k) + v for k, v in deltas.items()})
        op, left, right = f
        return (op, walk(left), walk(right))

    return walk(formula)


def test_formulas_equal_roundtrip():
    ex = _example()
    sstl = format_sstl_latex(ex.formula)
    assert _formulas_equal(ex.formula, parse_sstl_latex(sstl))
    assert not _formulas_equal(
        ex.formula, _bump_first_clause(ex.formula, b=0.5))


def test_gate_structural_paths():
    ex = _example()
    base = format_sstl_latex(ex.formula)
    # unparseable candidate -> identity fallback
    # unparseable base -> candidate passes through (nothing to anchor on)
    # identity candidate -> no intervention, never scored
    decisions = utility_gate_batch(
        [ex.nl, ex.nl, ex.nl],
        [base, "not a spec", base],
        ["garbage {{", base, base],
        config=FAST,
    )
    d_bad, d_noanchor, d_id = decisions
    assert d_bad.fell_back and d_bad.reason == "cand_unparseable"
    assert d_bad.sstl == base
    assert not d_noanchor.fell_back and d_noanchor.reason == "no_anchor"
    assert d_noanchor.sstl == base
    assert not d_id.fell_back and d_id.reason == "identity"
    assert math.isnan(d_id.u_identity)


def test_gate_rejects_non_improving_intervention():
    """A candidate that is structurally legal but does not beat identity
    by more than the floor must be rejected — this is the non-harm
    guarantee.  A tiny threshold nudge produces a chained utility within
    the noise floor of identity, so the gate must fall back."""
    ex = _example(seed=7)
    base = format_sstl_latex(ex.formula)
    cand = format_sstl_latex(_bump_first_clause(ex.formula, b=0.01))
    (d,) = utility_gate_batch(
        [ex.nl], [base], [cand], config=FAST, key=jax.random.PRNGKey(0),
    )
    assert d.reason in ("utility_reject", "utility_accept")
    assert math.isfinite(d.u_identity) and math.isfinite(d.u_candidate)
    if d.reason == "utility_reject":
        assert d.fell_back and d.sstl == base
        assert d.u_candidate - d.u_identity <= 0.03 * (abs(d.u_identity) + 1)
    else:  # accepted iff it genuinely cleared the floor
        assert d.u_candidate - d.u_identity > 0.03 * (abs(d.u_identity) + 1)


def test_gate_batch_mixed_families():
    """Batched scoring groups by family; heat and wave examples in one
    call each get a finite utility-scored or structural decision."""
    exs = [_example(seed=11, kind="heat"), _example(seed=12, kind="wave")]
    bases = [format_sstl_latex(e.formula) for e in exs]
    cands = [format_sstl_latex(_bump_first_clause(e.formula, b=0.2))
             for e in exs]
    decisions = utility_gate_batch(
        [e.nl for e in exs], bases, cands, config=FAST,
    )
    assert len(decisions) == 2
    for d, b, c in zip(decisions, bases, cands):
        assert isinstance(d, GateDecision)
        assert d.reason in ("utility_reject", "utility_accept",
                            "structure_reject", "physics_unparseable")
        if d.reason.startswith("utility"):
            assert math.isfinite(d.u_identity)
            assert d.sstl == (b if d.fell_back else c)
