"""Serve-time subgoal envelope gate (pdec.stl.guard).

The gate must accept everything the DPO candidate generator can produce
(training support) and reject the out-of-envelope emissions that caused
the round-3 catastrophic-outlier cells (clause-count changes, far-shifted
windows, moved spatial regions).
"""

import dataclasses
import random

from pdec.pipeline.dpo_datagen import _perturb_formula
from pdec.stl.ast import Clause
from pdec.stl.guard import gate_subgoal, subgoal_within_envelope
from pdec.stl.parse_latex import format_sstl_latex


def _clause(**kw):
    base = dict(temporal_op="G", time_interval=(0.5, 2.0),
                pos_interval=(10.0, 40.0), m=0.01, b=-0.8, cmp="<")
    base.update(kw)
    return Clause.make(**base)


def test_identity_passes():
    f = ("and", _clause(), _clause(temporal_op="F", b=1.2))
    assert subgoal_within_envelope(f, f)


def test_every_datagen_move_passes():
    rng = random.Random(0)
    f = ("and", _clause(), ("or", _clause(temporal_op="F"), _clause(b=3.0)))
    for _ in range(300):
        cand = _perturb_formula(rng, f, t_final=2.5)
        assert subgoal_within_envelope(f, cand), cand


def test_clause_count_change_fails():
    f = ("and", _clause(), _clause(b=2.0))
    assert not subgoal_within_envelope(f, _clause())
    assert not subgoal_within_envelope(_clause(), f)


def test_disjunct_commitment_passes():
    # committing to ONE side of an `or` is a sound subgoal (satisfying a
    # disjunct implies the disjunction) and a datagen candidate move
    left = _clause(temporal_op="F")
    right = _clause(b=3.0)
    f = ("and", _clause(), ("or", left, right))
    assert subgoal_within_envelope(f, ("and", _clause(), left))
    assert subgoal_within_envelope(f, ("and", _clause(), right))
    # but committing and then moving OUT of the numeric envelope fails
    far = dataclasses.replace(right, b=30.0)
    assert not subgoal_within_envelope(f, ("and", _clause(), far))
    # an `and` cannot be "committed" — dropping its clause still fails
    g = ("and", _clause(), _clause(b=2.0))
    assert not subgoal_within_envelope(g, _clause())


def test_junction_op_change_fails():
    a = ("and", _clause(), _clause(b=2.0))
    o = ("or", _clause(), _clause(b=2.0))
    assert not subgoal_within_envelope(a, o)


def test_spatial_move_fails():
    f = _clause()
    assert not subgoal_within_envelope(
        f, dataclasses.replace(f, x0=20.0, x1=50.0)
    )


def test_far_early_window_fails():
    # the wave_nc3 catastrophic profile: window yanked to near t=0
    f = _clause(time_interval=(0.8, 1.6))
    bad = dataclasses.replace(f, t0=0.05, t1=0.17)
    assert not subgoal_within_envelope(f, bad)


def test_window_extension_fails():
    f = _clause(time_interval=(0.5, 1.0))
    assert not subgoal_within_envelope(f, dataclasses.replace(f, t1=1.5))


def test_big_threshold_jump_fails():
    f = _clause(b=-0.8)
    assert not subgoal_within_envelope(f, dataclasses.replace(f, b=4.0))


def test_comparator_or_temporal_change_fails():
    f = _clause(cmp="<")
    assert not subgoal_within_envelope(f, dataclasses.replace(f, cmp=0))
    assert not subgoal_within_envelope(
        f, dataclasses.replace(f, temporal_op=1)
    )


def test_decomposition_moves_admissible():
    # the round-5 candidate pool's structured decompositions must pass the
    # serve gate's structural screen (training support ⊆ deployable moves)
    from pdec.pipeline.dpo_datagen import _clause_decompositions, propose_subgoals
    from pdec.stl.guard import decomposition_admissible, same_structure

    f = _clause(time_interval=(0.8, 1.6))
    for cand in _clause_decompositions(f, t_final=2.5):
        assert decomposition_admissible(f, cand), cand
    # inside a junction, composed with a disjunct commitment
    g = ("and", f, ("or", _clause(b=3.0), _clause(temporal_op="F")))
    for cand in _clause_decompositions(f, t_final=2.5):
        assert decomposition_admissible(
            g, ("and", cand, ("or", _clause(b=3.0), _clause(temporal_op="F"))))
        # composed with a disjunct commitment of the `or`
        assert decomposition_admissible(g, ("and", cand, _clause(b=3.0)))
    # a decomposition never changes the profile: threshold/slope moves fail
    assert not decomposition_admissible(
        f, dataclasses.replace(f, temporal_op="F", t0=0.9, t1=1.1, b=f.b - 1.0))
    # nor looks past the base window's end
    assert not decomposition_admissible(
        f, dataclasses.replace(f, temporal_op="F", t0=1.5, t1=2.4))
    # nor moves outside the spatial region
    assert not decomposition_admissible(
        f, dataclasses.replace(f, x0=5.0, x1=20.0))
    # EVERY candidate propose_subgoals can emit is structurally deployable
    rng = random.Random(1)
    for seed in range(5):
        rng = random.Random(seed)
        pool = propose_subgoals(rng, g, t_final=2.5, n_candidates=12)
        assert pool[0] == g
        for cand in pool:
            assert same_structure(g, cand) or decomposition_admissible(g, cand), cand


def test_gate_subgoal_strings():
    from pdec.stl.guard import same_structure

    base = _clause()
    good = dataclasses.replace(base, b=base.b - 0.2)
    # structure-only default: numeric deltas (even big ones) pass, a
    # clause-count change falls back
    big = dataclasses.replace(base, b=base.b - 5.0, t0=0.05, t1=0.2)
    two = ("and", base, dataclasses.replace(base, b=3.0))
    b_s, g_s, big_s = (format_sstl_latex(f) for f in (base, good, big))
    two_s = format_sstl_latex(two)
    assert gate_subgoal(b_s, g_s) == (g_s, False)
    assert gate_subgoal(b_s, big_s) == (big_s, False)
    assert same_structure(base, big)
    assert gate_subgoal(b_s, two_s) == (b_s, True)
    # comparator / temporal-op changes are structural
    assert not same_structure(base, dataclasses.replace(base, cmp=0))
    assert not same_structure(base, dataclasses.replace(base, temporal_op=1))
    # numeric_envelope=True restores the strict check
    assert gate_subgoal(b_s, big_s, numeric_envelope=True) == (b_s, True)
    # unparseable candidate falls back
    assert gate_subgoal(b_s, "not latex at all") == (b_s, True)
    # unparseable base passes the candidate through (nothing to anchor on)
    assert gate_subgoal("garbage", g_s) == (g_s, False)
