"""DPO preference-pair construction tests (reference data schema)."""

import random

from pdec.control.synthesis import SynthesisConfig
from pdec.data.generator import GeneratorConfig, sample_problem
from pdec.pipeline.dpo_datagen import build_dpo_pairs
from pdec.stl.ast import Clause, formula_clauses
from pdec.stl.parse_latex import parse_sstl_latex

FAST = SynthesisConfig(n_iters=8, n_starts=2, polish_iters=0)

REFERENCE_DPO_KEYS = {
    "anchor", "w_utility", "w_time", "w_sstl", "l_utility", "l_time",
    "l_sstl", "dataset_class", "pidx", "nc",
}


def test_dpo_pair_schema_and_ordering():
    rng = random.Random(11)
    examples = [
        sample_problem(rng, GeneratorConfig(kind="heat", n_clauses=1))
        for _ in range(8)
    ]
    rows = build_dpo_pairs(examples, n_candidates=4, synthesis=FAST, seed=0,
                           chain=False)
    assert rows, "no preference pairs produced"
    for row in rows:
        # reference schema keys all present (extra diagnostic keys —
        # pair_kind, identity_utility — are allowed; the tokenizer only
        # reads the reference keys)
        assert REFERENCE_DPO_KEYS <= set(row)
        # winner strictly better than loser on the TRUE objective
        assert row["w_utility"] > row["l_utility"]
        # both sstl views parse back into valid formulas
        w = parse_sstl_latex(row["w_sstl"])
        l = parse_sstl_latex(row["l_sstl"])
        assert formula_clauses(w) and formula_clauses(l)
        assert row["dataset_class"] == "heat"
        assert row["nc"] == 1


def test_identity_subgoal_wins_over_bad_perturbations(monkeypatch):
    """The unperturbed spec is always candidate 0: when every perturbation
    is catastrophically bad, the winner must be the identity subgoal."""
    import dataclasses

    import pdec.pipeline.dpo_datagen as dd
    from pdec.stl.parse_latex import format_sstl_latex

    def ruinous(rng, f, t_final):
        def wreck(g):
            if isinstance(g, Clause):
                return dataclasses.replace(g, b=g.b + 1e6)
            op, left, right = g
            return (op, wreck(left), wreck(right))
        return wreck(f)

    monkeypatch.setattr(dd, "_perturb_formula", ruinous)
    rng = random.Random(5)
    examples = [
        sample_problem(rng, GeneratorConfig(kind="heat", n_clauses=1))
        for _ in range(2)
    ]
    rows = build_dpo_pairs(examples, n_candidates=3, synthesis=FAST, seed=1,
                           chain=False)
    assert rows
    for row in rows:
        ex = examples[row["pidx"]]
        assert row["w_sstl"] == format_sstl_latex(ex.formula)


def test_chained_scoring_produces_schema_rows():
    """chain=True (production default): utilities are chained two-phase
    values; surviving pairs certify subgoals that beat no-intervention by
    more than the noise floor, and the schema is unchanged."""
    rng = random.Random(7)
    examples = [
        sample_problem(rng, GeneratorConfig(kind="heat", n_clauses=2))
        for _ in range(6)
    ]
    rows = build_dpo_pairs(examples, n_candidates=4, synthesis=FAST, seed=2)
    for row in rows:
        # reference schema keys all present (extra diagnostic keys —
        # pair_kind, identity_utility — are allowed; the tokenizer only
        # reads the reference keys)
        assert REFERENCE_DPO_KEYS <= set(row)
        assert row["w_utility"] > row["l_utility"]


def test_select_preference_branches():
    """Identity-anchored emission logic, deterministically (candidate 0 is
    the identity): intervene-pair, abstain-pair, and no-pair branches."""
    from pdec.pipeline.dpo_datagen import select_preference

    # a subgoal clearly beats identity -> (subgoal, identity)
    assert select_preference([1.0, 3.0, 0.5]) == (1, 0)
    # nothing beats identity, but a rewrite clearly hurts -> (identity, worst)
    assert select_preference([1.0, 0.98, -2.0]) == (0, 2)
    # everything inside the noise floor -> no pair
    assert select_preference([1.0, 1.01, 0.99]) is None
    # best beats identity but only within the floor -> falls through to
    # the abstain check, which also fails -> no pair
    assert select_preference([1.0, 1.05, 0.96]) is None


def test_branch_move_commits_to_one_disjunct():
    """_perturb_formula's branch move replaces an `or` junction with one
    of its children (the gradient analogue of MILP integer branching on
    disjunctions); over many seeds on an or-formula both disjunct choices
    appear and the result never contains that `or`."""
    from pdec.pipeline.dpo_datagen import _or_nodes, _perturb_formula

    rng = random.Random(3)
    ex = None
    for _ in range(200):
        cand = sample_problem(
            rng, GeneratorConfig(kind="heat", n_clauses=3))
        if _or_nodes(cand.formula):
            ex = cand
            break
    assert ex is not None, "generator never produced an or-formula"
    n_or = len(_or_nodes(ex.formula))
    n_cl = len(formula_clauses(ex.formula))
    branched = 0
    for s in range(64):
        r = random.Random(s)
        out = _perturb_formula(r, ex.formula, ex.program.t_final)
        if len(formula_clauses(out)) < n_cl:
            branched += 1
            assert len(_or_nodes(out)) < n_or
    # the branch move fires with probability ~1/2 on or-formulas
    assert branched > 10


def test_score_seed_replication_averages_labels():
    """n_seeds > 1 averages utilities over independent synthesis seeds;
    the pair schema is unchanged and winners still beat losers."""
    rng = random.Random(5)
    examples = [
        sample_problem(rng, GeneratorConfig(kind="heat", n_clauses=1))
        for _ in range(4)
    ]
    rows = build_dpo_pairs(examples, n_candidates=3, synthesis=FAST,
                           seed=0, chain=False, n_seeds=2, floor_frac=0.02)
    for row in rows:
        assert row["w_utility"] > row["l_utility"]
        assert row["pair_kind"] in ("intervene", "keep_identity")
