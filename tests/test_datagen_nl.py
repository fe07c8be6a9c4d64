"""Datagen round-trip tests + NL parsing against the reference example bank."""

import json
import os
import random

import pytest

from pdec.data.generator import GeneratorConfig, render_example, sample_problem
from pdec.data.nl import parse_nl_problem
from pdec.stl.ast import formula_clauses
from pdec.stl.parse_latex import parse_sstl_latex
from pdec.stl.program import parse_fem_program

REFERENCE_EXAMPLES = "/root/reference/utils/few_shot_prompts/examples"


@pytest.mark.parametrize("kind", ["heat", "wave"])
@pytest.mark.parametrize("nc", [1, 2, 3])
def test_generated_examples_are_self_consistent(kind, nc):
    rng = random.Random(1234 + nc)
    for _ in range(5):
        ex = sample_problem(rng, GeneratorConfig(kind=kind, n_clauses=nc))
        row = render_example(ex)
        # python view parses back to the same problem
        prog = parse_fem_program(row["python"])
        assert prog.kind == kind
        assert prog.n_elements == ex.program.n_elements
        assert formula_clauses(prog.formula) == formula_clauses(ex.formula)
        # sstl view parses back to the same clauses
        f2 = parse_sstl_latex(row["sstl"])
        assert formula_clauses(f2) == formula_clauses(ex.formula)
        # nl view parses back to the same problem + spec
        nl_prog = parse_nl_problem(row["nl"])
        assert nl_prog.kind == kind
        assert nl_prog.length == ex.program.length
        assert nl_prog.dt == ex.program.dt
        assert nl_prog.t_final == ex.program.t_final
        nl_clauses = formula_clauses(nl_prog.formula)
        gt_clauses = formula_clauses(ex.formula)
        assert len(nl_clauses) == len(gt_clauses)
        for a, b in zip(nl_clauses, gt_clauses):
            assert a.temporal_op == b.temporal_op
            assert a.cmp == b.cmp
            assert a.t0 == pytest.approx(b.t0)
            assert a.x1 == pytest.approx(b.x1)
            assert a.m == pytest.approx(b.m)
            assert a.b == pytest.approx(b.b)


def _load_reference_rows(dataset):
    path = os.path.join(REFERENCE_EXAMPLES, dataset, "examples.jsonl")
    if not os.path.exists(path):
        pytest.skip("reference example bank not mounted")
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


@pytest.mark.parametrize("dataset", ["one_d_heat", "one_d_wave"])
def test_reference_bank_programs_parse(dataset):
    rows = _load_reference_rows(dataset)
    assert rows
    for row in rows:
        prog = parse_fem_program(row["python"])
        gt = parse_sstl_latex(row["sstl"])
        assert formula_clauses(prog.formula)  # non-empty
        # program spec and sstl agree on clause count and temporal ops
        pc, sc = formula_clauses(prog.formula), formula_clauses(gt)
        assert len(pc) == len(sc)
        for a, b in zip(pc, sc):
            assert a.temporal_op == b.temporal_op
            assert a.m == pytest.approx(b.m, rel=1e-6)


@pytest.mark.parametrize("dataset", ["one_d_heat", "one_d_wave"])
def test_reference_bank_nl_parses(dataset):
    """Domain parameters + clause structure recoverable from corpus NL."""
    rows = _load_reference_rows(dataset)
    for row in rows:
        prog_gt = parse_fem_program(row["python"])
        nl_prog = parse_nl_problem(row["nl"])
        assert nl_prog.kind == prog_gt.kind
        assert nl_prog.length == pytest.approx(prog_gt.length)
        assert nl_prog.dt == pytest.approx(prog_gt.dt)
        assert nl_prog.t_final == pytest.approx(prog_gt.t_final)
        assert nl_prog.n_elements == prog_gt.n_elements
        # clause count and profiles match the GT sstl
        gt_clauses = formula_clauses(parse_sstl_latex(row["sstl"]))
        nl_clauses = formula_clauses(nl_prog.formula)
        assert len(nl_clauses) == len(gt_clauses)
        for a, b in zip(nl_clauses, gt_clauses):
            assert a.m == pytest.approx(b.m, rel=1e-6)
            assert a.t0 == pytest.approx(b.t0, rel=1e-6)
            assert a.t1 == pytest.approx(b.t1, rel=1e-6)
