"""Parser tests: LaTeX SSTL dialect, cspec dialect, femformal program dialect.

Fixture strings mirror the reference example bank
(``utils/few_shot_prompts/examples/*/examples.jsonl``).
"""

import pytest

from pdec.stl.ast import CMP_EQ, CMP_GT, CMP_LT, Clause, TEMP_F, TEMP_G, formula_clauses
from pdec.stl.parse_cspec import APCont, format_cspec, parse_cspec
from pdec.stl.parse_latex import (
    SSTLParseError,
    format_sstl_latex,
    parse_clause_latex,
    parse_sstl_latex,
    split_sstl_structure,
)
from pdec.stl.program import (
    FemProgramParseError,
    format_fem_program,
    parse_fem_program,
)

HEAT_SSTL_1 = (
    "F_[[1.8288, 4.6769]] (\\forall x \\in [5, 97]  "
    "(u(x) - (0.0771 \\cdot x + 326.154) > 0))"
)
HEAT_SSTL_2 = (
    "F_[[0.2591, 2.7813]] (\\forall x \\in [19, 27]  "
    "(u(x) - (0.3167 \\cdot x + 263.3785) = 0)) \\land "
    "G_[[5.536, 7.2884]] (\\forall x \\in [132, 145]  "
    "(u(x) - (-0.0214 \\cdot x + 265.8454) < 0))"
)

HEAT_PROGRAM = """
from femformal.core.fem import heatlinfem as heatlinfem

N = 30
L = 112
rho = lambda x: 3.977e-06*470729859 if x < 3 or x > 49 else 5.952e-06*438533237
E = lambda x: 410042 if x < 3 or x > 49 else 1682393
xpart = np.linspace(0, L, N + 1)
g = [321, None]
f_nodal = np.zeros(N + 1)
dt = .05

T = 8
fosys = heatlinfem.heatlinfem_mix(xpart, rho, E, g, f_nodal, dt)

apc0 = logic.APCont([5, 97], ">", lambda x: 0.0771 * x + 326.154, lambda x: 0.0771)
cregions = {"A" : apc0}
cspec = "((F_[1.8288, 4.6769] (A)))"
"""

WAVE_PROGRAM = """
from femformal.core.fem import mechlinfem as mechlinfem

N = 20
L = 79651
rho = lambda x: 7.927e-06 if x < 33634 or x > 43799 else 8.452e-06
E = lambda x: 222786951 if x < 33634 or x > 43799 else 102749268
xpart = np.linspace(0, L, N + 1)
g = [0.0, None]
f_nodal = np.zeros(N + 1)
dt = .0025

T = 1.9424
sosys = mechlinfem.mechlinfem(xpart, rho, E, g, f_nodal, dt)

apc0 = logic.APCont([8330, 30692], "=", lambda x: -1.4897e-05 * x + -1.7281, lambda x: -1.4897e-05)
apc1 = logic.APCont([56782, 69640], "<", lambda x: 1.029e-06 * x + -0.3131, lambda x: 1.029e-06)
cregions = {"A" : apc0, "B" : apc1}
cspec = "((F_[0.0541, 0.2621] (A)) & (G_[0.2845, 0.8982] (B)))"
"""


class TestClauseLatex:
    def test_single_clause(self):
        c = parse_clause_latex(HEAT_SSTL_1)
        assert c.temporal_op == TEMP_F
        assert c.t0 == pytest.approx(1.8288)
        assert c.t1 == pytest.approx(4.6769)
        assert c.x0 == 5 and c.x1 == 97
        assert c.m == pytest.approx(0.0771)
        assert c.b == pytest.approx(326.154)
        assert c.cmp == CMP_GT

    def test_negative_slope_and_eq(self):
        f = parse_sstl_latex(HEAT_SSTL_2)
        clauses = formula_clauses(f)
        assert len(clauses) == 2
        assert clauses[0].cmp == CMP_EQ
        assert clauses[1].cmp == CMP_LT
        assert clauses[1].m == pytest.approx(-0.0214)
        op, _, _ = f
        assert op == "and"

    def test_implicit_multiplication(self):
        c = parse_clause_latex(
            "G_[[0.1, 0.5]] (\\forall x \\in [1, 9] (u(x) - (2x + 3) > 0))"
        )
        assert c.m == pytest.approx(2.0)
        assert c.b == pytest.approx(3.0)

    def test_x_over_c_form(self):
        c = parse_clause_latex(
            "G_[[0.1, 0.5]] (\\forall x \\in [1, 9] (u(x) - (x/4 + 3) > 0))"
        )
        assert c.m == pytest.approx(0.25)
        assert c.b == pytest.approx(3.0)

    def test_x_cdot_m_form(self):
        c = parse_clause_latex(
            "G_[[0.1, 0.5]] (\\forall x \\in [1, 9] "
            "(u(x) - (x \\cdot 0.5 + 3) \\leq 0))"
        )
        assert c.m == pytest.approx(0.5)
        assert c.cmp_str == "<="

    def test_no_expression(self):
        c = parse_clause_latex(
            "F_[[0.0, 1.0]] (\\forall x \\in [0, 10] (u(x) > 5))"
        )
        assert c.m == 0.0
        assert c.b == pytest.approx(5.0)  # threshold folded into intercept

    def test_nonzero_threshold_folds(self):
        c = parse_clause_latex(
            "F_[[0.0, 1.0]] (\\forall x \\in [0, 10] (u(x) - (1 \\cdot x + 2) > 3))"
        )
        assert c.b == pytest.approx(5.0)

    def test_rejects_garbage(self):
        with pytest.raises(SSTLParseError):
            parse_clause_latex("not a formula")
        with pytest.raises(SSTLParseError):
            parse_clause_latex("G_[[0.1, 0.5]] (no forall here)")


class TestStructure:
    def test_flat_conjunction(self):
        clauses, junctions, tree = split_sstl_structure(HEAT_SSTL_2)
        assert len(clauses) == 2
        assert junctions == ["and"]
        assert tree == (0, 1)

    def test_bracketed_disjunction(self):
        text = (
            "(G_[[0.1, 0.3]] (\\forall x \\in [5, 7] (u(x) - (1 \\cdot x + 0) > 0)) "
            "\\land G_[[0.3, 0.4]] (\\forall x \\in [5, 7] (u(x) - (1 \\cdot x + 0) < 0))) "
            "\\lor (G_[[0.4, 0.5]] (\\forall x \\in [5, 7] (u(x) - (1 \\cdot x + 0) < 0)) "
            "\\land G_[[0.5, 0.6]] (\\forall x \\in [5, 7] (u(x) - (1 \\cdot x + 0) > 0)))"
        )
        clauses, junctions, tree = split_sstl_structure(text)
        assert len(clauses) == 4
        assert junctions == ["and", "or", "and"]
        assert tree == ((0, 1), (2, 3))
        f = parse_sstl_latex(text)
        op, left, right = f
        assert op == "or"
        assert left[0] == "and" and right[0] == "and"

    def test_roundtrip(self):
        for text in (HEAT_SSTL_1, HEAT_SSTL_2):
            f = parse_sstl_latex(text)
            f2 = parse_sstl_latex(format_sstl_latex(f))
            assert formula_clauses(f) == formula_clauses(f2)


class TestCSpec:
    def test_single(self):
        regions = {"A": APCont(5, 97, ">", 0.0771, 326.154)}
        f = parse_cspec("((F_[1.8288, 4.6769] (A)))", regions)
        assert isinstance(f, Clause)
        assert f.temporal_op == TEMP_F

    def test_conjunction(self):
        regions = {
            "A": APCont(8330, 30692, "=", -1.4897e-05, -1.7281),
            "B": APCont(56782, 69640, "<", 1.029e-06, -0.3131),
        }
        f = parse_cspec("((F_[0.0541, 0.2621] (A)) & (G_[0.2845, 0.8982] (B)))", regions)
        op, left, right = f
        assert op == "and"
        assert left.temporal_op == TEMP_F
        assert right.temporal_op == TEMP_G

    def test_format_roundtrip(self):
        regions = {
            "A": APCont(1, 2, ">", 0.5, 1.0),
            "B": APCont(3, 4, "<", -0.5, 2.0),
        }
        f = parse_cspec("((G_[0, 1] (A)) | (F_[1, 2] (B)))", regions)
        cspec2, regions2 = format_cspec(f)
        f2 = parse_cspec(cspec2, regions2)
        assert formula_clauses(f) == formula_clauses(f2)


class TestFemProgram:
    def test_heat_program(self):
        p = parse_fem_program(HEAT_PROGRAM)
        assert p.kind == "heat"
        assert p.n_elements == 30
        assert p.length == 112
        assert p.g0 == 321 and p.g1 is None
        assert p.dt == pytest.approx(0.05)
        assert p.t_final == 8
        # piecewise: outside applies when x < 3 or x > 49
        assert p.rho(0) == pytest.approx(3.977e-06 * 470729859)
        assert p.rho(10) == pytest.approx(5.952e-06 * 438533237)
        assert p.elastic(100) == pytest.approx(410042)
        assert "A" in p.regions
        c = p.formula
        assert isinstance(c, Clause)
        assert c.x0 == 5 and c.x1 == 97

    def test_wave_program(self):
        p = parse_fem_program(WAVE_PROGRAM)
        assert p.kind == "wave"
        assert p.n_elements == 20
        assert p.g0 == 0.0
        op, left, right = p.formula
        assert op == "and"
        assert left.cmp_str == "="

    def test_roundtrip(self):
        p = parse_fem_program(WAVE_PROGRAM)
        p2 = parse_fem_program(format_fem_program(p))
        assert p2.kind == p.kind
        assert p2.n_elements == p.n_elements
        assert p2.rho == p.rho
        assert formula_clauses(p2.formula) == formula_clauses(p.formula)

    def test_rejects_malicious(self):
        # exec'd in the reference; parsed (and rejected) here.
        with pytest.raises(FemProgramParseError):
            parse_fem_program("import os\nos.system('rm -rf /')")
        with pytest.raises(FemProgramParseError):
            parse_fem_program("N = __import__('os').getpid()")
