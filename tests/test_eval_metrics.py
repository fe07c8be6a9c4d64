"""Metric engine tests: extraction, perplexity, edit distance, IoU parity."""

import math

import numpy as np
import pytest

import pdec.eval.iou as iou_mod
from pdec.eval.extraction import (
    INVALID,
    extract_python_and_sstl,
    extract_python_answer,
    extract_sstl_answer,
)
from pdec.eval.iou import eval_iou
from pdec.eval.metrics import eval_edit_distance, eval_perplexity, mean_and_std


class TestExtraction:
    def test_non_cot_python(self):
        gen = "x = 1\ny = 2\n```\ntrailing junk"
        assert extract_python_answer(gen) == "x = 1\ny = 2"

    def test_non_cot_unterminated(self):
        gen = "x = 1\ny = 2"
        assert extract_python_answer(gen) == "x = 1\ny = 2"

    def test_cot_both_blocks(self):
        gen = (
            "Spatial Signal Temporal Logic:\n```latex\nG_[[0, 1]] (x)\n```\n\n"
            "Python:\n```python\nprint(1)\n```\n"
        )
        py, sstl = extract_python_and_sstl(gen)
        assert py == "print(1)"
        assert sstl == "G_[[0, 1]] (x)"

    def test_cot_no_block(self):
        assert extract_python_answer("no code here", "cot") == INVALID

    def test_latex_inside_python_does_not_close(self):
        gen = "a = 1\n```latex\nstill python\n```\nafter"
        # a ```latex line does not close a python block (reference behavior)
        out = extract_python_answer(gen)
        assert out.startswith("a = 1")

    def test_first_block_only(self):
        gen = "one\n```\n```python\ntwo\n```"
        assert extract_python_answer(gen) == "one"


class TestScalarMetrics:
    def test_perplexity(self):
        lp = [-0.5, -1.5]
        assert eval_perplexity(lp) == pytest.approx(math.exp(1.0))
        assert eval_perplexity(None) == "failed"
        assert eval_perplexity([]) == "failed"

    def test_edit_distance(self):
        assert eval_edit_distance("kitten", "sitting") == 3
        assert eval_edit_distance("", "abc") == 3
        assert eval_edit_distance("same", "same") == 0

    def test_mean_and_std(self):
        m, s = mean_and_std([1.0, 2.0, 3.0])
        assert m == pytest.approx(2.0)
        assert s == pytest.approx(1.0)


SSTL_A = (
    "G_[[1.0, 3.0]] (\\forall x \\in [2, 8] "
    "(u(x) - (0.5 \\cdot x + 10) > 0))"
)
SSTL_B = (
    "F_[[2.0, 5.0]] (\\forall x \\in [1, 6] "
    "(u(x) - (-0.2 \\cdot x + 30) < 0))"
)
SSTL_AB = SSTL_A + " \\land " + SSTL_B
SSTL_A_OR_B = SSTL_A + " \\lor " + SSTL_B


class TestIoU:
    def test_identical_formulas(self):
        assert eval_iou(SSTL_A, SSTL_A) == pytest.approx(1.0)
        assert eval_iou(SSTL_AB, SSTL_AB) == pytest.approx(1.0)

    def test_failed_on_garbage(self):
        assert eval_iou("not sstl", SSTL_A) == "failed"
        assert eval_iou(SSTL_A, "") == "failed"

    def test_mathbf_dialect_fails(self):
        # \mathbf{G}_{[...]} clauses are rejected (reference regex behavior)
        bad = "\\mathbf{G}_{[0.1, 0.3]} (\\forall x \\in [1, 2] (u(x) > 0))"
        assert eval_iou(bad, SSTL_A) == "failed"

    def test_partial_overlap_in_unit_interval(self):
        v = eval_iou(SSTL_A, SSTL_AB)
        assert 0.0 < v < 1.0

    def test_junction_direction(self):
        # AND narrows the satisfied set vs OR
        v_and = eval_iou(SSTL_AB, SSTL_A)
        v_or = eval_iou(SSTL_A_OR_B, SSTL_A)
        assert v_and != v_or

    def test_symmetricish(self):
        assert eval_iou(SSTL_A, SSTL_B) == pytest.approx(
            eval_iou(SSTL_B, SSTL_A), abs=1e-6
        )


# ---------------------------------------------------------------------------
# Oracle: a literal bit-automaton transcription of the reference semantics
# (``eval_script.py:132-229,437-511``), run on a shrunken grid.
# ---------------------------------------------------------------------------


def _oracle_clause_bits(clause, is_f, ts_iter, xs_iter, profiles):
    """ts_iter: iteration-ordered times (backward for F); returns flat list."""
    out = []
    for (m, b) in profiles:
        period = []
        g_flag = False
        f_flag = False
        for t in ts_iter:
            u = m * t + b
            flag = None
            for x in xs_iter:
                if clause.t0 <= t <= clause.t1 and clause.x0 <= x <= clause.x1:
                    mu = clause.m * x + clause.b
                    lhs = u - mu
                    ok = {
                        ">": lhs > 0, "<": lhs < 0, ">=": lhs >= 0,
                        "<=": lhs <= 0, "=": lhs == 0,
                    }[clause.cmp_str]
                    if ok:
                        if flag is None:
                            flag = True
                    else:
                        flag = False
            if not is_f:
                if flag is None:
                    period.append(True)  # vacuous, force
                elif flag:
                    period.append(False if g_flag else True)
                else:
                    period = [False] * len(period)
                    period.append(False)
                    g_flag = True
            else:
                if flag is None:
                    period.insert(0, True)  # vacuous, force
                else:
                    if flag:
                        f_flag = True
                    period.insert(0, True if f_flag else bool(flag))
        if not is_f:
            out = out + period
        else:
            out = period + out  # F prepends whole periods too
    return out


def _mini_grids(clauses):
    t_min = min(c.t0 for c in clauses)
    t_max = max(c.t1 for c in clauses)
    x_min = min(c.x0 for c in clauses)
    x_max = max(c.x1 for c in clauses)
    steps = 8
    dt = (t_max - t_min) / steps
    dx = (x_max - x_min) / steps
    ts_fwd = list(np.arange(t_min, t_max + dt + 1e-7, dt))
    ts_bwd = list(np.arange(t_max, t_min - dt - 1e-7, -dt))
    xs_fwd = list(np.arange(x_min, x_max + dx + 1e-7, dx))
    xs_bwd = list(np.arange(x_max, x_min - dx - 1e-7, -dx))
    return ts_fwd, ts_bwd, xs_fwd, xs_bwd


def _oracle_iou(pred_text, gt_text, profiles):
    from pdec.stl.parse_latex import parse_clause_latex, split_sstl_structure

    def formula_bits(text, all_clauses):
        strs, junctions, tree = split_sstl_structure(text)
        clauses = [parse_clause_latex(s) for s in strs]
        ts_fwd, ts_bwd, xs_fwd, xs_bwd = _mini_grids(all_clauses)
        arrays = []
        for c in clauses:
            is_f = c.temporal_op_str == "F"
            bits = _oracle_clause_bits(
                c, is_f, ts_bwd if is_f else ts_fwd,
                xs_bwd if is_f else xs_fwd, profiles,
            )
            arrays.append(bits)
        # left-fold junctions (flat formulas only in these tests)
        result = arrays[0]
        for i in range(1, len(arrays)):
            op = junctions[i - 1]
            if op == "and":
                result = [a and b for a, b in zip(result, arrays[i])]
            else:
                result = [a or b for a, b in zip(result, arrays[i])]
        return result

    from pdec.stl.parse_latex import parse_clause_latex, split_sstl_structure

    all_strs = split_sstl_structure(pred_text)[0] + split_sstl_structure(gt_text)[0]
    all_clauses = [parse_clause_latex(s) for s in all_strs]
    p = formula_bits(pred_text, all_clauses)
    g = formula_bits(gt_text, all_clauses)
    inter = sum(a and b for a, b in zip(p, g))
    union = sum(a or b for a, b in zip(p, g))
    return 1.0 if union == 0 else inter / union


@pytest.mark.parametrize(
    "pred,gt",
    [
        (SSTL_A, SSTL_A),
        (SSTL_A, SSTL_B),
        (SSTL_AB, SSTL_A),
        (SSTL_A_OR_B, SSTL_AB),
        (SSTL_B, SSTL_AB),
    ],
)
def test_iou_matches_oracle_on_mini_grid(monkeypatch, pred, gt):
    """Vectorized kernel == literal reference automaton on a shrunken grid."""
    monkeypatch.setattr(iou_mod, "_DT_STEPS", 8)
    monkeypatch.setattr(iou_mod, "_DX_STEPS", 8)
    monkeypatch.setattr(iou_mod, "_D_STEPS", 4)
    profiles_m = np.arange(-7.0, 7.0, 14.0 / 4)
    profiles_b = np.arange(-500.0, 500.0, 1000.0 / 4)
    profiles = [(m, b) for m in profiles_m for b in profiles_b]

    got = eval_iou(pred, gt)
    want = _oracle_iou(pred, gt, profiles)
    assert got == pytest.approx(want, abs=1e-6)
