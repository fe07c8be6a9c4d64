"""Parser for the LaTeX SSTL dialect emitted by the translator LLM.

Accepts the same language as the reference's regex clause engine (reference
``test/PDEcontrol/evaluation/eval/eval_script.py:283-399``): formulas are
``\\land`` / ``\\lor`` chains of clauses with optional bracket grouping;
each clause looks like

    F_[[0.2591, 2.7813]] (\\forall x \\in [19, 27] (u(x) - (0.3167 \\cdot x
        + 263.3785) = 0))

with several tolerated surface variants of the linear expression
(``m \\cdot x + b``, ``x \\cdot m + b``, ``x/c + b``, implicit ``mx + b``,
``\\frac{..}{..}``, missing expression => mu = 0) and comparators
``< > <= >= = != \\leq \\geq``.

Unlike the reference — which ``eval()``s the cleaned expression string — the
linear profile is extracted by a safe arithmetic AST evaluator (no code
execution on LLM output).

Exports both a *structural* parse (clause strings + junction list + bracket
tree, used by the IoU engine to mirror the reference's grouping quirks) and
a parse to the typed `Formula` AST used for robustness/synthesis.
"""

from __future__ import annotations

import ast
import re
from typing import List, Sequence, Tuple, Union

from pdec.stl.ast import Clause, Formula, Until

_NUM = r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?"

_TEMPORAL_RE = re.compile(r"([FGU])_\[\[(" + _NUM + r"),\s*(" + _NUM + r")\]\]")
_FORALL_RE = re.compile(
    r"\\forall x \\in \[(" + _NUM + r"),\s*(" + _NUM + r")\]"
)
# The predicate: u(x) [- ( <linear expr> )] <cmp> <threshold>
_PREDICATE_RE = re.compile(
    r"u\(x\)\s*(?:-\s*\((?P<expr>[^()]*(?:\([^()]*\)[^()]*)*)\)\s*)?"
    r"(?P<cmp><=|>=|<|>|!=|==|=|\\leq|\\geq)\s*(?P<thr>-?\d+(?:\.\d+)?)"
)

_CMP_NORMALIZE = {"\\leq": "<=", "\\geq": ">=", "==": "=", "!=": "="}


class SSTLParseError(ValueError):
    pass


def _clean_expression(expr: str) -> str:
    """Normalize LaTeX arithmetic into python-ish arithmetic.

    Mirrors the reference's ``clean_expression`` (``eval_script.py:390-399``):
    ``\\cdot`` -> ``*``, ``\\left``/``\\right`` -> parens, ``\\frac{a}{b}``
    -> ``a/b``, implicit ``3x`` -> ``3*x``.
    """
    expr = expr.replace("\\cdot", "*")
    expr = expr.replace("\\left", "(").replace("\\right", ")")
    expr = re.sub(r"\\frac\{(.*?)\}\{(.*?)\}", r"(\1)/(\2)", expr)
    expr = re.sub(r"(\d)\s*([x])", r"\1*\2", expr)
    expr = re.sub(r"([x])\s*(\d)", r"\1*\2", expr)
    return expr


def _safe_eval_arith(node: ast.AST, x: float) -> float:
    """Evaluate a pure-arithmetic AST (numbers, + - * / **, unary, 'x')."""
    if isinstance(node, ast.Expression):
        return _safe_eval_arith(node.body, x)
    if isinstance(node, ast.Constant) and isinstance(node.value, (int, float)):
        return float(node.value)
    if isinstance(node, ast.Name) and node.id == "x":
        return x
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, (ast.UAdd, ast.USub)):
        v = _safe_eval_arith(node.operand, x)
        return v if isinstance(node.op, ast.UAdd) else -v
    if isinstance(node, ast.BinOp) and isinstance(
        node.op, (ast.Add, ast.Sub, ast.Mult, ast.Div, ast.Pow)
    ):
        a = _safe_eval_arith(node.left, x)
        b = _safe_eval_arith(node.right, x)
        if isinstance(node.op, ast.Add):
            return a + b
        if isinstance(node.op, ast.Sub):
            return a - b
        if isinstance(node.op, ast.Mult):
            return a * b
        if isinstance(node.op, ast.Div):
            return a / b
        return a**b
    raise SSTLParseError(f"unsupported expression node: {ast.dump(node)}")


def linear_coeffs(node: ast.AST) -> Tuple[float, float]:
    """Symbolically evaluate an AST as a linear form ``m*x + b``.

    Exact (no catastrophic cancellation from numeric probing) and rejects
    nonlinear expressions structurally.
    """
    if isinstance(node, ast.Expression):
        return linear_coeffs(node.body)
    if isinstance(node, ast.Constant) and isinstance(node.value, (int, float)):
        return 0.0, float(node.value)
    if isinstance(node, ast.Name) and node.id == "x":
        return 1.0, 0.0
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, (ast.UAdd, ast.USub)):
        m, b = linear_coeffs(node.operand)
        return (m, b) if isinstance(node.op, ast.UAdd) else (-m, -b)
    if isinstance(node, ast.BinOp):
        if isinstance(node.op, (ast.Add, ast.Sub)):
            m1, b1 = linear_coeffs(node.left)
            m2, b2 = linear_coeffs(node.right)
            if isinstance(node.op, ast.Add):
                return m1 + m2, b1 + b2
            return m1 - m2, b1 - b2
        if isinstance(node.op, ast.Mult):
            m1, b1 = linear_coeffs(node.left)
            m2, b2 = linear_coeffs(node.right)
            if m1 == 0.0:
                return b1 * m2, b1 * b2
            if m2 == 0.0:
                return m1 * b2, b1 * b2
            raise SSTLParseError("nonlinear product in expression")
        if isinstance(node.op, ast.Div):
            m1, b1 = linear_coeffs(node.left)
            m2, b2 = linear_coeffs(node.right)
            if m2 != 0.0 or b2 == 0.0:
                raise SSTLParseError("division by non-constant in expression")
            return m1 / b2, b1 / b2
        if isinstance(node.op, ast.Pow):
            m1, b1 = linear_coeffs(node.left)
            m2, b2 = linear_coeffs(node.right)
            if m1 == 0.0 and m2 == 0.0:
                return 0.0, b1**b2
            raise SSTLParseError("nonlinear power in expression")
    raise SSTLParseError(f"unsupported expression node: {ast.dump(node)}")


def eval_linear_expression(expr: str) -> Tuple[float, float]:
    """Extract (m, b) from a linear-in-x arithmetic expression string."""
    cleaned = _clean_expression(expr)
    try:
        tree = ast.parse(cleaned, mode="eval")
    except SyntaxError as e:
        raise SSTLParseError(f"cannot parse expression {expr!r}") from e
    return linear_coeffs(tree)


def _parse_spatial_pred(text: str, temporal_op: str, time_interval) -> Clause:
    """Parse one ``\\forall x ... (u(x) ... ~ thr)`` segment."""
    fm = _FORALL_RE.search(text)
    if not fm:
        raise SSTLParseError(f"no position interval in {text!r}")
    # Reference truncates positions to int (``eval_script.py:342``).
    x0 = int(float(fm.group(1)))
    x1 = int(float(fm.group(2)))

    pm = _PREDICATE_RE.search(text)
    if not pm:
        raise SSTLParseError(f"no predicate in {text!r}")
    expr = pm.group("expr")
    cmp = pm.group("cmp")
    cmp = _CMP_NORMALIZE.get(cmp, cmp)
    threshold = float(pm.group("thr"))

    if expr is None or expr.strip() == "":
        m, b = 0.0, 0.0
    else:
        m, b = eval_linear_expression(expr)

    # u - (m x + b) ~ thr   <=>   u - (m x + (b + thr)) ~ 0
    return Clause.make(temporal_op, time_interval, (x0, x1), m, b + threshold,
                       cmp)


def parse_clause_latex(text: str) -> Union[Clause, Until]:
    """Parse one SSTL clause string into a typed `Clause` (or `Until`).

    Until uses the prefix dialect (beyond the reference's G/F-only
    language, BASELINE stretch config #3):

        U_[[t0, t1]] (\\forall x \\in [a, b] (u(x) ... > 0),
                      \\forall x \\in [c, d] (u(x) ... > 0))

    i.e. "the left predicate holds from t = 0 until, at some t in
    [t0, t1], the right predicate holds" — standard quantitative STL
    evaluated at t = 0.
    """
    tm = _TEMPORAL_RE.search(text)
    if not tm:
        raise SSTLParseError(f"no temporal operator in {text!r}")
    temporal_op = tm.group(1)
    t0, t1 = float(tm.group(2)), float(tm.group(3))
    if temporal_op == "U":
        foralls = list(_FORALL_RE.finditer(text))
        if len(foralls) != 2:
            raise SSTLParseError(
                f"U clause needs exactly 2 predicates, got {len(foralls)} "
                f"in {text!r}"
            )
        lhs_text = text[foralls[0].start():foralls[1].start()]
        rhs_text = text[foralls[1].start():]
        return Until.make(
            (t0, t1),
            _parse_spatial_pred(lhs_text, "G", (t0, t1)),
            _parse_spatial_pred(rhs_text, "G", (t0, t1)),
        )
    return _parse_spatial_pred(text, temporal_op, (t0, t1))


def split_sstl_structure(
    text: str,
) -> Tuple[List[str], List[str], tuple]:
    """Split a formula into (clause_strings, junctions, bracket_tree).

    Mirrors the reference's structural pass (``parse_sstl``,
    ``eval_script.py:283-328``): split on ``\\land``/``\\lor``, then build a
    nesting tree from parenthesis balance, where each leaf is a clause index
    and each tuple is a bracketed group.
    """
    parts = re.split(r"(\\land|\\lor)", text)
    clauses: List[str] = []
    junctions: List[str] = []
    tree: list = []
    stack: List[list] = [tree]
    balance = 0
    for part in parts:
        part = part.strip()
        if not part:
            continue
        if part == "\\land":
            junctions.append("and")
            continue
        if part == "\\lor":
            junctions.append("or")
            continue
        clauses.append(part)
        idx = len(clauses) - 1
        if part[0] in ("G", "F", "U"):
            stack[-1].append(idx)
        elif part[0] == "(":
            group: list = [idx]
            stack[-1].append(group)
            stack.append(group)
        # Other prefixes (e.g. ``\\mathbf{G}``) are collected as clause text
        # but omitted from the tree — matching the reference's structural
        # pass (``eval_script.py:308-313``), which later rejects them in the
        # clause regex anyway.
        new_balance = balance + part.count("(") - part.count(")")
        if new_balance < balance:
            for _ in range(balance - new_balance):
                if len(stack) > 1:
                    stack.pop()
        balance = new_balance

    def to_tuple(node):
        if isinstance(node, list):
            return tuple(to_tuple(n) for n in node)
        return node

    return clauses, junctions, to_tuple(tree)


def _last_leaf(node: Union[int, tuple]) -> int:
    while isinstance(node, tuple):
        node = node[-1]
    return node


def _tree_to_formula(
    node: Union[int, tuple], clauses: Sequence[Clause], junctions: Sequence[str]
) -> Formula:
    if isinstance(node, int):
        return clauses[node]
    if len(node) == 1:
        return _tree_to_formula(node[0], clauses, junctions)
    # Left-fold children; the junction joining child i-1 and i is the one at
    # the textual position of child i-1's last clause.
    result = _tree_to_formula(node[0], clauses, junctions)
    for i in range(1, len(node)):
        j = junctions[_last_leaf(node[i - 1])]
        result = (j, result, _tree_to_formula(node[i], clauses, junctions))
    return result


def parse_sstl_latex(text: str) -> Formula:
    """Parse a full LaTeX SSTL formula into the typed `Formula` AST."""
    clause_strs, junctions, tree = split_sstl_structure(text)
    if not clause_strs:
        raise SSTLParseError("empty formula")
    clauses = [parse_clause_latex(c) for c in clause_strs]
    if len(junctions) < len(clauses) - 1:
        raise SSTLParseError("fewer junctions than needed")
    if not tree:
        raise SSTLParseError("empty bracket tree")
    node = tree if len(tree) > 1 else tree[0]
    return _tree_to_formula(node, clauses, junctions)


def _fmt_num(v: float) -> str:
    s = f"{v:.10g}"
    return s


def _fmt_pred(c: Clause) -> str:
    return (
        f"\\forall x \\in [{_fmt_num(c.x0)}, {_fmt_num(c.x1)}]  "
        f"(u(x) - ({_fmt_num(c.m)} \\cdot x + {_fmt_num(c.b)}) {c.cmp_str} 0)"
    )


def format_clause_latex(c: Union[Clause, Until]) -> str:
    """Format a clause in the ground-truth dialect used by the example bank."""
    if isinstance(c, Until):
        return (
            f"U_[[{_fmt_num(c.t0)}, {_fmt_num(c.t1)}]] "
            f"({_fmt_pred(c.lhs)}, {_fmt_pred(c.rhs)})"
        )
    return (
        f"{c.temporal_op_str}_[[{_fmt_num(c.t0)}, {_fmt_num(c.t1)}]] "
        f"({_fmt_pred(c)})"
    )


def format_sstl_latex(formula: Formula) -> str:
    """Serialize a Formula back to the GT LaTeX dialect (round-trippable)."""
    if isinstance(formula, (Clause, Until)):
        return format_clause_latex(formula)
    op, left, right = formula
    tok = "\\land" if op == "and" else "\\lor"

    def side(child: Formula) -> str:
        s = format_sstl_latex(child)
        # Parenthesize mixed-operator children so grouping survives re-parsing.
        if isinstance(child, tuple) and child[0] != op:
            return f"({s})"
        return s

    return f"{side(left)} {tok} {side(right)}"
