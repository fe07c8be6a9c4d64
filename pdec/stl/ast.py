"""Typed SSTL AST and compilation to a fixed-shape, jit-friendly array form.

The SSTL fragment used by PDE-Controller (see the example bank at reference
``utils/few_shot_prompts/examples/*/examples.jsonl``) is:

    phi   ::= clause | phi \\land phi | phi \\lor phi | ( phi )
    clause::= T_[[t0, t1]] ( \\forall x in [x0, x1] ( u(x) - mu(x) ~ 0 ) )
    T     ::= G | F
    mu(x) ::= m * x + b          (linear spatial profile)
    ~     ::= < | > | <= | >= | =

A `Clause` holds the six parameters; a `Formula` is a binary and/or tree over
clauses.  For evaluation under jit/vmap with *static shapes*, `compile_spec`
lowers a Formula into a `CompiledSpec`:

- ``clauses``: float32 ``[MAX_CLAUSES, 8]`` rows of
  ``(temp_op, t0, t1, x0, x1, m, b, cmp)`` with unused rows zeroed, and
- ``program``: int32 ``[MAX_PROG, 2]`` postfix (RPN) program of
  ``(OP_PUSH, clause_idx) | (OP_AND, 0) | (OP_OR, 0) | (OP_NOP, 0)`` tokens,
  padded with NOPs.

Hard semantics then evaluates AND=min / OR=max over a fixed-depth value
stack via ``lax.scan`` (see `pdec.stl.semantics`), so one jitted function
covers every formula shape up to MAX_CLAUSES — the whole eval corpus (nc1-3,
reference ``test/scripts/test_pdecontrol.sh:10-18``) batches together under
``vmap`` regardless of per-example formula structure.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple, Union

import numpy as np

# Temporal operator codes.
TEMP_G = 0  # globally / always
TEMP_F = 1  # finally / eventually
TEMP_U = 2  # until (binary): row i = left predicate, row i+1 = right
TEMP_U_RHS = 3  # marker for an until clause's right-predicate row

# Comparator codes.  Signed distance conventions in semantics.py.
CMP_GT = 0
CMP_LT = 1
CMP_GE = 2
CMP_LE = 3
CMP_EQ = 4

_CMP_FROM_STR = {
    ">": CMP_GT,
    "<": CMP_LT,
    ">=": CMP_GE,
    "<=": CMP_LE,
    "=": CMP_EQ,
    "==": CMP_EQ,
}
_CMP_TO_STR = {CMP_GT: ">", CMP_LT: "<", CMP_GE: ">=", CMP_LE: "<=", CMP_EQ: "="}
_TEMP_FROM_STR = {"G": TEMP_G, "F": TEMP_F}
_TEMP_TO_STR = {TEMP_G: "G", TEMP_F: "F"}

# RPN program opcodes.
OP_NOP = 0
OP_PUSH = 1
OP_AND = 2
OP_OR = 3

# Static capacity of a compiled spec.  The corpus uses nc in {1,2,3}; DPO
# anchors may conjoin a couple more.  8 is comfortably above everything seen.
MAX_CLAUSES = 8
MAX_PROG = 2 * MAX_CLAUSES  # n pushes + (n-1) junctions <= 2n
STACK_DEPTH = MAX_CLAUSES


@dataclasses.dataclass(frozen=True)
class Clause:
    """One temporal clause: T_[t0,t1] (forall x in [x0,x1]: u - (m x + b) ~ 0)."""

    temporal_op: int  # TEMP_G | TEMP_F
    t0: float
    t1: float
    x0: float
    x1: float
    m: float  # profile slope
    b: float  # profile intercept
    cmp: int  # CMP_*

    @classmethod
    def make(
        cls,
        temporal_op: Union[str, int],
        time_interval: Tuple[float, float],
        pos_interval: Tuple[float, float],
        m: float,
        b: float,
        cmp: Union[str, int],
    ) -> "Clause":
        if isinstance(temporal_op, str):
            temporal_op = _TEMP_FROM_STR[temporal_op]
        if isinstance(cmp, str):
            cmp = _CMP_FROM_STR[cmp]
        return cls(
            temporal_op=int(temporal_op),
            t0=float(time_interval[0]),
            t1=float(time_interval[1]),
            x0=float(pos_interval[0]),
            x1=float(pos_interval[1]),
            m=float(m),
            b=float(b),
            cmp=int(cmp),
        )

    @property
    def temporal_op_str(self) -> str:
        return _TEMP_TO_STR[self.temporal_op]

    @property
    def cmp_str(self) -> str:
        return _CMP_TO_STR[self.cmp]

    def profile(self, x):
        return self.m * x + self.b


@dataclasses.dataclass(frozen=True)
class Until:
    """Binary until over two spatial predicates (BASELINE stretch config #3
    — the reference's G/F-only dialect, ``eval_script.py:344-354``, has no
    U; semantics follow standard quantitative STL evaluated at t = 0):

        rho((p) U_[t0,t1] (q)) =
            max_{t in [t0,t1]} min( rho(q, t), min_{s in [0,t]} rho(p, s) )

    ``lhs``/``rhs`` are spatial predicates carried as `Clause`s whose own
    temporal fields are ignored.  Compiles to TWO consecutive clause rows
    (TEMP_U + TEMP_U_RHS); the RPN program pushes only the first.
    """

    t0: float
    t1: float
    lhs: Clause
    rhs: Clause

    @classmethod
    def make(cls, time_interval: Tuple[float, float], lhs: Clause,
             rhs: Clause) -> "Until":
        return cls(
            t0=float(time_interval[0]), t1=float(time_interval[1]),
            lhs=lhs, rhs=rhs,
        )


# A Formula is a Clause, an Until, or ("and"|"or", left, right).
Formula = Union[Clause, Until, Tuple[str, "Formula", "Formula"]]


def formula_clauses(formula: Formula) -> list:
    """All clauses of a formula in left-to-right order (an Until
    contributes its two predicate clauses)."""
    if isinstance(formula, Clause):
        return [formula]
    if isinstance(formula, Until):
        return [formula.lhs, formula.rhs]
    op, left, right = formula
    return formula_clauses(left) + formula_clauses(right)


def _formula_rows(formula: Formula) -> list:
    """Compiled clause rows (8-tuples) in emission order."""
    if isinstance(formula, Clause):
        c = formula
        return [(c.temporal_op, c.t0, c.t1, c.x0, c.x1, c.m, c.b, c.cmp)]
    if isinstance(formula, Until):
        u = formula
        return [
            (TEMP_U, u.t0, u.t1, u.lhs.x0, u.lhs.x1, u.lhs.m, u.lhs.b,
             u.lhs.cmp),
            (TEMP_U_RHS, u.t0, u.t1, u.rhs.x0, u.rhs.x1, u.rhs.m, u.rhs.b,
             u.rhs.cmp),
        ]
    op, left, right = formula
    return _formula_rows(left) + _formula_rows(right)


def _emit_rpn(formula: Formula, clause_offset: int, prog: list) -> int:
    """Postfix-emit a formula; returns number of clause ROWS consumed."""
    if isinstance(formula, Clause):
        prog.append((OP_PUSH, clause_offset))
        return 1
    if isinstance(formula, Until):
        # one push for the pair of rows; semantics reads row+1 itself
        prog.append((OP_PUSH, clause_offset))
        return 2
    op, left, right = formula
    n_left = _emit_rpn(left, clause_offset, prog)
    n_right = _emit_rpn(right, clause_offset + n_left, prog)
    prog.append((OP_AND if op == "and" else OP_OR, 0))
    return n_left + n_right


@dataclasses.dataclass(frozen=True)
class CompiledSpec:
    """Fixed-shape array form of a Formula (host-side numpy; feed to jit fns)."""

    clauses: np.ndarray  # float32 [MAX_CLAUSES, 8]
    program: np.ndarray  # int32 [MAX_PROG, 2]
    n_clauses: int

    def as_batch_row(self):
        return self.clauses, self.program


def compile_spec(
    formula: Formula,
    max_clauses: int = MAX_CLAUSES,
    max_prog: int = MAX_PROG,
) -> CompiledSpec:
    row_list = _formula_rows(formula)
    if len(row_list) > max_clauses:
        raise ValueError(
            f"formula has {len(row_list)} clause rows > capacity {max_clauses}"
        )
    rows = np.zeros((max_clauses, 8), dtype=np.float32)
    for i, r in enumerate(row_list):
        rows[i] = r

    prog: list = []
    _emit_rpn(formula, 0, prog)
    if len(prog) > max_prog:
        raise ValueError(f"program length {len(prog)} > capacity {max_prog}")
    prog_arr = np.zeros((max_prog, 2), dtype=np.int32)  # OP_NOP padding
    for i, (op, arg) in enumerate(prog):
        prog_arr[i] = (op, arg)
    return CompiledSpec(clauses=rows, program=prog_arr,
                        n_clauses=len(row_list))


def stack_specs(specs: Sequence[CompiledSpec]):
    """Stack compiled specs into batch arrays for vmap."""
    cl = np.stack([s.clauses for s in specs])
    pr = np.stack([s.program for s in specs])
    return cl, pr
