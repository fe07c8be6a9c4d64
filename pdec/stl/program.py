"""Safe parser for the femformal-dialect Python programs emitted by the coder.

The reference *executes* LLM-generated code inside a Python-2 subprocess
(reference ``eval_script.py:43-79``, ``eval_robustness_wrapper.py:13-21``).
Here the same surface syntax is *parsed* — via the ``ast`` module, with a
whitelisted arithmetic evaluator and no code execution — into a typed
`FemProgram`, which is both safer and the bridge to jit-compiled physics
(`pdec.physics`).

Accepted program shape (reference example bank,
``utils/few_shot_prompts/examples/one_d_{heat,wave}/examples.jsonl``):

    from femformal.core.fem import heatlinfem as heatlinfem   # or mechlinfem
    N = 30
    L = 112
    rho = lambda x: A if x < c1 or x > c2 else B
    E = lambda x: A2 if x < c1 or x > c2 else B2
    xpart = np.linspace(0, L, N + 1)
    g = [321, None]                       # heat: left temp; wave: [0.0, None]
    f_nodal = np.zeros(N + 1)
    dt = .05
    T = 8
    fosys = heatlinfem.heatlinfem_mix(xpart, rho, E, g, f_nodal, dt)
    apc0 = logic.APCont([5, 97], ">", lambda x: 0.0771*x + 326.154, ...)
    cregions = {"A": apc0}
    cspec = "((F_[1.8288, 4.6769] (A)))"
"""

from __future__ import annotations

import ast
import dataclasses
from typing import Dict, Optional, Tuple

from pdec.stl.ast import Formula
from pdec.stl.parse_cspec import APCont, format_cspec, parse_cspec
from pdec.stl.parse_latex import _safe_eval_arith, linear_coeffs


class FemProgramParseError(ValueError):
    pass


@dataclasses.dataclass(frozen=True)
class Piecewise:
    """``lambda x: outside if x < lo or x > hi else inside``."""

    outside: float
    inside: float
    lo: float
    hi: float

    def __call__(self, x: float) -> float:
        return self.outside if (x < self.lo or x > self.hi) else self.inside

    @classmethod
    def constant(cls, v: float) -> "Piecewise":
        return cls(outside=v, inside=v, lo=0.0, hi=0.0)


@dataclasses.dataclass(frozen=True)
class FemProgram:
    """Typed form of a coder-dialect program (one rod control problem)."""

    kind: str  # 'heat' | 'wave'
    n_elements: int
    length: float
    rho: Piecewise
    elastic: Piecewise
    g0: Optional[float]  # left-end Dirichlet value (None = free)
    g1: Optional[float]  # right-end Dirichlet value (None = free/controlled)
    dt: float
    t_final: float
    regions: Dict[str, APCont]
    cspec: str

    @property
    def formula(self) -> Formula:
        return parse_cspec(self.cspec, self.regions)


def _eval_const(node: ast.AST) -> float:
    return _safe_eval_arith(node, 0.0)


def _parse_material_lambda(node: ast.AST) -> Piecewise:
    if not isinstance(node, ast.Lambda):
        raise FemProgramParseError("material must be a lambda")
    body = node.body
    if not isinstance(body, ast.IfExp):
        # constant material
        return Piecewise.constant(_eval_const(body))
    outside = _eval_const(body.body)
    inside = _eval_const(body.orelse)
    test = body.test
    lo = hi = None
    comparisons = []
    if isinstance(test, ast.BoolOp) and isinstance(test.op, ast.Or):
        comparisons = test.values
    elif isinstance(test, ast.Compare):
        comparisons = [test]
    else:
        raise FemProgramParseError("unsupported material condition")
    for comp in comparisons:
        if not (isinstance(comp, ast.Compare) and len(comp.ops) == 1):
            raise FemProgramParseError("unsupported comparison in material")
        op = comp.ops[0]
        left, right = comp.left, comp.comparators[0]
        if isinstance(left, ast.Name) and left.id == "x":
            bound = _eval_const(right)
            if isinstance(op, (ast.Lt, ast.LtE)):
                lo = bound
            elif isinstance(op, (ast.Gt, ast.GtE)):
                hi = bound
            else:
                raise FemProgramParseError("unsupported material comparator")
        else:
            raise FemProgramParseError("material comparison must be on x")
    if lo is None and hi is None:
        raise FemProgramParseError("no bounds in material condition")
    if lo is None:
        lo = float("-inf")
    if hi is None:
        hi = float("inf")
    return Piecewise(outside=outside, inside=inside, lo=lo, hi=hi)


def _parse_linear_lambda(node: ast.AST) -> Tuple[float, float]:
    """(m, b) from ``lambda x: m * x + b`` (any linear arithmetic form)."""
    if not isinstance(node, ast.Lambda):
        raise FemProgramParseError("profile must be a lambda")
    return linear_coeffs(node.body)


def _parse_apcont(call: ast.Call) -> APCont:
    if len(call.args) < 3:
        raise FemProgramParseError("APCont needs >= 3 args")
    interval = call.args[0]
    if not (isinstance(interval, ast.List) and len(interval.elts) == 2):
        raise FemProgramParseError("APCont interval must be a 2-list")
    x0 = _eval_const(interval.elts[0])
    x1 = _eval_const(interval.elts[1])
    cmp_node = call.args[1]
    if not (isinstance(cmp_node, ast.Constant) and isinstance(cmp_node.value, str)):
        raise FemProgramParseError("APCont comparator must be a string")
    cmp = cmp_node.value
    if cmp not in ("<", ">", "<=", ">=", "="):
        raise FemProgramParseError(f"unsupported APCont comparator {cmp!r}")
    m, b = _parse_linear_lambda(call.args[2])
    return APCont(x0=x0, x1=x1, cmp=cmp, m=m, b=b)


def _call_name(call: ast.Call) -> str:
    f = call.func
    if isinstance(f, ast.Attribute):
        return f.attr
    if isinstance(f, ast.Name):
        return f.id
    return ""


def parse_fem_program(code: str) -> FemProgram:
    """Parse coder-dialect source into a `FemProgram` (no execution)."""
    try:
        tree = ast.parse(code)
    except SyntaxError as e:
        raise FemProgramParseError(f"syntax error: {e}") from e

    values: Dict[str, object] = {}
    apconts: Dict[str, APCont] = {}
    kind: Optional[str] = None
    regions: Dict[str, APCont] = {}
    cspec: Optional[str] = None
    g: Optional[Tuple[Optional[float], Optional[float]]] = None

    for stmt in tree.body:
        if isinstance(stmt, (ast.Import, ast.ImportFrom)):
            src = ast.dump(stmt)
            if "heatlinfem" in src:
                kind = "heat"
            elif "mechlinfem" in src:
                kind = "wave"
            continue
        if not isinstance(stmt, ast.Assign) or len(stmt.targets) != 1:
            continue
        target = stmt.targets[0]
        if not isinstance(target, ast.Name):
            continue
        name = target.id
        value = stmt.value

        if isinstance(value, ast.Lambda):
            if name in ("rho", "E"):
                values[name] = _parse_material_lambda(value)
            continue
        if isinstance(value, ast.Call):
            cname = _call_name(value)
            if cname == "APCont":
                apconts[name] = _parse_apcont(value)
            elif cname in ("heatlinfem_mix", "heatlinfem"):
                kind = "heat"
            elif cname == "mechlinfem":
                kind = "wave"
            # np.linspace / np.zeros are structural; nothing to record.
            continue
        if isinstance(value, ast.List) and name == "g":
            ends = []
            for elt in value.elts:
                if isinstance(elt, ast.Constant) and elt.value is None:
                    ends.append(None)
                else:
                    ends.append(_eval_const(elt))
            if len(ends) != 2:
                raise FemProgramParseError("g must have two entries")
            g = (ends[0], ends[1])
            continue
        if isinstance(value, ast.Dict) and name == "cregions":
            for k, v in zip(value.keys, value.values):
                if not (isinstance(k, ast.Constant) and isinstance(k.value, str)):
                    raise FemProgramParseError("cregions keys must be strings")
                if isinstance(v, ast.Name) and v.id in apconts:
                    regions[k.value] = apconts[v.id]
                elif isinstance(v, ast.Call) and _call_name(v) == "APCont":
                    regions[k.value] = _parse_apcont(v)
                else:
                    raise FemProgramParseError("cregions values must be APConts")
            continue
        if isinstance(value, ast.Constant) and isinstance(value.value, str):
            if name == "cspec":
                cspec = value.value
            continue
        # plain numeric assignment (N, L, dt, T, ...)
        try:
            values[name] = _eval_const(value)
        except Exception:
            continue

    missing = [k for k in ("N", "L", "dt", "T", "rho", "E") if k not in values]
    if kind is None:
        raise FemProgramParseError("could not determine heat vs wave system")
    if missing:
        raise FemProgramParseError(f"missing assignments: {missing}")
    if cspec is None:
        raise FemProgramParseError("missing cspec")
    if not regions:
        raise FemProgramParseError("missing cregions")
    if g is None:
        g = (0.0, None)

    prog = FemProgram(
        kind=kind,
        n_elements=int(values["N"]),
        length=float(values["L"]),
        rho=values["rho"],
        elastic=values["E"],
        g0=g[0],
        g1=g[1],
        dt=float(values["dt"]),
        t_final=float(values["T"]),
        regions=dict(regions),
        cspec=cspec,
    )
    # Validate the spec parses against the region table.
    _ = prog.formula
    return prog


def format_fem_program(prog: FemProgram) -> str:
    """Serialize a `FemProgram` back to coder-dialect source (for datagen)."""

    def mat(p: Piecewise) -> str:
        if p.outside == p.inside:
            return f"lambda x: {p.outside!r}"
        return f"lambda x: {p.outside!r} if x < {p.lo!r} or x > {p.hi!r} else {p.inside!r}"

    def g_str(v: Optional[float]) -> str:
        return "None" if v is None else repr(v)

    if prog.kind == "heat":
        imports = "from femformal.core.fem import heatlinfem as heatlinfem"
        sys_line = "fosys = heatlinfem.heatlinfem_mix(xpart, rho, E, g, f_nodal, dt)"
    else:
        imports = "from femformal.core.fem import mechlinfem as mechlinfem"
        sys_line = "sosys = mechlinfem.mechlinfem(xpart, rho, E, g, f_nodal, dt)"

    apc_lines = []
    region_items = []
    for i, (name, r) in enumerate(prog.regions.items()):
        apc_lines.append(
            f'apc{i} = logic.APCont([{r.x0:.10g}, {r.x1:.10g}], "{r.cmp}", '
            f"lambda x: {r.m!r} * x + {r.b!r}, lambda x: {r.m!r})"
        )
        region_items.append(f'"{name}" : apc{i}')

    return "\n".join(
        [
            "",
            imports,
            "",
            f"N = {prog.n_elements}",
            f"L = {prog.length:.10g}",
            f"rho = {mat(prog.rho)}",
            f"E = {mat(prog.elastic)}",
            "xpart = np.linspace(0, L, N + 1)",
            f"g = [{g_str(prog.g0)}, {g_str(prog.g1)}]",
            "f_nodal = np.zeros(N + 1)",
            f"dt = {prog.dt:.10g}",
            "",
            f"T = {prog.t_final:.10g}",
            sys_line,
            "",
            *apc_lines,
            "cregions = {" + ", ".join(region_items) + "}",
            f'cspec = "{prog.cspec}"',
        ]
    )


def program_from_formula(
    kind: str,
    n_elements: int,
    length: float,
    rho: Piecewise,
    elastic: Piecewise,
    g0: Optional[float],
    dt: float,
    t_final: float,
    formula: Formula,
) -> FemProgram:
    """Build a `FemProgram` from a typed formula (datagen helper)."""
    cspec, regions = format_cspec(formula)
    return FemProgram(
        kind=kind,
        n_elements=n_elements,
        length=length,
        rho=rho,
        elastic=elastic,
        g0=g0,
        g1=None,
        dt=dt,
        t_final=t_final,
        regions=regions,
        cspec=cspec,
    )
