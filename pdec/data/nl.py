"""Natural-language problem parser: corpus NL -> typed `FemProgram`.

The reference's robustness oracle "parses the domain parameters back out of
the NL" inside the unshipped Femformal eval scripts (SURVEY.md §0.1) so a
hallucinated program cannot change the physical problem being scored.  This
module provides that capability: keyword/regex extraction of the rod
parameters and the GT spec clauses from the templated-but-paraphrased NL
(tolerant of the phrasings in the example bank,
``utils/few_shot_prompts/examples/*/examples.jsonl``).
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from pdec.stl.ast import Clause, Formula
from pdec.stl.program import FemProgram, Piecewise, program_from_formula

_NUM = r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?"


class NLParseError(ValueError):
    pass


def _search_num(pattern: str, text: str, group: int = 1) -> Optional[float]:
    m = re.search(pattern, text, flags=re.IGNORECASE)
    if not m:
        return None
    return float(m.group(group))


def _kind(text: str) -> str:
    if re.search(r"heat equation", text, re.IGNORECASE):
        return "heat"
    if re.search(r"elastic wave|wave propagation|displacement", text, re.IGNORECASE):
        return "wave"
    raise NLParseError("cannot determine heat vs wave from NL")


def _length(text: str) -> float:
    for pat in (
        rf"L\s*=\s*({_NUM})\s*mm",
        rf"(?:length of|measuring|rod of)\s*({_NUM})\s*mm",
        rf"maximum length of\s*({_NUM})\s*mm",
        rf"rod (?:of|with).{{0,40}}?({_NUM})\s*mm",
    ):
        v = _search_num(pat, text)
        if v is not None:
            return v
    raise NLParseError("cannot parse rod length")


def _boundary_temp(text: str) -> float:
    for pat in (
        rf"(?:fixed|held|kept|maintained|stable|constant)\s*(?:at|temperature of)?\s*(?:a stable temperature of\s*)?({_NUM})\s*k",
        rf"temperature of\s*({_NUM})\s*k",
        rf"({_NUM})\s*k[,.\s]",
    ):
        v = _search_num(pat, text)
        if v is not None:
            return v
    raise NLParseError("cannot parse boundary temperature")


def _material_bounds(text: str) -> Tuple[float, float]:
    for pat in (
        rf"(?:section|segment)?\s*from\s*({_NUM})\s*(?:mm)?\s*to\s*({_NUM})\s*mm",
        rf"between\s*({_NUM})\s*mm\s*and\s*({_NUM})\s*mm",
        rf"from\s*({_NUM})\s*to\s*({_NUM})\s*mm",
    ):
        m = re.search(pat, text, re.IGNORECASE)
        if m:
            return float(m.group(1)), float(m.group(2))
    raise NLParseError("cannot parse material segment bounds")


def _named_value(text: str, name: str) -> float:
    v = _search_num(rf"{name}\s*=\s*({_NUM})", text)
    if v is None:
        raise NLParseError(f"cannot parse {name}")
    return v


def _dt(text: str) -> float:
    for pat in (
        rf"discretized time interval\s*(?:of|is)?\s*(?:set at\s*)?({_NUM})\s*s",
        rf"time discretization is\s*({_NUM})\s*s",
        rf"(?:interval is )?discretized at\s*({_NUM})\s*s",
        rf"time interval (?:of|is)\s*(?:set at\s*)?({_NUM})\s*s",
        rf"time step (?:of|is)\s*({_NUM})\s*s",
    ):
        v = _search_num(pat, text)
        if v is not None:
            return v
    raise NLParseError("cannot parse dt")


def _t_final(text: str) -> float:
    for pat in (
        rf"(?:max(?:imum)? time|total time|maximum duration|total duration)"
        rf"\s*(?:is|of)?\s*({_NUM})\s*s",
        rf"maximum time of\s*({_NUM})",
        rf"time of\s*({_NUM})\s*seconds",
    ):
        v = _search_num(pat, text)
        if v is not None:
            return v
    raise NLParseError("cannot parse total time")


def _n_elements(text: str) -> int:
    for pat in (
        r"(\d+)[-\s]element mesh",
        r"mesh (?:that contains|of|with)\s*(\d+)\s*elements",
        r"(\d+)\s*elements",
    ):
        v = _search_num(pat, text)
        if v is not None:
            return int(v)
    raise NLParseError("cannot parse mesh size")


_PROFILE_RE = re.compile(
    rf"mu\d*\(x\)\s*=\s*({_NUM})\s*\*\s*x\s*\+\s*({_NUM})", re.IGNORECASE
)
_PAIR_RE = re.compile(rf"({_NUM})\s*(?:to|and|until)\s*({_NUM})")

_F_WORDS = re.compile(
    r"one point|point in time|point during|some point|particular moment|"
    r"given time|a moment|at least once|exists",
    re.IGNORECASE,
)
_G_WORDS = re.compile(
    r"for all time|all times|throughout|during the (?:entire|whole)|"
    r"entire duration|whole duration|always|at every|for the duration",
    re.IGNORECASE,
)
_LT_WORDS = re.compile(
    r"lower|less|below|under|smaller|compressed|beneath|not exceed",
    re.IGNORECASE,
)
_GT_WORDS = re.compile(
    r"greater|above|exceed|higher|larger|surpass|over the", re.IGNORECASE
)
_EQ_WORDS = re.compile(
    r"same as|match|equal|correspond|identical|fit the|coincide", re.IGNORECASE
)
_OR_WORDS = re.compile(r"alternatively|otherwise|or else|either", re.IGNORECASE)


def _parse_clauses(text: str) -> Tuple[List[Clause], List[str]]:
    """Extract spec clauses + junction list from the NL."""
    profiles = list(_PROFILE_RE.finditer(text))
    if not profiles:
        raise NLParseError("no spec profiles found in NL")

    clauses: List[Clause] = []
    junctions: List[str] = []
    for i, pm in enumerate(profiles):
        seg_start = profiles[i - 1].end() if i > 0 else 0
        seg_end = profiles[i + 1].start() if i + 1 < len(profiles) else len(text)
        before = text[seg_start : pm.start()]
        after = text[pm.end() : seg_end]

        # temporal window: LAST "<num> to/and <num>" pair before the profile
        # (the segment may begin with the tail of the previous clause's
        # region phrase, whose pair must be skipped)
        pairs = list(_PAIR_RE.finditer(before))
        if not pairs:
            raise NLParseError("no time interval before profile")
        pair = pairs[-1]
        t0, t1 = float(pair.group(1)), float(pair.group(2))

        # spatial region: first pair after the profile
        rpair = _PAIR_RE.search(after)
        if not rpair:
            raise NLParseError("no position interval after profile")
        x0, x1 = float(rpair.group(1)), float(rpair.group(2))

        temporal = "F" if _F_WORDS.search(before) else (
            "G" if _G_WORDS.search(before) else "G"
        )
        if _EQ_WORDS.search(before):
            cmp = "="
        elif _LT_WORDS.search(before):
            cmp = "<"
        elif _GT_WORDS.search(before):
            cmp = ">"
        else:
            cmp = ">"

        m_coef, b_coef = float(pm.group(1)), float(pm.group(2))
        clauses.append(
            Clause.make(temporal, (t0, t1), (x0, x1), m_coef, b_coef, cmp)
        )
        if i > 0:
            junctions.append("or" if _OR_WORDS.search(before) else "and")
    return clauses, junctions


def _fold_formula(clauses: List[Clause], junctions: List[str]) -> Formula:
    formula: Formula = clauses[0]
    for c, op in zip(clauses[1:], junctions):
        formula = (op, formula, c)
    return formula


def parse_nl_params(text: str) -> dict:
    """Extract the physical/domain parameters (no spec) from a corpus NL
    statement: everything needed to rebuild the problem's physics, in the
    generator's ``mats`` vocabulary (``pdec.data.generator``).  Used both
    by `parse_nl_problem` and by query-matched few-shot generation (shot
    examples sharing the QUERY's physics so parameter copying is harmless
    — the round-4 two-shot audit measured the 57M coder copying the
    shots' rod length into 53% of 2-shot generations)."""
    kind = _kind(text)
    params = dict(
        kind=kind,
        length=_length(text),
        dt=_dt(text),
        t_final=_t_final(text),
        n_elements=_n_elements(text),
    )
    lo, hi = _material_bounds(text)
    if kind == "heat":
        params.update(
            g0=_boundary_temp(text),
            e_in=_named_value(text, "E_a"),
            e_out=_named_value(text, "E_b"),
            rho_in=_named_value(text, r"rho_?a"),
            rho_out=_named_value(text, r"rho_?b"),
            c_in=_named_value(text, "c_a"),
            c_out=_named_value(text, "c_b"),
            lo=lo, hi=hi,
        )
    else:
        params.update(
            g0=0.0,
            e_out=_named_value(text, "E_steel"),
            e_in=_named_value(text, "E_brass"),
            rho_out=_named_value(text, r"rho_?steel"),
            rho_in=_named_value(text, r"rho_?brass"),
            lo=lo, hi=hi,
        )
    return params


def materials_from_params(params: dict) -> Tuple[Piecewise, Piecewise]:
    """-> (rho, elastic) Piecewise fields from a `parse_nl_params` dict."""
    lo, hi = params["lo"], params["hi"]
    if params["kind"] == "heat":
        rho = Piecewise(
            outside=params["rho_out"] * params["c_out"],
            inside=params["rho_in"] * params["c_in"], lo=lo, hi=hi)
    else:
        rho = Piecewise(
            outside=params["rho_out"], inside=params["rho_in"], lo=lo, hi=hi)
    elastic = Piecewise(
        outside=params["e_out"], inside=params["e_in"], lo=lo, hi=hi)
    return rho, elastic


def parse_nl_problem(text: str) -> FemProgram:
    """Parse a corpus NL statement into the ground-truth `FemProgram`."""
    params = parse_nl_params(text)
    kind = params["kind"]
    length = params["length"]
    dt = params["dt"]
    t_final = params["t_final"]
    n_el = params["n_elements"]
    g0 = params["g0"]
    rho, elastic = materials_from_params(params)

    clauses, junctions = _parse_clauses(text)
    formula = _fold_formula(clauses, junctions)
    return program_from_formula(
        kind=kind, n_elements=n_el, length=length, rho=rho, elastic=elastic,
        g0=g0 if kind == "heat" else 0.0, dt=dt, t_final=t_final,
        formula=formula,
    )
