"""Synthetic corpus generator: problems -> (nl, sstl, python) triplets.

The reference trains on 2M synthetic samples but only *downloads* them
(``README.md:15,34``); the generator itself is not in the snapshot.  This
module makes datagen a first-class capability: sample heat/wave control
problems with corpus-like parameter distributions (matched to the example
bank, ``utils/few_shot_prompts/examples/*/examples.jsonl``), render the
three aligned views

    nl      natural-language problem statement (paraphrase-templated),
    sstl    ground-truth LaTeX SSTL formula,
    python  coder-dialect femformal program,

and (via `pdec.eval.robustness.eval_robustness_batch`) label utilities with
batched TPU synthesis — replacing the reference's one-Gurobi-call-at-a-time
GT labeling (``simulate_gt.py``).
"""

from __future__ import annotations

import dataclasses
import random
from typing import Dict, List, Optional

from pdec.stl.ast import Clause, Formula
from pdec.stl.parse_latex import format_sstl_latex
from pdec.stl.program import FemProgram, Piecewise, format_fem_program, program_from_formula

HEAT_N = 30
HEAT_DT = 0.05
WAVE_N = 20
WAVE_DT = 0.0025


@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
    kind: str = "heat"  # 'heat' | 'wave'
    n_clauses: int = 1  # corpus nc in {1, 2, 3}
    allow_disjunction: bool = True


@dataclasses.dataclass(frozen=True)
class GeneratedExample:
    program: FemProgram
    formula: Formula
    nl: str
    sstl: str
    python: str
    meta: Dict


def _round(v: float, nd: int) -> float:
    return float(round(v, nd))


def _sample_heat(rng: random.Random):
    length = float(rng.randint(80, 220))
    g0 = float(rng.randint(270, 330))
    lo = _round(rng.uniform(0.02, 0.45) * length, 0)
    hi = _round(rng.uniform(lo / length + 0.1, 0.95) * length, 0)
    e_in = float(rng.randint(300_000, 2_000_000))
    e_out = float(rng.randint(300_000, 2_000_000))
    rho_in = _round(rng.uniform(3e-6, 9e-6), 9)
    rho_out = _round(rng.uniform(3e-6, 9e-6), 9)
    c_in = float(rng.randint(300_000_000, 600_000_000))
    c_out = float(rng.randint(300_000_000, 600_000_000))
    t_final = float(rng.randint(5, 15))
    rho = Piecewise(outside=rho_out * c_out, inside=rho_in * c_in, lo=lo, hi=hi)
    elastic = Piecewise(outside=e_out, inside=e_in, lo=lo, hi=hi)
    mats = dict(
        e_in=e_in, e_out=e_out, rho_in=rho_in, rho_out=rho_out,
        c_in=c_in, c_out=c_out, lo=lo, hi=hi,
    )
    return length, g0, rho, elastic, t_final, mats


def _sample_wave(rng: random.Random):
    length = float(rng.randint(30_000, 110_000))
    g0 = 0.0
    lo = _round(rng.uniform(0.1, 0.45) * length, 0)
    hi = _round(rng.uniform(lo / length + 0.15, 0.9) * length, 0)
    rho_out = _round(rng.uniform(7.4e-6, 8.1e-6), 9)  # steel
    rho_in = _round(rng.uniform(8.2e-6, 8.8e-6), 9)  # brass
    e_out = float(rng.randint(180_000_000, 240_000_000))
    e_in = float(rng.randint(90_000_000, 180_000_000))
    t_final = _round(rng.uniform(0.5, 2.2), 4)
    rho = Piecewise(outside=rho_out, inside=rho_in, lo=lo, hi=hi)
    elastic = Piecewise(outside=e_out, inside=e_in, lo=lo, hi=hi)
    mats = dict(
        e_in=e_in, e_out=e_out, rho_in=rho_in, rho_out=rho_out, lo=lo, hi=hi,
    )
    return length, g0, rho, elastic, t_final, mats


def _sample_clause(rng: random.Random, kind: str, length: float, g0: float,
                   t_final: float) -> Clause:
    t0 = _round(rng.uniform(0.02, 0.55) * t_final, 4)
    t1 = _round(rng.uniform(t0 / t_final + 0.08, 0.97) * t_final, 4)
    x0 = float(int(rng.uniform(0.02, 0.5) * length))
    x1 = float(int(rng.uniform(x0 / length + 0.12, 0.97) * length))
    temporal = rng.choice(["G", "F"])
    cmp = rng.choice([">", "<", "="])
    if kind == "heat":
        m = _round(rng.uniform(-0.6, 0.6), 4)
        b = _round(g0 + rng.uniform(-45.0, 45.0) - m * 0.5 * (x0 + x1), 4)
    else:
        m = _round(rng.uniform(-5e-5, 5e-5), 9)
        b = _round(rng.uniform(-2.2, 2.2) - m * 0.5 * (x0 + x1), 4)
    return Clause.make(temporal, (t0, t1), (x0, x1), m, b, cmp)


def _build_formula(rng: random.Random, clauses: List[Clause],
                   allow_disjunction: bool) -> Formula:
    formula: Formula = clauses[0]
    for c in clauses[1:]:
        op = "or" if (allow_disjunction and rng.random() < 0.2) else "and"
        formula = (op, formula, c)
    return formula


def sample_problem(
    rng: random.Random, config: GeneratorConfig = GeneratorConfig()
) -> GeneratedExample:
    kind = config.kind
    if kind == "heat":
        length, g0, rho, elastic, t_final, mats = _sample_heat(rng)
        n_el, dt = HEAT_N, HEAT_DT
    else:
        length, g0, rho, elastic, t_final, mats = _sample_wave(rng)
        n_el, dt = WAVE_N, WAVE_DT

    clauses = [
        _sample_clause(rng, kind, length, g0, t_final)
        for _ in range(config.n_clauses)
    ]
    formula = _build_formula(rng, clauses, config.allow_disjunction)
    program = program_from_formula(
        kind=kind, n_elements=n_el, length=length, rho=rho, elastic=elastic,
        g0=g0 if kind == "heat" else 0.0, dt=dt, t_final=t_final,
        formula=formula,
    )
    nl = render_nl(rng, program, formula, mats)
    return GeneratedExample(
        program=program,
        formula=formula,
        nl=nl,
        sstl=format_sstl_latex(formula),
        python=format_fem_program(program),
        meta=dict(kind=kind, nc=config.n_clauses, **mats),
    )


def render_example(example: GeneratedExample) -> Dict[str, str]:
    """The jsonl row schema used by the corpus (``simulate_gt.py:99-111``)."""
    return {"nl": example.nl, "sstl": example.sstl, "python": example.python}


def matched_problem(
    rng: random.Random,
    params: Dict,
    n_clauses: int = 1,
    allow_disjunction: bool = True,
) -> GeneratedExample:
    """Sample an example whose PHYSICS is pinned to ``params`` (a
    ``pdec.data.nl.parse_nl_params`` dict) with a freshly-sampled spec.

    This powers query-matched few-shot prompting: the round-4 audit
    (``scripts/audit_two_shot.py``) measured the 57M coder copying the
    few-shot examples' rod length into 53% of heat 2-shot generations
    instead of binding the query's.  Shots that share the query's domain
    parameters make parameter copying harmless by construction — the
    copied value IS the query's value — while the spec (the part the model
    must actually translate) stays distinct per shot."""
    from pdec.data.nl import materials_from_params

    kind = params["kind"]
    length = float(params["length"])
    g0 = float(params.get("g0", 0.0))
    t_final = float(params["t_final"])
    rho, elastic = materials_from_params(params)
    clauses = [
        _sample_clause(rng, kind, length, g0, t_final)
        for _ in range(n_clauses)
    ]
    formula = _build_formula(rng, clauses, allow_disjunction)
    program = program_from_formula(
        kind=kind, n_elements=int(params["n_elements"]), length=length,
        rho=rho, elastic=elastic, g0=g0 if kind == "heat" else 0.0,
        dt=float(params["dt"]), t_final=t_final, formula=formula,
    )
    mats = {k: params[k] for k in
            ("e_in", "e_out", "rho_in", "rho_out", "lo", "hi")}
    if kind == "heat":
        mats.update(c_in=params["c_in"], c_out=params["c_out"])
    nl = render_nl(rng, program, formula, mats)
    return GeneratedExample(
        program=program,
        formula=formula,
        nl=nl,
        sstl=format_sstl_latex(formula),
        python=format_fem_program(program),
        meta=dict(kind=kind, nc=n_clauses, matched=True, **mats),
    )


# ---------------------------------------------------------------------------
# NL rendering: paraphrase-templated, mirroring the corpus style.
# ---------------------------------------------------------------------------

_HEAT_INTROS = [
    (
        "Consider a metallic rod of {L} mm. The temperature at one end of "
        "the rod is fixed at {g0}k, while a heat source is applied to the "
        "other end. The temperature of the rod follows the 1D linear heat "
        "equation."
    ),
    (
        "Consider a metallic rod with a maximum length of {L} mm, where "
        "the temperature at one extremity is held at {g0}k, and the "
        "opposite extremity is exposed to a heat source. The temperature "
        "profile of the rod is described by the 1D linear heat equation."
    ),
    (
        "Imagine a metallic rod of length {L} mm whose left end is kept at "
        "a stable temperature of {g0}k while the other end is subject to a "
        "heat source. The temperature within the rod obeys the 1D linear "
        "heat equation."
    ),
]

_HEAT_MATERIALS = [
    (
        "We assume the rod is made of two different materials: the section "
        "from {lo} to {hi} mm is made of a material with parameters "
        "E_a = {e_in}, rho_a = {rho_in} and c_a = {c_in}, while the "
        "rest of the rod is made of a material with parameters "
        "E_b = {e_out}, rho_b = {rho_out} and c_b = {c_out}."
    ),
    (
        "The rod is presumed to be fabricated from two varieties of "
        "materials: from {lo} to {hi} mm, a material with parameters "
        "E_a = {e_in}, rho_a = {rho_in}, and c_a = {c_in} is utilized, "
        "while the remainder of the rod features a material with parameters "
        "E_b = {e_out}, rho_b = {rho_out}, and c_b = {c_out}."
    ),
]

_HEAT_OUTROS = [
    (
        "Denote the temperature at location x as u(x). Assume that the "
        "discretized time interval is {dt}s and the max time is {T} "
        "seconds. Assume a {N}-element mesh is used."
    ),
    (
        "We define the temperature at position x as u(x). We will consider "
        "a discretized time interval of {dt} seconds and a total time of "
        "{T} seconds, employing a {N}-element mesh."
    ),
]

_WAVE_INTROS = [
    (
        "Consider a rod composed of steel and brass with a length of "
        "L = {L} mm, where the brass section is located between {lo} mm "
        "and {hi} mm. The densities are defined as rho_steel = {rho_out} "
        "and rho_brass = {rho_in}, and the Young's moduli are "
        "E_steel = {e_out} and E_brass = {e_in}. One end is held in "
        "place, and a time-dependent force is applied to the other end. "
        "This setup is focused on a 1D elastic wave propagation challenge. "
        "Let u(x) denote the displacement of the rod."
    ),
    (
        "Let us examine a rod made of steel and brass, measuring L = {L} "
        "mm in length, where the segment between {lo} mm and {hi} mm "
        "consists of brass. The densities are given as "
        "rho_steel = {rho_out} and rho_brass = {rho_in}, with Young's "
        "moduli provided as E_steel = {e_out} and E_brass = {e_in}. One "
        "end of the rod is fixed, while a force that varies with time is "
        "applied to the opposite end. This presents a 1D problem regarding "
        "the propagation of elastic waves. Denote the displacement of the "
        "rod as u(x)."
    ),
]

_WAVE_OUTROS = [
    (
        "We will assume that the time interval is discretized at {dt}s, "
        "with the maximum time of {T} seconds, using a mesh that contains "
        "{N} elements."
    ),
    (
        "Assume the time discretization is {dt} seconds, and that the "
        "maximum time is {T} seconds, with a {N}-element mesh employed "
        "for this analysis."
    ),
]

_G_TEMPLATES = {
    "heat": "for all time between the time interval {t0} and {t1}, the "
            "temperature distribution of the rod should be {rel} the linear "
            "profile mu{i}(x) = {m} * x + {b} between section {x0} and "
            "{x1}",
    "wave": "throughout the interval from {t0} to {t1}, the rod's "
            "displacement should be {rel} the linear profile "
            "mu{i}(x) = {m} * x + {b} across the sections {x0} and "
            "{x1}",
}
_F_TEMPLATES = {
    "heat": "for one point during the time interval {t0} and {t1}, the "
            "temperature distribution of the rod should be {rel} the linear "
            "profile mu{i}(x) = {m} * x + {b} between section {x0} and "
            "{x1}",
    "wave": "at one point within the time interval {t0} and {t1}, the "
            "rod's displacement should be {rel} the linear profile "
            "mu{i}(x) = {m} * x + {b} across the sections {x0} and "
            "{x1}",
}
_REL_WORDS = {">": "greater than", "<": "lower than", "=": "the same as"}


def _g(v):
    """Full-precision number rendering (the NL is a parsing source of
    truth, so values must round-trip exactly)."""
    return f"{v:.10g}"


def _clause_sentence(kind: str, c: Clause, i: int) -> str:
    tmpl = (_F_TEMPLATES if c.temporal_op_str == "F" else _G_TEMPLATES)[kind]
    return tmpl.format(
        t0=_g(c.t0), t1=_g(c.t1), x0=_g(c.x0), x1=_g(c.x1), m=_g(c.m),
        b=_g(c.b), i=i, rel=_REL_WORDS[c.cmp_str],
    )


def _formula_sentences(rng: random.Random, kind: str, formula: Formula) -> str:
    """Linearize the formula left-to-right; conjunctions read as 'Moreover',
    disjunctions as 'Alternatively' (parsing relies on these connectives)."""
    parts: List[str] = []

    def walk(f: Formula):
        if isinstance(f, Clause):
            parts.append(("clause", f))
            return
        op, left, right = f
        walk(left)
        parts.append(("junction", op))
        walk(right)

    walk(formula)
    sentences = []
    idx = 0
    pending = None
    for kind_tag, payload in parts:
        if kind_tag == "junction":
            pending = payload
            continue
        body = _clause_sentence(kind, payload, idx)
        idx += 1
        if not sentences:
            sentences.append(body[0].upper() + body[1:] + ".")
        elif pending == "or":
            sentences.append("Alternatively, " + body + ".")
        else:
            sentences.append(
                rng.choice(["Moreover, ", "In addition, ", "Also, "]) + body + "."
            )
    return " ".join(sentences)


def render_nl(rng: random.Random, program: FemProgram, formula: Formula,
              mats: Dict) -> str:
    fmt = dict(
        L=program.length, g0=program.g0 or 0.0, dt=program.dt,
        T=program.t_final, **mats,
    )
    fmt = {k: _g(v) for k, v in fmt.items()}
    fmt["N"] = program.n_elements
    if program.kind == "heat":
        intro = rng.choice(_HEAT_INTROS).format(**fmt)
        materials = rng.choice(_HEAT_MATERIALS).format(**fmt)
        outro = rng.choice(_HEAT_OUTROS).format(**fmt)
        spec = _formula_sentences(rng, "heat", formula)
        return f"{intro} {spec} {materials} {outro}"
    intro = rng.choice(_WAVE_INTROS).format(**fmt)
    outro = rng.choice(_WAVE_OUTROS).format(**fmt)
    spec = _formula_sentences(rng, "wave", formula)
    return f"{intro} {spec} {outro}"
