"""Query-matched few-shot prompting: shots share the QUERY's physics so
parameter copying is harmless by construction (the round-4 audit measured
the 57M coder copying the shots' rod length into 53% of heat 2-shot
generations, scripts/audit_two_shot.py / docs/ROUND4.md §7)."""

import random

from pdec.data.generator import (
    GeneratorConfig,
    matched_problem,
    sample_problem,
)
from pdec.data.nl import parse_nl_params, parse_nl_problem
from pdec.data.prompts import FewShotBank
from pdec.stl.ast import formula_clauses


def test_matched_problem_pins_physics():
    for kind in ("heat", "wave"):
        q = sample_problem(random.Random(5), GeneratorConfig(kind=kind,
                                                             n_clauses=2))
        params = parse_nl_params(q.nl)
        shot = matched_problem(random.Random(9), params, n_clauses=2)
        # physics identical (parse the SHOT's NL back out: the full
        # round-trip the coder relies on)
        sp = parse_nl_params(shot.nl)
        assert sp == params
        # the spec is freshly sampled, not the query's
        assert shot.sstl != q.sstl
        # and the shot's program carries the query's domain
        assert shot.program.length == q.program.length
        assert shot.program.t_final == q.program.t_final
        assert shot.program.n_elements == q.program.n_elements


def test_matched_bank_prefix_uses_query_params():
    q = sample_problem(random.Random(3), GeneratorConfig(kind="heat",
                                                         n_clauses=1))
    bank = FewShotBank("nl_to_python", num_shots=2, dataset="heat",
                       matched=True)
    prompt = bank.format_prompt(nl=q.nl)
    # the query appears once; its rod length appears in every shot too
    # (3 = 2 shots + the query block)
    L = f"{q.program.length:.10g} mm"
    assert prompt.count(L) >= 3
    # deterministic per query
    assert prompt == bank.format_prompt(nl=q.nl)
    # distinct queries get distinct shots
    q2 = sample_problem(random.Random(4), GeneratorConfig(kind="heat",
                                                          n_clauses=1))
    assert bank.format_prompt(nl=q2.nl) != prompt


def test_matched_bank_falls_back_on_unparseable_query():
    static = FewShotBank("nl_to_python", num_shots=2, dataset="heat")
    matched = FewShotBank("nl_to_python", num_shots=2, dataset="heat",
                          matched=True)
    nl = "not a corpus problem statement"
    assert matched.format_prompt(nl=nl) == static.format_prompt(nl=nl)


def test_matched_shots_match_query_clause_count():
    q = sample_problem(random.Random(8), GeneratorConfig(kind="wave",
                                                         n_clauses=3))
    bank = FewShotBank("nl_to_sstl", num_shots=1, dataset="wave",
                       matched=True)
    prompt = bank.format_prompt(nl=q.nl)
    # extract the shot block (everything before the query's instruction)
    shot_block = prompt[: prompt.rfind("### Instruction:")]
    # the shot's sstl formula has the query's clause count
    import re

    m = re.search(r"```latex\n(.*?)\n```", shot_block, re.DOTALL)
    assert m is not None
    from pdec.stl.parse_latex import parse_sstl_latex

    assert len(formula_clauses(parse_sstl_latex(m.group(1)))) == len(
        formula_clauses(parse_nl_problem(q.nl).formula))
