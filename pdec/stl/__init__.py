"""SSTL (spatial signal temporal logic) ASTs, parsers and robustness semantics.

Replaces the reference's STL handling, which was split across three places:

- the Gurobi MILP encoding of STL robustness inside the external Femformal
  backend (reference ``eval_robustness_wrapper.py:5-21``),
- the regex SSTL parser in the IoU metric engine (reference
  ``test/PDEcontrol/evaluation/eval/eval_script.py:283-399``),
- the ``logic.APCont`` + ``cspec`` program dialect emitted by the coder LLM
  (reference ``utils/few_shot_prompts/examples/one_d_heat/examples.jsonl``).

Here all three dialects parse into one typed AST (`Clause`, `Formula`) which
compiles to a fixed-shape array form (`CompiledSpec`) evaluable under
``jit``/``vmap`` with either hard (min/max) or smooth (logsumexp) semantics.
"""

from pdec.stl.ast import (
    CMP_EQ,
    CMP_GE,
    CMP_GT,
    CMP_LE,
    CMP_LT,
    OP_AND,
    OP_OR,
    OP_PUSH,
    TEMP_F,
    TEMP_G,
    TEMP_U,
    TEMP_U_RHS,
    Clause,
    CompiledSpec,
    Formula,
    Until,
    compile_spec,
)
from pdec.stl.semantics import (
    robustness,
    smooth_robustness,
    spatial_profile,
)
from pdec.stl.parse_latex import parse_sstl_latex, format_sstl_latex
from pdec.stl.parse_cspec import parse_cspec
from pdec.stl.program import FemProgram, parse_fem_program

__all__ = [
    "Clause",
    "Until",
    "TEMP_U",
    "TEMP_U_RHS",
    "Formula",
    "CompiledSpec",
    "compile_spec",
    "robustness",
    "smooth_robustness",
    "spatial_profile",
    "parse_sstl_latex",
    "format_sstl_latex",
    "parse_cspec",
    "FemProgram",
    "parse_fem_program",
    "TEMP_G",
    "TEMP_F",
    "CMP_LT",
    "CMP_GT",
    "CMP_LE",
    "CMP_GE",
    "CMP_EQ",
    "OP_PUSH",
    "OP_AND",
    "OP_OR",
]
