"""Prompt construction: the checkpoint-compatible prompt contract.

The instruction texts and the Alpaca template below are the *model
contract* of the published PDE-Controller checkpoints — training data and
eval prompts must reproduce them byte-for-byte (reference
``utils/few_shot_prompts/few_shot_prompting.py:12-66``; SURVEY.md §7.2
step 3).  The surrounding machinery (few-shot banks, shot selection, stop
words) reimplements the behavior of the FewShotTest/Train/DPO/CoT
subclasses (``utils/few_shot_prompts/*.py``).

Format keys (same vocabulary as the reference):
  nl_to_python, nl_to_sstl, train_nl_and_sstl_to_python,
  test_nl_to_python_with_sstl_cot, test_nl_with_given_sstl_to_python,
  train_nl_with_given_sstl_to_python, dpo_train_nl_to_sstl,
  dpo_test_sstl_to_python
"""

from __future__ import annotations

import json
import os
import random
from typing import List, Optional, Sequence

MAX_SHOTS = 3

STOP_WORDS = ["\n### Instruction:", "### Instruction:"]

# --- contract strings (verbatim; reference few_shot_prompting.py:43-66) ---
INSTRUCTIONS = {
    "nl_to_python": (
        "Below is a natural language description of partial differential "
        "equation optimization problem. Translate the problem into Python "
        "code following spatial-signal temporal logic."
    ),
    "nl_to_sstl": (
        "Below is a natural language description of partial differential "
        "equation optimization problem. Translate the problem into Latex "
        "code following spatial-signal temporal logic."
    ),
    "train_nl_and_sstl_to_python": (
        "Below is a natural language description of partial differential "
        "equation optimization problem, paired with a spatial-signal "
        "temporal logic description of the same problem. Translate the "
        "problem into Python code following spatial-signal temporal logic."
    ),
    "test_nl_to_python_with_sstl_cot": (
        "Below is a natural language description of partial differential "
        "equation optimization problem. Translate the problem into Python "
        "code following spatial-signal temporal logic. Explain your "
        "reasoning by first providing spatial signal temporal logic "
        "statement in Latex. Let's think step by step."
    ),
    "test_nl_with_given_sstl_to_python": (
        "Below is a natural language description of partial differential "
        "equation optimization problem, paired with your spatial-signal "
        "temporal logic description of the same problem provided earlier. "
        "Note that there may be mistakes in the spatial-signal temporal "
        "logic statement but the natural language description is accurate. "
        "Translate the problem into Python code following spatial-signal "
        "temporal logic."
    ),
    "dpo_train_nl_to_sstl": (
        "Below is a natural language description of partial differential "
        "equation optimization problem. Instead of optimizing the provided "
        "problem directly, we want to optimize an intermediate problem to "
        "produce a state that will better serve to achieve the final "
        "conditions outlined in the natural language problem. Generate a "
        "spatial-signal temporal logic description in Latex code for such "
        "an intermediate problem."
    ),
    "dpo_test_sstl_to_python": (
        "Below is a natural language description of partial differential "
        "equation optimization problem, paired with your spatial-signal "
        "temporal logic description of an intermediate problem provided "
        "earlier. Instead of optimizing the natural language problem "
        "directly, we want to optimize the intermediate problem to produce "
        "a state that will better serve to achieve the final conditions "
        "outlined in the natural language problem. Your spatial-signal "
        "temporal logic description in latex paired to the original problem "
        "describes this intermediate problem. Translate the intermediate "
        "problem into Python code following spatial-signal temporal logic."
    ),
}
INSTRUCTIONS["train_nl_with_given_sstl_to_python"] = INSTRUCTIONS[
    "test_nl_with_given_sstl_to_python"
]


def alpaca(instruction: str, task_input: str, task_output: str = "",
           code_block: Optional[str] = None) -> str:
    """The Alpaca template (reference ``get_alpaca_format``,
    ``few_shot_prompting.py:12-27``): with a code_block, the response opens
    a fence; few-shot examples (non-empty output) also close it."""
    if code_block in ("python", "latex"):
        prompt = (
            f"### Instruction:\n{instruction}\n\n### Input:\n{task_input}"
            f"\n\n### Response:\n```{code_block}\n{task_output}"
        )
        if task_output != "":
            prompt += "\n```\n\n"
        return prompt
    if task_output != "":
        return (
            f"### Instruction:\n{instruction}\n\n### Input:\n{task_input}"
            f"\n\n### Response:\n{task_output}\n\n"
        )
    return (
        f"### Instruction:\n{instruction}\n\n### Input:\n{task_input}"
        f"\n\n### Response:\n"
    )


def _with_sstl_input(nl: str, sstl: str) -> str:
    return f"{nl}\n\nSpatial Signal Temporal Logic:\n```latex\n{sstl}\n```"


def format_train_prompt(format: str, nl: str, sstl: str = "",
                        python: str = "") -> str:
    """Training-side prompts (reference FewShotTrain/FewShotDPO
    ``format_prompt``)."""
    nl, sstl, python = nl.strip(), sstl.strip(), python.strip()
    instruction = INSTRUCTIONS[format]
    if format == "nl_to_python":
        return alpaca(instruction, nl, python, "python")
    if format in ("nl_to_sstl", "dpo_train_nl_to_sstl"):
        return alpaca(instruction, nl, sstl, "latex")
    if format in (
        "train_nl_and_sstl_to_python",
        "train_nl_with_given_sstl_to_python",
        "dpo_test_sstl_to_python",
    ):
        return alpaca(instruction, _with_sstl_input(nl, sstl), python, "python")
    raise ValueError(f"unknown train format {format!r}")


def format_test_prompt(format: str, nl: str, sstl: str = "",
                       python: str = "") -> str:
    """Test-side prompts (reference FewShotTest ``format_prompt``,
    ``few_shot_test.py:7-38``)."""
    nl, sstl, python = nl.strip(), sstl.strip(), python.strip()
    instruction = INSTRUCTIONS[format]
    if format == "nl_to_python":
        return alpaca(instruction, nl, python, "python")
    if format == "test_nl_to_python_with_sstl_cot":
        if sstl != "" and python != "":
            out = (
                f"Spatial Signal Temporal Logic:\n```latex\n{sstl}\n```\n\n"
                f"Python:\n```python\n{python}\n```"
            )
        else:
            out = ""
        return alpaca(instruction, nl, out)
    if format == "nl_to_sstl":
        out = f"Spatial Signal Temporal Logic:\n```latex\n{sstl}"
        if sstl != "":
            out += "\n```"
        return alpaca(instruction, nl, out)
    if format == "test_nl_with_given_sstl_to_python":
        return alpaca(instruction, _with_sstl_input(nl, sstl), python, "python")
    if format == "dpo_test_sstl_to_python":
        return alpaca(instruction, _with_sstl_input(nl, sstl), python, "python")
    if format == "dpo_train_nl_to_sstl":
        # the controller is prompted with its training format at test time
        # (reference FewShotDPO.format_prompt, few_shot_train_dpo.py:31-33)
        return alpaca(instruction, nl, sstl, "latex")
    raise ValueError(f"unknown test format {format!r}")


class FewShotBank:
    """Few-shot example bank (reference CoTOneD* / FewShotTrain loaders).

    ``dataset``: 'heat' | 'wave' | 'combined' (optionally DPO_-prefixed);
    resolved against ``bank_dir`` which defaults to the in-repo bank.
    """

    def __init__(
        self,
        format: str,
        num_shots: int,
        dataset: str = "combined",
        bank_dir: Optional[str] = None,
        shuffle: bool = False,
        seed: Optional[int] = None,
        test_side: bool = True,
        matched: bool = False,
    ):
        if num_shots > MAX_SHOTS:
            raise ValueError("Only supports 0 up to 3 shots.")
        self.format = format
        self.num_shots = num_shots
        self.shuffle = shuffle
        # matched: generate shots ON THE FLY whose physics parameters are
        # parsed from the query NL (pdec.data.generator.matched_problem) —
        # the spec differs per shot, the domain constants are the query's
        # own, so shot-parameter copying (the measured round-4 2-shot
        # failure mode) is harmless by construction.  Falls back to the
        # static bank for queries whose NL does not parse.
        self.matched = matched
        self.seed = 0 if seed is None else seed
        self.rng = random.Random(seed)
        if bank_dir is None:
            bank_dir = os.path.join(os.path.dirname(__file__), "examples")
        path = os.path.join(bank_dir, dataset, "examples.jsonl")
        fmt = format_test_prompt if test_side else format_train_prompt
        self._fmt = fmt
        self.examples: List[str] = []
        if num_shots > 0:
            with open(path) as f:
                for line in f:
                    if not line.strip():
                        continue
                    row = json.loads(line)
                    self.examples.append(
                        fmt(
                            format,
                            nl=row["nl"].strip(),
                            sstl=row.get("sstl", "").strip(),
                            python=row.get("python", "").strip(),
                        )
                    )

    def few_shot_prefix(self) -> str:
        examples = list(self.examples)
        if self.shuffle:
            self.rng.shuffle(examples)
        return "".join(examples[: self.num_shots])

    def _matched_prefix(self, nl: str) -> Optional[str]:
        """Per-query shot prefix with the QUERY's physics (see __init__);
        None when the query NL does not parse (caller falls back to the
        static bank)."""
        import zlib

        from pdec.data.generator import matched_problem
        from pdec.data.nl import parse_nl_params, parse_nl_problem
        from pdec.stl.ast import formula_clauses

        try:
            params = parse_nl_params(nl)
            nc = len(formula_clauses(parse_nl_problem(nl).formula))
        except Exception:
            return None
        # deterministic per (bank seed, query): repeat samplings and
        # resumed sweeps see identical prompts
        rng = random.Random(f"{self.seed}:{zlib.crc32(nl.encode('utf-8'))}")
        parts = []
        for _ in range(self.num_shots):
            ex = matched_problem(rng, params, n_clauses=min(nc, 3))
            parts.append(
                self._fmt(self.format, nl=ex.nl, sstl=ex.sstl,
                          python=ex.python)
            )
        return "".join(parts)

    def format_prompt(self, nl: str, sstl: str = "", python: str = "") -> str:
        prefix = None
        if self.matched and self.num_shots > 0:
            prefix = self._matched_prefix(nl)
        if prefix is None:
            prefix = self.few_shot_prefix()
        return prefix + self._fmt(self.format, nl, sstl, python)

    @staticmethod
    def stop_words() -> List[str]:
        return list(STOP_WORDS)
