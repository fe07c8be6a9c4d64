"""Fenced-block answer extraction from LLM generations.

Behavior-compatible with the reference extractors
(``data_processing/answer_extraction.py:381-430``):

- non-CoT prompts end with an open code fence, so the generation is treated
  as already inside the block (a virtual opening fence is prepended),
- only the FIRST complete block is returned; an unterminated block returns
  what was collected; no block at all returns ``"[invalid]"``,
- for python blocks, a ````` ```latex ````` line does not close the block
  (CoT outputs interleave both).
"""

from __future__ import annotations

from typing import Tuple

INVALID = "[invalid]"


def _extract_fenced(text: str, fence: str, tolerate: Tuple[str, ...]) -> str:
    program = INVALID
    collecting = False
    lines = []
    for line in text.split("\n"):
        if line.startswith(fence):
            lines = []
            program = ""
            collecting = True
        elif line.startswith("```") and collecting and not any(
            line.startswith(t) for t in (fence,) + tolerate
        ):
            return "\n".join(lines).strip()
        elif collecting:
            lines.append(line)
    if collecting:
        return "\n".join(lines).strip()
    return program


def extract_python_answer(generation: str, task: str = "default") -> str:
    """Extract the python program from a generation.

    ``task='cot'`` means the model opened its own fences; otherwise the
    prompt already opened a ```` ```python ```` block.
    """
    if task != "cot":
        generation = "```python\n" + generation
    return _extract_fenced(generation, "```python", tolerate=("```latex",))


def extract_sstl_answer(generation: str, task: str = "default") -> str:
    """Extract the SSTL LaTeX answer from a generation."""
    if task != "cot":
        generation = "```latex\n" + generation
    return _extract_fenced(generation, "```latex", tolerate=())


def extract_python_and_sstl(generation: str) -> Tuple[str, str]:
    """CoT extraction: both the python and the latex block."""
    return (
        extract_python_answer(generation, "cot"),
        extract_sstl_answer(generation, "cot"),
    )
