"""Metric engine + answer extraction (reference L3 eval core).

Reimplements, with matching accept/reject behavior:

- answer extraction from fenced blocks (reference
  ``data_processing/answer_extraction.py:381-430``),
- perplexity from summed logprobs (reference ``eval_script.py:34-41``),
- Levenshtein edit distance (reference ``eval_script.py:105-109``; C++
  extension with pure-python fallback, replacing the ``editdistance`` wheel),
- the SSTL IoU semantic-similarity engine (reference
  ``eval_script.py:236-585``) — the bitarray time-automata loops become one
  vectorized jitted kernel over the (profile x time) grid,
- robustness evaluation of generated programs (reference
  ``eval_script.py:43-102``) — the conda/Python-2/Gurobi subprocess becomes
  an in-process batched TPU synthesis call.
"""

from pdec.eval.extraction import (
    extract_python_answer,
    extract_sstl_answer,
    extract_python_and_sstl,
)
from pdec.eval.metrics import (
    eval_perplexity,
    eval_edit_distance,
    mean_and_std,
)
from pdec.eval.iou import eval_iou
from pdec.eval.robustness import (
    eval_robustness_program,
    eval_robustness_batch,
)

__all__ = [
    "extract_python_answer",
    "extract_sstl_answer",
    "extract_python_and_sstl",
    "eval_perplexity",
    "eval_edit_distance",
    "eval_iou",
    "eval_robustness_program",
    "eval_robustness_batch",
    "mean_and_std",
]
