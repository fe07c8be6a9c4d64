"""Scalar metrics: perplexity, edit distance, aggregation helpers.

Matches the reference formulas (``eval_script.py:34-41,105-109,588-592``).
Edit distance prefers the native C++ extension (`pdec.cpp`, replacing the
``editdistance`` wheel the reference pins) and falls back to a pure-python
banded DP.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    from pdec.cpp import editdistance as _native_editdistance
except Exception:  # extension not built
    _native_editdistance = None


def eval_perplexity(logprobs: Optional[Sequence[float]]):
    """exp(-mean(logprobs)); ``"failed"`` when generation produced no logits.

    Same arithmetic as the reference (sum, negate-mean, exp).
    """
    if logprobs is None:
        return "failed"
    logprobs = list(logprobs)
    if not logprobs:
        return "failed"
    entropy = -sum(logprobs) / len(logprobs)
    return math.exp(entropy)


def _python_levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        curr = [i]
        for j, cb in enumerate(b, 1):
            curr.append(min(prev[j] + 1, curr[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = curr
    return prev[-1]


def eval_edit_distance(reference: str, prediction: str) -> int:
    """Levenshtein distance between the GT program and the prediction."""
    if _native_editdistance is not None:
        try:
            return _native_editdistance(reference, prediction)
        except ImportError:
            pass  # native build unavailable; fall through
    return _python_levenshtein(reference, prediction)


def mean_and_std(data: List[float]) -> Tuple[float, float]:
    """Sample mean and ddof-1 std (reference ``mean_and_std``)."""
    return float(np.mean(data)), float(np.std(data, ddof=1))
