"""Data pipeline: synthetic problem generation, NL rendering/parsing,
prompt construction, tokenization, packing, mixture balancing.

Covers the reference's L4 layer (``train/scripts/tokenize_data*.py``,
``group_text*.py``, ``train/scripts/utils/loader.py``) plus the corpus
*generator* the reference only alludes to (its 2M synthetic samples are
downloaded from HF, ``README.md:15,34`` — here datagen is a first-class
on-TPU capability: sample problems, render NL/SSTL/python, label with
batched synthesis).
"""

from pdec.data.generator import (
    GeneratorConfig,
    sample_problem,
    render_example,
)
from pdec.data.nl import parse_nl_problem

__all__ = [
    "GeneratorConfig",
    "sample_problem",
    "render_example",
    "parse_nl_problem",
]
