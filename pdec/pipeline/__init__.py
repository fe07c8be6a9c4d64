"""Orchestration: eval driver, GT simulation, sweeps, aggregation,
in-training validation, and the three-role (translator/coder/controller)
pipeline.

Replaces the reference L5/L6 layers — the missing-but-reconstructed
``run_1d_pdecontrol_eval_full.py`` driver (SURVEY.md §0.1), ``simulate_gt.py``,
``read_result.py``, and the bash sweep scripts (``test_pdecontrol.sh``,
``run_testing.sh``) — as importable Python with typed configs.
"""

from pdec.pipeline.evaluate import EvalDriver, EvalResult
from pdec.pipeline.simulate import simulate_ground_truth
from pdec.pipeline.aggregate import aggregate_results, format_markdown_table
from pdec.pipeline.sweep import run_sweep

__all__ = [
    "EvalDriver",
    "EvalResult",
    "simulate_ground_truth",
    "aggregate_results",
    "format_markdown_table",
    "run_sweep",
]
