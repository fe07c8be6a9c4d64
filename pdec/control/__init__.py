"""STL-constrained control synthesis (the Gurobi MILP replacement).

The reference poses "find the boundary input maximizing STL robustness" as
a Gurobi MILP over the FEM trajectory (reference ``README.md:53``; one CPU
solve per example with a 300 s budget, ``simulate_gt.py:62-69``).  Here the
same problem is solved by gradient ascent on *smooth* robustness:

- the trajectory is an explicit differentiable function of the control
  (`pdec.physics.rollout`),
- smooth robustness (`pdec.stl.semantics.smooth_robustness`) gives exact
  gradients through min/max/forall via temperature-annealed logsumexp,
- disjunctions (the MILP's branching structure) are handled by multi-start:
  a batch of random restarts explores the disjuncts in parallel for ~free
  on TPU, and the best *hard* robustness wins.

One jitted `synthesize` covers every problem in a family; ``vmap`` runs the
whole eval set at once — the basis of the >=10k solves/sec target
(BASELINE.md north star).
"""

from pdec.control.synthesis import (
    SynthesisConfig,
    SynthesisResult,
    synthesize,
    synthesize_batch,
    evaluate_controls,
)
from pdec.control.lanes import synthesize_batch_lanes

__all__ = [
    "SynthesisConfig",
    "SynthesisResult",
    "synthesize",
    "synthesize_batch",
    "synthesize_batch_lanes",
    "evaluate_controls",
]
