"""TPU-native 1-D FEM physics: heat and wave rod semi-discretizations.

Replaces the external Python-2 Femformal backend (reference reaches it only
through a conda subprocess, ``eval_script.py:43-79``):

- ``heatlinfem.heatlinfem_mix`` -> `pdec.physics.heat` (first-order system)
- ``mechlinfem.mechlinfem``     -> `pdec.physics.wave` (second-order system)

Design: each problem lowers to a *discrete-time LTI system*

    x_{k+1} = A_d x_k + b_d u_k + c_d

whose dense propagator ``A_d`` is precomputed once per problem (a small
tridiagonal solve), so the hot path — rolling out thousands of candidate
controls — is a ``lax.scan`` of batched mat-vecs that XLA maps onto the
MXU/VPU.  Everything is shape-static and batches over problems with
``vmap``/``pjit``.
"""

from pdec.physics.assembly import Tridiag, assemble_tridiag, element_midpoints
from pdec.physics.heat import build_heat_system
from pdec.physics.wave import build_wave_system
from pdec.physics.rollout import rollout_states, rollout_trajectory
from pdec.physics.problem import (
    DiscreteSystem,
    build_system,
    problem_from_program,
    trajectory_times,
)

__all__ = [
    "Tridiag",
    "assemble_tridiag",
    "element_midpoints",
    "build_heat_system",
    "build_wave_system",
    "rollout_states",
    "rollout_trajectory",
    "DiscreteSystem",
    "build_system",
    "problem_from_program",
    "trajectory_times",
]
