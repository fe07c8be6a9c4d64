"""Fused (streamed) smooth robustness must match the reference path."""

import jax.numpy as jnp
import pytest

from pdec.control.fused import fused_smooth_robustness, make_clause_tables
from pdec.control.synthesis import _chunk_ops
from pdec.physics.problem import trajectory_times
from pdec.physics.rollout import rollout_trajectory_chunked
from pdec.stl.ast import Clause, compile_spec
from pdec.stl.semantics import smooth_robustness

from tests.test_control import CHUNK, MAX_STEPS, small_heat_system

FORMULAS = [
    Clause.make("G", (1.0, 4.0), (0.3, 0.9), 0.5, 0.2, ">"),
    ("and",
     Clause.make("F", (0.5, 3.0), (0.2, 0.7), 0.0, 1.0, "<"),
     Clause.make("G", (2.0, 4.5), (0.5, 1.0), -0.1, 0.3, "=")),
    ("or",
     Clause.make("G", (1.0, 4.0), (0.3, 0.9), 0.0, 1.2, ">"),
     Clause.make("G", (1.0, 4.0), (0.3, 0.9), 0.0, -1.2, "<")),
]


@pytest.mark.parametrize("fidx", range(len(FORMULAS)))
@pytest.mark.parametrize("tau", [0.5, 0.05])
def test_fused_matches_reference(fidx, tau):
    sys_ = small_heat_system()
    spec = compile_spec(FORMULAS[fidx])
    cl, pr = jnp.asarray(spec.clauses), jnp.asarray(spec.program)
    ops = _chunk_ops(sys_, CHUNK)
    controls = jnp.sin(jnp.arange(MAX_STEPS // CHUNK) * 0.7) * 2.0
    tables = make_clause_tables(cl, sys_.xs)

    fused = fused_smooth_robustness(
        *ops, sys_.x0, sys_.g0, sys_.n_out, controls, tables, pr,
        sys_.dt, sys_.n_steps, tau,
    )
    traj = rollout_trajectory_chunked(*ops, sys_.x0, controls, sys_.g0, sys_.n_out)
    ts = trajectory_times(sys_.dt, sys_.n_steps, MAX_STEPS)
    ref = smooth_robustness(traj, ts, sys_.xs, cl, pr, tau)
    assert float(fused) == pytest.approx(float(ref), abs=2e-4, rel=1e-3)
