"""Lane-major synthesis path: agreement with the reference path on CPU."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdec.control.lanes import synthesize_batch_lanes
from pdec.control.synthesis import SynthesisConfig, synthesize_batch
from pdec.physics.problem import stack_systems
from pdec.stl.ast import Clause, compile_spec, stack_specs

from tests.test_control import CHUNK, MAX_STEPS, small_heat_system

CFG = SynthesisConfig(chunk=CHUNK, n_iters=25, n_starts=3, eval_stride=2,
                      lr=0.2)


def _problem_batch():
    systems = [small_heat_system(), small_heat_system(alpha=0.5)]
    specs = [
        compile_spec(Clause.make("G", (3.0, 5.0), (0.5, 1.0), 0.0, 1.0, ">")),
        compile_spec(Clause.make("F", (1.0, 5.0), (0.4, 1.0), 0.0, -0.5, "<")),
    ]
    cl, pr = stack_specs(specs)
    return stack_systems(systems), jnp.asarray(cl), jnp.asarray(pr)


def test_lanes_matches_reference_path():
    systems, cl, pr = _problem_batch()
    key = jax.random.PRNGKey(0)
    lanes = jax.jit(
        functools.partial(
            synthesize_batch_lanes, max_steps=MAX_STEPS, config=CFG,
            use_kernel=False,  # executable spec on CPU
        )
    )(systems, cl, pr, key)
    ref = jax.jit(
        functools.partial(synthesize_batch, max_steps=MAX_STEPS, config=CFG)
    )(systems, cl, pr, key)
    assert lanes.robustness.shape == (2,)
    # both find feasible controls; values agree within optimization noise
    for i in range(2):
        assert float(lanes.robustness[i]) > 0
        assert float(lanes.robustness[i]) == pytest.approx(
            float(ref.robustness[i]), abs=0.15
        )


def test_lanes_controls_reproduce_reported_robustness():
    from pdec.control.synthesis import evaluate_controls

    systems, cl, pr = _problem_batch()
    res = synthesize_batch_lanes(
        systems, cl, pr, jax.random.PRNGKey(1), MAX_STEPS, CFG,
        use_kernel=False,
    )
    for i in range(2):
        sys_i = jax.tree.map(lambda x: x[i], systems)
        re_rho = evaluate_controls(
            sys_i, res.controls[i], cl[i], pr[i], MAX_STEPS, CHUNK
        )
        assert float(re_rho) == pytest.approx(float(res.robustness[i]), abs=1e-4)
