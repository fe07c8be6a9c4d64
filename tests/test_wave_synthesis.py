"""Wave-family end-to-end synthesis (the second PDE family, reference
``mechlinfem``)."""

import jax
import jax.numpy as jnp
import pytest

from pdec.control.synthesis import SynthesisConfig, synthesize
from pdec.physics.problem import problem_from_program, trajectory_times
from pdec.stl.ast import compile_spec
from pdec.stl.program import parse_fem_program

# Small wave problem in the corpus dialect: reachable displacement target.
WAVE_PROGRAM = """
from femformal.core.fem import mechlinfem as mechlinfem

N = 10
L = 1000
rho = lambda x: 8e-06
E = lambda x: 200000
xpart = np.linspace(0, L, N + 1)
g = [0.0, None]
f_nodal = np.zeros(N + 1)
dt = .01

T = 2.5
sosys = mechlinfem.mechlinfem(xpart, rho, E, g, f_nodal, dt)

apc0 = logic.APCont([400, 1000], ">", lambda x: 0.001 * x + 0.5, lambda x: 0.001)
cregions = {"A" : apc0}
cspec = "((F_[1.0, 2.4] (A)))"
"""

FAST = SynthesisConfig(n_iters=25, n_starts=4, eval_stride=2, polish_iters=4)


def test_wave_program_synthesis_end_to_end():
    prog = parse_fem_program(WAVE_PROGRAM)
    assert prog.kind == "wave"
    sys_ = problem_from_program(prog, max_steps=256)
    assert sys_.a_d.shape == (20, 20)  # [u; v] over 10 free nodes
    spec = compile_spec(prog.formula)
    cl, pr = jnp.asarray(spec.clauses), jnp.asarray(spec.program)

    res = synthesize(sys_, cl, pr, jax.random.PRNGKey(0), 256, FAST)
    rho = float(res.robustness)
    assert jnp.isfinite(res.robustness)
    # pushing the tip past 0.5-1.5 mm is within the wave control authority
    assert rho > 0, f"wave reachability failed: rho={rho}"


def test_wave_zero_control_fails_spec():
    from pdec.control.synthesis import evaluate_controls

    prog = parse_fem_program(WAVE_PROGRAM)
    sys_ = problem_from_program(prog, max_steps=256)
    spec = compile_spec(prog.formula)
    rho = evaluate_controls(
        sys_, jnp.zeros((16,)), jnp.asarray(spec.clauses),
        jnp.asarray(spec.program), 256,
    )
    assert float(rho) < 0  # undriven rod stays at rest
