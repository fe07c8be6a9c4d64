"""End-to-end program scoring: coder-dialect source -> synthesis -> rho."""

import jax

from pdec.control.synthesis import SynthesisConfig
from pdec.eval.robustness import eval_robustness_batch, eval_robustness_program

from tests.test_stl_parse import HEAT_PROGRAM

FAST = SynthesisConfig(n_iters=20, n_starts=2)


def test_program_scoring_end_to_end():
    rho, runtime = eval_robustness_program(
        HEAT_PROGRAM, key=jax.random.PRNGKey(0), config=FAST
    )
    assert isinstance(rho, float)
    # The example-bank spec asks the far end of the rod to heat >5 K within
    # ~3 s through 100 mm of material — infeasible, so robustness is
    # negative (the corpus itself reports negative-robustness rates,
    # reference ``simulate_gt.py:133-160``).  Synthesis must still beat the
    # uncontrolled rod and stay in a sane range.
    assert -50 < rho < 50
    from pdec.control.synthesis import evaluate_controls
    from pdec.physics.problem import problem_from_program, trajectory_times
    from pdec.stl.ast import compile_spec
    from pdec.stl.program import parse_fem_program
    import jax.numpy as jnp

    prog = parse_fem_program(HEAT_PROGRAM)
    sys_ = problem_from_program(prog, max_steps=192)
    spec = compile_spec(prog.formula)
    zero = evaluate_controls(
        sys_, jnp.zeros((192 // 16,)), jnp.asarray(spec.clauses),
        jnp.asarray(spec.program), 192,
    )
    assert rho >= float(zero) - 1e-3
    assert isinstance(runtime, float) and runtime > 0


def test_failed_program_sentinel():
    out = eval_robustness_batch(["import os; os.system('x')", "not python ("])
    assert out == [("failed", "failed")] * 2


def test_mixed_batch():
    out = eval_robustness_batch(
        [HEAT_PROGRAM, "garbage", HEAT_PROGRAM],
        key=jax.random.PRNGKey(1),
        config=FAST,
    )
    assert out[1] == ("failed", "failed")
    assert isinstance(out[0][0], float) and isinstance(out[2][0], float)
    # same program, different per-item restart keys -> scores agree within
    # multi-start optimization noise
    assert abs(out[0][0] - out[2][0]) < 0.5
