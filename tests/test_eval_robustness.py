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


def test_deterministic_keys_batch_invariant():
    """Content-derived salts make the oracle batch-invariant: the same
    program scores IDENTICALLY regardless of batch composition/position —
    the determinism the reference gets from Gurobi and that the protocol's
    ``robustness accuracy`` (rel_tol=1e-3 vs the GT label) presumes."""
    import dataclasses

    from pdec.stl.program import parse_fem_program
    from pdec.eval.robustness import program_salt

    alone = eval_robustness_batch(
        [HEAT_PROGRAM], key=jax.random.PRNGKey(0), config=FAST,
        deterministic_keys=True,
    )[0][0]
    # shifted position, mixed with a failure and duplicates
    crowd = eval_robustness_batch(
        ["garbage", HEAT_PROGRAM, HEAT_PROGRAM, "garbage", HEAT_PROGRAM],
        key=jax.random.PRNGKey(0), config=FAST, deterministic_keys=True,
    )
    for i in (1, 2, 4):
        assert crowd[i][0] == alone
    # exact reproduction across calls (labeling -> rescoring)
    again = eval_robustness_batch(
        [HEAT_PROGRAM], key=jax.random.PRNGKey(0), config=FAST,
        deterministic_keys=True,
    )[0][0]
    assert again == alone
    # the salt is content-derived: formatting noise doesn't change it,
    # a physics change does
    prog = parse_fem_program(HEAT_PROGRAM)
    assert program_salt(prog) == program_salt(
        parse_fem_program(HEAT_PROGRAM + "\n# comment\n"))
    assert program_salt(prog) != program_salt(
        dataclasses.replace(prog, length=prog.length * 1.1))


def test_family_bucket_padding_is_masked():
    """Horizon quantization (FAMILY_BUCKET) must not change hard robustness.

    The same fixed control evaluated at the program's exact (chunk-rounded)
    horizon and at the padded family bucket must agree exactly: padded steps
    are excluded from every robustness window via `trajectory_times`.
    """
    import jax.numpy as jnp

    from pdec.control.synthesis import FAMILY_BUCKET, evaluate_controls
    from pdec.physics.problem import problem_from_program
    from pdec.stl.ast import compile_spec
    from pdec.stl.program import parse_fem_program

    prog = parse_fem_program(HEAT_PROGRAM)
    spec = compile_spec(prog.formula)
    cl, pr = jnp.asarray(spec.clauses), jnp.asarray(spec.program)
    n_steps = int(round(prog.t_final / prog.dt))
    exact = ((n_steps + 15) // 16) * 16
    fam = FAMILY_BUCKET["heat"]
    assert exact < fam, "test needs a horizon shorter than the bucket"

    knots = jnp.linspace(-0.5, 0.5, exact // 16)
    sys_exact = problem_from_program(prog, max_steps=exact)
    rho_exact = evaluate_controls(sys_exact, knots, cl, pr, exact)

    sys_fam = problem_from_program(prog, max_steps=fam)
    knots_fam = jnp.concatenate(
        [knots, jnp.zeros((fam - exact) // 16)])
    rho_fam = evaluate_controls(sys_fam, knots_fam, cl, pr, fam)

    assert abs(float(rho_exact) - float(rho_fam)) < 1e-5


def test_warm_start_never_worse_than_seed():
    """synthesize(init_knots=w): anytime incumbent guarantees the result is
    at least the warm-start control's own hard robustness on this spec."""
    import jax.numpy as jnp

    from pdec.control.synthesis import evaluate_controls, synthesize
    from pdec.physics.problem import problem_from_program
    from pdec.stl.ast import compile_spec
    from pdec.stl.program import parse_fem_program

    prog = parse_fem_program(HEAT_PROGRAM)
    sys_ = problem_from_program(prog, max_steps=192)
    spec = compile_spec(prog.formula)
    cl, pr = jnp.asarray(spec.clauses), jnp.asarray(spec.program)
    warm = jnp.linspace(-1.0, 1.0, 192 // 16)
    rho_warm = evaluate_controls(
        sys_, sys_.u_scale * jnp.tanh(warm), cl, pr, 192
    )
    res = synthesize(
        sys_, cl, pr, jax.random.PRNGKey(3), 192, FAST, init_knots=warm
    )
    assert float(res.robustness) >= float(rho_warm) - 1e-5


def test_chained_never_worse_than_plain_rescore():
    """chain=True >= plain synthesize-on-intermediate-score-on-GT: phase B's
    portfolio contains the phase-A optimum, whose *initial* incumbent IS the
    plain rescore value."""
    import dataclasses

    from pdec.stl.ast import Clause
    from pdec.stl.program import parse_fem_program

    def shift(f, d):
        if isinstance(f, Clause):
            return dataclasses.replace(f, b=f.b + d)
        op, l, r = f
        return (op, shift(l, d), shift(r, d))

    # GT differs from the program's own spec -> a genuine intermediate
    gt = shift(parse_fem_program(HEAT_PROGRAM).formula, 2.0)
    plain = eval_robustness_batch(
        [HEAT_PROGRAM], key=jax.random.PRNGKey(5), config=FAST,
        gt_formulas=[gt],
    )
    chained = eval_robustness_batch(
        [HEAT_PROGRAM], key=jax.random.PRNGKey(5), config=FAST,
        gt_formulas=[gt], chain=True,
    )
    assert isinstance(chained[0][0], float)
    assert chained[0][0] >= plain[0][0] - 1e-4


def test_pathological_size_guard():
    """Model-generated programs demanding monster grids must fail cleanly
    instead of compiling multi-GB synthesis executables (a garbled wave
    batch requested 25.35G of the chip's 15.75G HBM at compile time).
    The reference's analog is its per-problem wall-clock timeout."""
    huge_t = HEAT_PROGRAM.replace("T = 8", "T = 8000")     # 160k steps
    huge_n = HEAT_PROGRAM.replace("N = 30", "N = 300")     # 10x spatial
    out = eval_robustness_batch(
        [huge_t, huge_n], key=jax.random.PRNGKey(0), config=FAST
    )
    assert out == [("failed", "failed")] * 2
