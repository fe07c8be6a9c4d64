"""Gradient-based STL control synthesis with multi-start and annealing.

Pipeline per problem:

1. parameterize the boundary input as one free value per *chunk* of
   ``chunk`` fine steps (piecewise-constant control, tanh-squashed into the
   problem's authority ``|u| <= u_scale``); the chunk is also the rollout
   blocking unit — `pdec.physics.rollout.precompute_chunk_operators`
   compounds the propagator so each scan step emits a whole chunk of states
   with one MXU-sized GEMM,
2. maximize smooth robustness with Adam while annealing the logsumexp
   temperature (coarse -> sharp),
3. run ``n_starts`` random restarts batched under ``vmap`` (disjunction
   coverage — the role of integer branching in the reference's Gurobi
   MILP), pick the control with the best *hard* robustness.

All loops are ``lax.scan``; the whole synthesis is one jitted function of
fixed-shape arrays, so a full eval dataset runs as a single ``vmap``/pjit
dispatch on TPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from pdec.physics.problem import DiscreteSystem, trajectory_times
from pdec.physics.rollout import (
    precompute_chunk_operators,
    rollout_trajectory_chunked,
)
from pdec.physics.spectral import spectral_tables, spectral_trajectory_strided
from pdec.stl.semantics import robustness, smooth_robustness


# Per-family synthesis dispatch caps (problem lanes per jitted dispatch).
# Lane parallelism is problems x n_starts x per-iteration AD temps; wave's
# second-order state + ~3x longer horizons triple heat's HBM footprint
# (1024 wave problems want 23 GB > the 16 GB chip).  Heat fits 1024 lanes,
# but its 1024-problem executable costs >40 min of XLA compile through the
# device tunnel EVERY time the synthesis graph changes (measured round 3,
# two timed-out benchmark budgets), versus ~2 min at 256 — and the
# throughput gain from 4x wider dispatches is modest (~1.3-2x at best).
# 256 everywhere keeps every robustness-scoring stage (eval sweep, GT
# labeling, DPO datagen, bench) inside a predictable compile budget.
FAMILY_DISPATCH = {"heat": 256, "wave": 256}

# Canonical horizon bucket per family: the generator's max horizon, so every
# same-family batch shares ONE compiled synthesis executable instead of one
# per 64-step horizon bucket (compile time >> the ~1.5x padded-rollout cost
# at datagen/eval scale; persistent-cache hits carry across processes).
FAMILY_BUCKET = {"heat": 320, "wave": 896}


class SynthesisConfig(NamedTuple):
    """Defaults = the measured quality/throughput knee on v5e (see
    benchmarks/quality_tradeoff.py), and — as of the round-3 anytime
    incumbent + 2-phase presolve — the config PINNED by the in-suite 1%
    grid-optimum tolerance (tests/test_optimality.py runs these exact
    defaults; change them and the guarantee re-verifies or fails).  Use
    `SynthesisConfig.high()` for GT labeling / tolerance studies."""

    chunk: int = 16  # fine steps per control knot; must divide max_steps
    n_iters: int = 26
    n_starts: int = 6
    eval_stride: int = 4  # objective time subsampling (hard eval stays exact)
    polish_iters: int = 6  # trailing full-resolution iterations at tau_end
    lr: float = 0.15
    tau_start: float = 0.2  # in units of field_scale
    tau_end: float = 0.01
    init_scale: float = 0.5  # random init spread in tanh-space
    # full-resolution incumbent evaluation every k-th anneal iteration
    # (grouped scan: k pure gradient steps, then one hard eval).  The
    # per-iteration incumbent is ~half the synthesis FLOPs; k=2 keeps the
    # 1% grid-optimum harness green (tests/test_optimality.py) while
    # cutting the anneal phase's hard-eval cost in half.  The polish phase
    # always evaluates every iteration.
    incumbent_every: int = 2
    # time stride of the polish objective (1 = exact grid).  The polish
    # phase exists because the stride-4 anneal objective can miss the
    # binding time step; stride 2 keeps that protection at half the
    # bandwidth (the robustness tensors [T/stride, X, clauses] are the
    # phase's cost), with incumbent selection still exact every iteration.
    polish_stride: int = 2
    # incumbent SELECTION via the time-parallel spectral rollout instead
    # of the sequential direct scan.  The ~20 full-resolution hard evals
    # per start (anneal groups + polish + init) are otherwise each a
    # T-step sequential-scan latency chain — the throughput bound for
    # wave's 896-step horizons.  Spectral trajectories match direct to
    # ~1e-3 relative (pdec/physics/spectral.py), which only perturbs
    # *which* near-tied incumbent wins; the RETURNED robustness is always
    # recomputed exactly (one direct rollout per start, at the end).
    # Pinned by the 1% grid-optimum harness like every other knob.
    incumbent_spectral: bool = True
    # time stride of the incumbent SELECTION metric (spectral path only;
    # 1 = every fine step).  Selection only needs to ORDER candidate
    # controls; the returned robustness is always the exact full-grid
    # direct-rollout value, so a coarser selection grid risks at most a
    # near-tied incumbent choice — second-order in the final quality, and
    # re-pinned by the per-family 1% grid-optimum harness.  Must divide
    # ``chunk``.
    sel_stride: int = 1

    @classmethod
    def high(cls):
        return cls(n_iters=60, n_starts=8, polish_iters=12)

    @classmethod
    def for_family(cls, kind: str,
                   base: "SynthesisConfig | None" = None) -> "SynthesisConfig":
        """Shipped per-family defaults (bench, eval sweep, GT labeling,
        DPO datagen) — pinned by tests/test_optimality.py.  ``base``
        composes: family stride overrides on top of e.g. ``high()``.

        The families' fine time grids differ 20x (wave dt 2.5e-3 s vs heat
        5e-2 s — the wave generator's dt is set by trapezoidal ACCURACY of
        the second-order scheme, not by what STL window evaluation needs),
        so the same stride buys very different sampling densities: wave at
        eval_stride=8 still samples its horizon 3x more densely than heat
        at the default 4.  These strides are the measured
        bandwidth/quality knee per family — the robustness tensors
        [T/stride, X, clauses] are the synthesis hot-loop's HBM-bandwidth
        bound (see docs/PERF.md round-4 section).  Selection strides are
        the measured knee from benchmarks/stride_probe.py: wave sel 8
        (grid still 2.5x finer in absolute time than heat's objective
        grid) costs 0.3% mean robustness for +65% throughput; heat sel 4
        costs <0.2%; both re-pinned at 1% of the grid optimum below."""
        b = base if base is not None else cls()
        if kind == "wave":
            return b._replace(eval_stride=8, sel_stride=8, polish_stride=4)
        return b._replace(sel_stride=4)


class SynthesisResult(NamedTuple):
    robustness: jnp.ndarray  # scalar: best hard robustness
    controls: jnp.ndarray  # [n_chunks] best chunk-level control (post-tanh)
    knots: jnp.ndarray  # [n_chunks] best pre-squash knot values
    start_robustness: jnp.ndarray  # [n_starts] per-start hard robustness


def _chunk_ops(system: DiscreteSystem, chunk: int):
    return precompute_chunk_operators(system.a_d, system.b_d, system.c_d, chunk)


def evaluate_controls(system: DiscreteSystem, chunk_controls, clauses, program,
                      max_steps: int, chunk: int = 16):
    """Hard robustness of a given chunk-level control sequence."""
    ops = _chunk_ops(system, chunk)
    traj = rollout_trajectory_chunked(
        *ops, system.x0, chunk_controls, system.g0, system.n_out
    )
    ts = trajectory_times(system.dt, system.n_steps, max_steps)
    return robustness(traj, ts, system.xs, clauses, program)


def _field_scale(clauses):
    """Per-problem robustness normalization from spec magnitudes.

    Uses the profile intercept/slope magnitudes so heat (hundreds of K) and
    wave (mm) specs anneal over comparable normalized temperatures.
    """
    b_mag = jnp.max(jnp.abs(clauses[:, 6]))
    mx_mag = jnp.max(jnp.abs(clauses[:, 5]) * jnp.maximum(
        jnp.abs(clauses[:, 3]), jnp.abs(clauses[:, 4])))
    return jnp.maximum(0.1 * (b_mag + mx_mag), 1e-3)


def synthesize(
    system: DiscreteSystem,
    clauses,
    program,
    key,
    max_steps: int,
    config: SynthesisConfig = SynthesisConfig(),
    init_knots=None,
) -> SynthesisResult:
    """Synthesize the robustness-maximizing boundary control for one problem.

    ``init_knots``: optional ``[n_chunks]`` pre-squash knot vector injected
    into the start portfolio — in place of one random start when
    ``n_starts > 3`` (compute-matched with an unchained run for
    chained-vs-direct comparisons), or as one extra lane for small
    portfolios that have no random slot to spare (chained synthesis: the
    subgoal optimum warm-starts the true objective — the gradient
    analogue of a Gurobi MIP start).
    The anytime incumbent guarantees the result is never worse than the
    warm start's own hard robustness on THIS spec — exactly when
    ``incumbent_spectral=False``; with the spectral selection metric the
    guarantee holds to the ~1e-3-relative spectral/direct trajectory
    tolerance (a near-tied incumbent can edge out the warm start), while
    the RETURNED robustness is always the exact direct-rollout value."""
    cfg = config
    if max_steps % cfg.chunk != 0:
        raise ValueError(f"max_steps {max_steps} not divisible by chunk {cfg.chunk}")
    n_chunks = max_steps // cfg.chunk

    ts = trajectory_times(system.dt, system.n_steps, max_steps)
    scale = _field_scale(clauses)
    ops = _chunk_ops(system, cfg.chunk)

    taus = scale * jnp.exp(
        jnp.linspace(jnp.log(cfg.tau_start), jnp.log(cfg.tau_end), cfg.n_iters)
    )

    def to_controls(theta):
        return system.u_scale * jnp.tanh(theta)

    # Objective: chunked rollout + smooth robustness on a time-strided view
    # of the trajectory.  Measured on-device, this "wide" formulation (one
    # big parallel reduction over [T/stride, X]) beats both the naive
    # full-resolution objective and a carry-accumulator fused scan
    # (pdec.control.fused) — TPU prefers few large parallel ops over many
    # small sequential ones, including in the backward pass.  The final
    # hard evaluation below is always full-resolution.
    stride = cfg.eval_stride
    ts_strided = ts[::stride]

    use_spectral = system.spectral is not None
    p_stride = max(int(cfg.polish_stride), 1)
    s_stride = max(int(cfg.sel_stride), 1)
    for name, s in (("eval_stride", stride), ("polish_stride", p_stride),
                    ("sel_stride", s_stride)):
        if cfg.chunk % s != 0:
            raise ValueError(f"{name} {s} must divide chunk {cfg.chunk}")

    # Control-independent spectral tables, computed ONCE per problem and
    # closed over by every objective/incumbent evaluation below (the
    # chunk kernel is shared across strides; only the small per-stride
    # offset rows differ) — see pdec.physics.spectral.
    if use_spectral:
        tb_sel = spectral_tables(system.spectral, cfg.chunk, s_stride,
                                 n_chunks)
        tb_obj = spectral_tables(
            system.spectral, cfg.chunk, stride, n_chunks, base=tb_sel)
        tb_pol = spectral_tables(
            system.spectral, cfg.chunk, p_stride, n_chunks, base=tb_sel)
    else:
        tb_sel = tb_obj = tb_pol = None

    def make_objective(s, ts_s, tb):
        def objective(theta, tau):
            if use_spectral:
                # closed-form eigenbasis rollout: parallel in time (see
                # pdec.physics.spectral) — removes the sequential-scan
                # latency bound that dominates the direct path
                traj = spectral_trajectory_strided(
                    system.spectral, to_controls(theta), system.g0,
                    system.n_out, cfg.chunk, s, tables=tb,
                )
            else:
                full = rollout_trajectory_chunked(
                    *ops, system.x0, to_controls(theta), system.g0,
                    system.n_out,
                )
                traj = full[::s]
            return -smooth_robustness(
                traj, ts_s, system.xs, clauses, program, tau
            )
        return objective

    objective = make_objective(stride, ts_strided, tb_obj)
    # Polish phase: a few iterations on a fine time grid at the final
    # temperature — the strided objective can miss the binding time step
    # (measurably so for '=' tracking specs; see tests/test_optimality.py).
    objective_full = make_objective(p_stride, ts[::p_stride], tb_pol)

    # lr decays with the temperature: as tau sharpens, the gradient
    # concentrates on the binding constraint and large steps orbit the
    # optimum instead of settling onto it
    total_iters = cfg.n_iters + cfg.polish_iters
    lr_schedule = optax.cosine_decay_schedule(
        cfg.lr, total_iters, alpha=0.05
    )
    optimizer = optax.adam(lr_schedule)

    def full_rho(theta):
        """Full-resolution hard robustness (forward-only, exact).  The
        strided grid is fine for smooth GRADIENTS but not for selection:
        it can overestimate hard robustness by a large margin when the
        binding constraint sits between strided samples (measured: 1.29
        strided vs 0.75 full on a 2-phase heat spec), so every incumbent
        decision below uses the full grid."""
        traj = rollout_trajectory_chunked(
            *ops, system.x0, to_controls(theta), system.g0, system.n_out
        )
        return robustness(traj, ts, system.xs, clauses, program)

    if cfg.incumbent_spectral and use_spectral:
        # selection metric: full-resolution robustness over the spectral
        # trajectory — parallel in time, so incumbent checks stop being
        # T-step sequential latency chains.  ~1e-3-relative trajectory
        # error only matters for near-ties; the winner is re-scored with
        # full_rho (exact) before anything is returned.
        ts_sel = ts[::s_stride]

        def sel_rho(theta):
            traj = spectral_trajectory_strided(
                system.spectral, to_controls(theta), system.g0,
                system.n_out, cfg.chunk, s_stride, tables=tb_sel,
            )
            return robustness(traj, ts_sel, system.xs, clauses, program)
    else:
        sel_rho = full_rho

    def run_one_start(theta0):
        # Anytime ascent: the annealed smooth objective is NOT monotone in
        # hard robustness (the coarse-tau phase can walk a good incumbent
        # downhill and the decayed lr never recovers it), so every
        # iteration evaluates the full-resolution hard metric and the
        # best-seen theta is what the start returns — a solver never
        # returns worse than its incumbent.
        opt_state = optimizer.init(theta0)

        def opt_step_for(obj):
            def opt_step(carry, tau):
                theta, opt_state, best_theta, best_rho = carry
                grads = jax.grad(obj)(theta, tau)
                updates, opt_state = optimizer.update(grads, opt_state, theta)
                theta = optax.apply_updates(theta, updates)
                rho = sel_rho(theta)
                better = rho > best_rho
                best_theta = jnp.where(better, theta, best_theta)
                best_rho = jnp.maximum(rho, best_rho)
                return (theta, opt_state, best_theta, best_rho), None
            return opt_step

        carry = (theta0, opt_state, theta0, sel_rho(theta0))
        k = max(int(cfg.incumbent_every), 1)
        if k == 1:
            carry, _ = jax.lax.scan(opt_step_for(objective), carry, taus)
        else:
            # grouped anneal: k pure gradient steps per hard-resolution
            # incumbent check.  Padding repeats tau_end (a few extra
            # sharp-temperature gradient steps; never fewer than n_iters).
            n_groups = -(-cfg.n_iters // k)
            padded = jnp.concatenate(
                [taus, jnp.full((n_groups * k - cfg.n_iters,), taus[-1])]
            )

            def grad_step(c, tau):
                theta, opt_state = c
                grads = jax.grad(objective)(theta, tau)
                updates, opt_state = optimizer.update(
                    grads, opt_state, theta
                )
                theta = optax.apply_updates(theta, updates)
                return (theta, opt_state), None

            def group_step(carry, tau_group):
                theta, opt_state, best_theta, best_rho = carry
                (theta, opt_state), _ = jax.lax.scan(
                    grad_step, (theta, opt_state), tau_group
                )
                rho = sel_rho(theta)
                better = rho > best_rho
                best_theta = jnp.where(better, theta, best_theta)
                best_rho = jnp.maximum(rho, best_rho)
                return (theta, opt_state, best_theta, best_rho), None

            carry, _ = jax.lax.scan(
                group_step, carry, padded.reshape(n_groups, k)
            )
        if cfg.polish_iters > 0:
            # polish the INCUMBENT, not wherever the smoothed objective
            # dragged the iterate; fresh optimizer state (the anneal
            # trajectory's momentum points away from the incumbent)
            _, _, best_theta, best_rho = carry
            carry = (best_theta, optimizer.init(best_theta), best_theta,
                     best_rho)
            polish_taus = jnp.full((cfg.polish_iters,), taus[-1])
            carry, _ = jax.lax.scan(
                opt_step_for(objective_full), carry, polish_taus
            )
        _, _, best_theta, best_rho = carry
        if sel_rho is not full_rho:
            # the RETURNED value is always the exact direct-rollout
            # robustness of the selected control (one sequential rollout
            # per start instead of ~20)
            best_rho = full_rho(best_theta)
        return best_rho, to_controls(best_theta), best_theta

    # Start portfolio: zero control; the measured-best constant control;
    # the measured-best TWO-PHASE control (u1 for the first half of the
    # horizon, u2 for the second — a cheap forward-only scan, the 1-D
    # analog of the phase-structure branching Gurobi's MILP explores;
    # heat-then-cool specs have their optimum in this subspace and pure
    # gradient ascent from constant starts reliably misses it); random
    # inits for disjunct coverage.
    grid = jnp.linspace(-2.0, 2.0, 17)
    best_const = grid[jnp.argmax(
        jax.vmap(lambda g: sel_rho(jnp.full((n_chunks,), g)))(grid)
    )]

    half = n_chunks // 2

    def phase_theta(u1, u2):
        return jnp.concatenate(
            [jnp.full((half,), u1), jnp.full((n_chunks - half,), u2)]
        )

    pgrid = jnp.linspace(-2.0, 2.0, 9)
    pair_rhos = jax.vmap(
        lambda u1: jax.vmap(lambda u2: sel_rho(phase_theta(u1, u2)))(pgrid)
    )(pgrid)
    flat = jnp.argmax(pair_rhos)
    best_pair = phase_theta(pgrid[flat // 9], pgrid[flat % 9])

    init = jax.random.normal(key, (cfg.n_starts, n_chunks)) * cfg.init_scale
    init = init.at[0].set(0.0)
    if cfg.n_starts > 1:
        init = init.at[1].set(best_const)
    if cfg.n_starts > 2:
        init = init.at[2].set(best_pair)
    if init_knots is not None:
        if cfg.n_starts > 3:
            # replace one RANDOM start: compute-matched with an unchained
            # run (slots 0-2 are the zero/const/two-phase heuristics)
            init = init.at[3].set(init_knots)
        else:
            # small portfolios have no random slot to spare — grow by one
            # lane rather than evict a heuristic start (evicting best_const
            # or best_pair can make the chained arm WORSE than unchained
            # on specs whose optimum sits in that start's basin)
            init = jnp.concatenate([init, init_knots[None, :]], axis=0)

    hard, controls, thetas = jax.vmap(run_one_start)(init)
    best = jnp.argmax(hard)
    return SynthesisResult(
        robustness=hard[best],
        controls=controls[best],
        knots=thetas[best],
        start_robustness=hard,
    )


def synthesize_batch(
    systems: DiscreteSystem,
    clauses,
    programs,
    key,
    max_steps: int,
    config: SynthesisConfig = SynthesisConfig(),
    init_knots=None,
    lane_salts=None,
) -> SynthesisResult:
    """Batched synthesis: all leaves of ``systems`` carry a leading batch dim
    (same family => same shapes), ``clauses``/``programs`` are stacked specs.
    ``init_knots``: optional ``[batch, n_chunks]`` per-problem warm starts.

    ``lane_salts``: optional int32 ``[batch]``.  Default lane keys come from
    ``jax.random.split`` and therefore depend on the lane's POSITION in the
    batch — the same problem scored in two different batch compositions
    draws different multi-start portfolios, which on multi-basin (wave)
    specs lands in different optima run-to-run.  The reference's oracle has
    no such freedom: Gurobi is deterministic, and the protocol's
    ``robustness accuracy`` metric (rel_tol=1e-3 vs the GT label,
    ``eval_script.py:25-30``) presumes it — measured on the BASE sweep,
    byte-identical wave programs reproduce their own GT label only ~5% of
    the time under position keys.  Passing content-derived salts
    (``pdec.eval.robustness.program_salt``) pins each lane's randomness to
    the PROBLEM, making scoring batch-invariant and reproducible."""
    batch = clauses.shape[0]
    if lane_salts is None:
        keys = jax.random.split(key, batch)
    else:
        keys = jax.vmap(lambda s: jax.random.fold_in(key, s))(lane_salts)

    # n_out is static metadata, so axis 0 maps cleanly over all array leaves.
    if init_knots is None:
        def one(sys_i, cl, pr, k):
            return synthesize(sys_i, cl, pr, k, max_steps, config)

        return jax.vmap(one, in_axes=(0, 0, 0, 0))(
            systems, clauses, programs, keys)

    def one_warm(sys_i, cl, pr, k, w):
        return synthesize(sys_i, cl, pr, k, max_steps, config, init_knots=w)

    return jax.vmap(one_warm, in_axes=(0, 0, 0, 0, 0))(
        systems, clauses, programs, keys, init_knots)
