"""Gradient-based STL control synthesis with multi-start and annealing.

Pipeline per problem:

1. parameterize the boundary input as ``n_knots`` free values, linearly
   interpolated onto the fine time grid and squashed into the problem's
   control authority ``|u| <= u_scale`` by tanh,
2. maximize smooth robustness with Adam while annealing the logsumexp
   temperature (coarse -> sharp),
3. run ``n_starts`` random restarts batched under ``vmap`` (disjunction
   coverage), pick the control with the best *hard* robustness.

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
from pdec.physics.rollout import rollout_trajectory
from pdec.stl.semantics import robustness, smooth_robustness


class SynthesisConfig(NamedTuple):
    n_knots: int = 16
    n_iters: int = 80
    n_starts: int = 8
    lr: float = 0.15
    tau_start: float = 0.2  # in units of field_scale
    tau_end: float = 0.01
    init_scale: float = 0.5  # random init spread in tanh-space


class SynthesisResult(NamedTuple):
    robustness: jnp.ndarray  # scalar: best hard robustness
    controls: jnp.ndarray  # [max_steps] best fine-grid control
    knots: jnp.ndarray  # [n_knots] best pre-squash knot values
    start_robustness: jnp.ndarray  # [n_starts] per-start hard robustness


def knots_to_controls(theta, system: DiscreteSystem, max_steps: int):
    """tanh-squashed knots -> piecewise-linear fine-grid control [max_steps]."""
    n_knots = theta.shape[0]
    horizon = system.n_steps.astype(jnp.float32) * system.dt
    knot_times = jnp.linspace(0.0, 1.0, n_knots) * horizon
    step_times = (jnp.arange(max_steps, dtype=jnp.float32) + 0.5) * system.dt
    u = jnp.interp(step_times, knot_times, theta)
    return system.u_scale * jnp.tanh(u)


def _rollout(system: DiscreteSystem, controls, max_steps: int):
    return rollout_trajectory(
        system.a_d, system.b_d, system.c_d, system.x0, controls,
        system.g0, system.n_out,
    )


def evaluate_controls(system: DiscreteSystem, controls, clauses, program,
                      max_steps: int):
    """Hard robustness of a given fine-grid control sequence."""
    traj = _rollout(system, controls, max_steps)
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
) -> SynthesisResult:
    """Synthesize the robustness-maximizing boundary control for one problem."""
    cfg = config
    ts = trajectory_times(system.dt, system.n_steps, max_steps)
    scale = _field_scale(clauses)

    taus = scale * jnp.exp(
        jnp.linspace(jnp.log(cfg.tau_start), jnp.log(cfg.tau_end), cfg.n_iters)
    )

    def objective(theta, tau):
        controls = knots_to_controls(theta, system, max_steps)
        traj = _rollout(system, controls, max_steps)
        return -smooth_robustness(traj, ts, system.xs, clauses, program, tau)

    optimizer = optax.adam(cfg.lr)

    def run_one_start(theta0):
        opt_state = optimizer.init(theta0)

        def opt_step(carry, tau):
            theta, opt_state = carry
            grads = jax.grad(objective)(theta, tau)
            updates, opt_state = optimizer.update(grads, opt_state, theta)
            theta = optax.apply_updates(theta, updates)
            return (theta, opt_state), None

        (theta, _), _ = jax.lax.scan(opt_step, (theta0, opt_state), taus)
        controls = knots_to_controls(theta, system, max_steps)
        hard = evaluate_controls(system, controls, clauses, program, max_steps)
        return hard, controls, theta

    # start 0 = zero control; the rest random in tanh-space
    init = jax.random.normal(key, (cfg.n_starts, cfg.n_knots)) * cfg.init_scale
    init = init.at[0].set(0.0)

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
) -> SynthesisResult:
    """Batched synthesis: all leaves of ``systems`` carry a leading batch dim
    (same family => same shapes), ``clauses``/``programs`` are stacked specs."""
    batch = clauses.shape[0]
    keys = jax.random.split(key, batch)

    def one(sys_i, cl, pr, k):
        return synthesize(sys_i, cl, pr, k, max_steps, config)

    # n_out is static metadata, so axis 0 maps cleanly over all array leaves.
    return jax.vmap(one, in_axes=(0, 0, 0, 0))(systems, clauses, programs, keys)
