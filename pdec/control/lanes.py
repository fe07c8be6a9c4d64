"""Lane-major synthesis: the Pallas-kernel-backed batch optimizer.

Differences from `pdec.control.synthesis.synthesize_batch` (same math):

- every (problem, restart) pair becomes one *instance*; instances ride the
  128-wide lane dimension of `pdec.ops.rollout_lanes` so the rollout runs
  on the VPU at full width instead of starving the MXU,
- the optimizer state is one flat [instances, n_chunks] array — a single
  Adam scan, no nested vmaps,
- the smooth objective sees the kernel's strided states (which exclude the
  t=0 sample; corpus clause windows open later, and the final hard
  evaluation — full resolution, t=0 included — picks the winner).

Use on TPU; on CPU the kernel falls back to the executable spec.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from pdec.control.synthesis import (
    SynthesisConfig,
    SynthesisResult,
    _chunk_ops,
    _field_scale,
)
from pdec.ops.rollout_lanes import (
    LANES,
    pack_lanes,
    rollout_lanes,
    rollout_lanes_reference,
    unpack_lanes,
)
from pdec.physics.problem import DiscreteSystem, trajectory_times
from pdec.physics.rollout import rollout_trajectory_chunked
from pdec.stl.semantics import robustness, smooth_robustness


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def synthesize_batch_lanes(
    systems: DiscreteSystem,
    clauses,
    programs,
    key,
    max_steps: int,
    config: SynthesisConfig = SynthesisConfig(),
    use_kernel: bool = True,
) -> SynthesisResult:
    """Batched synthesis over the lane-major rollout kernel.

    Same contract as `synthesize_batch`; systems leaves carry a leading
    batch dim B, returns per-problem results.
    """
    cfg = config
    b = clauses.shape[0]
    n_starts = cfg.n_starts
    inst = b * n_starts
    n_chunks = max_steps // cfg.chunk
    stride = cfg.eval_stride
    t_out = max_steps // stride
    s = systems.a_d.shape[-1]
    s_pad = _round_up(s, 8)
    n_out = systems.n_out

    # --- per-instance constants (repeat problems over starts) -------------
    def rep(x):
        return jnp.repeat(x, n_starts, axis=0)

    a_l = pack_lanes(rep(systems.a_d), s_pad)
    b_l = pack_lanes(rep(systems.b_d), s_pad)
    c_l = pack_lanes(rep(systems.c_d), s_pad)
    x0_l = pack_lanes(rep(systems.x0), s_pad)

    ts_full = jax.vmap(
        lambda dt, ns: trajectory_times(dt, ns, max_steps)
    )(systems.dt, systems.n_steps)
    ts_strided_inst = rep(ts_full[:, stride::stride])  # [inst, T_out]
    xs_inst = rep(systems.xs)
    g0_inst = rep(systems.g0)
    u_scale_inst = rep(systems.u_scale)
    clauses_inst = rep(clauses)
    programs_inst = rep(programs)

    scale = jax.vmap(_field_scale)(clauses)  # [B]
    scale_inst = rep(scale)
    taus = scale_inst[None, :] * jnp.exp(
        jnp.linspace(jnp.log(cfg.tau_start), jnp.log(cfg.tau_end), cfg.n_iters)
    )[:, None]  # [n_iters, inst]

    roll = rollout_lanes if use_kernel else rollout_lanes_reference

    def objective(theta, tau_inst):
        u = u_scale_inst[:, None] * jnp.tanh(theta)  # [inst, n_chunks]
        y = roll(a_l, b_l, c_l, x0_l, pack_lanes(u), cfg.chunk, stride)
        states = unpack_lanes(y, inst)  # [inst, T_out, s_pad]
        fields = jnp.concatenate(
            [
                jnp.broadcast_to(g0_inst[:, None, None], (inst, t_out, 1)),
                states[:, :, :n_out],
            ],
            axis=2,
        )
        rhos = jax.vmap(smooth_robustness)(
            fields, ts_strided_inst, xs_inst, clauses_inst, programs_inst,
            tau_inst,
        )
        return -jnp.sum(rhos)

    optimizer = optax.adam(cfg.lr)

    def opt_step(carry, tau_inst):
        theta, opt_state = carry
        grads = jax.grad(objective)(theta, tau_inst)
        updates, opt_state = optimizer.update(grads, opt_state, theta)
        theta = optax.apply_updates(theta, updates)
        return (theta, opt_state), None

    theta0 = (
        jax.random.normal(key, (b, n_starts, n_chunks)) * cfg.init_scale
    )
    theta0 = theta0.at[:, 0].set(0.0).reshape(inst, n_chunks)

    (theta, _), _ = jax.lax.scan(
        opt_step, (theta0, optimizer.init(theta0)), taus
    )

    # --- exact full-resolution hard evaluation ----------------------------
    from pdec.physics.rollout import precompute_chunk_operators

    controls = u_scale_inst[:, None] * jnp.tanh(theta)  # [inst, n_chunks]
    ops = jax.vmap(
        lambda ad, bd, cd: precompute_chunk_operators(ad, bd, cd, cfg.chunk)
    )(rep(systems.a_d), rep(systems.b_d), rep(systems.c_d))

    def hard_eval(p_stack, qb, qc, x0, u, g0, ts, xs, cl, pr):
        traj = rollout_trajectory_chunked(p_stack, qb, qc, x0, u, g0, n_out)
        return robustness(traj, ts, xs, cl, pr)

    hard = jax.vmap(hard_eval)(
        ops[0], ops[1], ops[2], rep(systems.x0), controls, g0_inst,
        rep(ts_full), xs_inst, clauses_inst, programs_inst,
    )  # [inst]

    hard = hard.reshape(b, n_starts)
    controls = controls.reshape(b, n_starts, n_chunks)
    theta = theta.reshape(b, n_starts, n_chunks)
    best = jnp.argmax(hard, axis=1)
    take = lambda arr: jnp.take_along_axis(
        arr, best[:, None, None], axis=1
    )[:, 0]
    return SynthesisResult(
        robustness=jnp.take_along_axis(hard, best[:, None], axis=1)[:, 0],
        controls=take(controls),
        knots=take(theta),
        start_robustness=hard,
    )
