"""Discrete LTI rollout: the hot loop of the whole physics stack.

``x_{k+1} = A_d x_k + b_d u_k + c_d`` via ``lax.scan``.  Batched over
problems/controls with ``vmap`` the scan body becomes a batched mat-vec,
which XLA fuses and tiles onto the TPU compute units; the per-problem
propagators live in fast memory for the duration of the scan.

Replaces Femformal's per-call scipy time stepping (reference
``eval_robustness_wrapper.py:5-21`` runs one trajectory per subprocess);
here thousands of (problem x control-candidate) rollouts run per device
dispatch — the basis of the >=10k solves/sec north star (BASELINE.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rollout_states(a_d, b_d, c_d, x0, controls):
    """Roll out the discrete system.

    Args:
      a_d: ``[S, S]`` propagator.
      b_d: ``[S]`` control injection.
      c_d: ``[S]`` constant load.
      x0: ``[S]`` initial state.
      controls: ``[T]`` control value per fine step.

    Returns:
      states ``[T+1, S]`` including the initial state.
    """

    def step(x, u):
        # HIGHEST precision: the iterated propagator accumulates rounding
        # error over hundreds of steps, and robustness margins are compared
        # at 1e-2 — default bf16 MXU passes are not acceptable here.
        x_next = (
            jnp.dot(a_d, x, precision=jax.lax.Precision.HIGHEST)
            + b_d * u
            + c_d
        )
        return x_next, x_next

    _, xs = jax.lax.scan(step, x0, controls)
    return jnp.concatenate([x0[None, :], xs], axis=0)


def precompute_chunk_operators(a_d, b_d, c_d, chunk: int):
    """Compound the one-step propagator over ``chunk`` steps.

    With piecewise-constant control per chunk, the state after i fine steps
    inside a chunk is exactly

        x_i = A^i x + (sum_{j<i} A^j)(b u + c) = P_i x + qb_i u + qc_i

    so a whole chunk of fine-grid states is ONE [chunk*S, S] mat-vec against
    the carry — turning the T-step scan of tiny mat-vecs into a T/chunk-step
    scan of MXU-sized GEMMs (the key layout change for TPU throughput).

    Returns (p_stack [chunk, S, S], qb [chunk, S], qc [chunk, S]).
    """

    def step(carry, _):
        p_prev, qb_prev, qc_prev = carry
        p = jnp.dot(a_d, p_prev, precision=jax.lax.Precision.HIGHEST)
        qb = jnp.dot(a_d, qb_prev, precision=jax.lax.Precision.HIGHEST) + b_d
        qc = jnp.dot(a_d, qc_prev, precision=jax.lax.Precision.HIGHEST) + c_d
        return (p, qb, qc), (p, qb, qc)

    s = a_d.shape[0]
    init = (jnp.eye(s, dtype=a_d.dtype), jnp.zeros_like(b_d), jnp.zeros_like(c_d))
    _, (p_stack, qb, qc) = jax.lax.scan(step, init, None, length=chunk)
    return p_stack, qb, qc


def rollout_states_chunked(p_stack, qb, qc, x0, chunk_controls):
    """Roll out with one control value per chunk.

    Args:
      p_stack: ``[chunk, S, S]`` from `precompute_chunk_operators`.
      qb, qc: ``[chunk, S]``.
      x0: ``[S]``.
      chunk_controls: ``[n_chunks]``.

    Returns states ``[n_chunks*chunk + 1, S]`` on the fine grid.
    """
    chunk, s, _ = p_stack.shape
    p_flat = p_stack.reshape(chunk * s, s)

    def step(x, u):
        states = (
            jnp.dot(p_flat, x, precision=jax.lax.Precision.HIGHEST).reshape(chunk, s)
            + qb * u
            + qc
        )
        return states[-1], states

    _, states = jax.lax.scan(step, x0, chunk_controls)
    states = states.reshape(-1, s)
    return jnp.concatenate([x0[None, :], states], axis=0)


def rollout_trajectory_chunked(p_stack, qb, qc, x0, chunk_controls, g0, n_out):
    """Chunked rollout + field extraction (see `rollout_trajectory`)."""
    states = rollout_states_chunked(p_stack, qb, qc, x0, chunk_controls)
    field = states[:, :n_out]
    left = jnp.full((states.shape[0], 1), g0, dtype=states.dtype)
    return jnp.concatenate([left, field], axis=1)


def rollout_trajectory(a_d, b_d, c_d, x0, controls, g0, n_out):
    """Roll out and extract the full displacement/temperature field.

    Returns ``u_full [T+1, n_out+1]``: the Dirichlet node value ``g0``
    prepended to the first ``n_out`` state components (displacement part).
    ``n_out`` must be static (it fixes the output shape).
    """
    states = rollout_states(a_d, b_d, c_d, x0, controls)
    field = states[:, :n_out]
    left = jnp.full((states.shape[0], 1), g0, dtype=states.dtype)
    return jnp.concatenate([left, field], axis=1)
