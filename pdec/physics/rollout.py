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
