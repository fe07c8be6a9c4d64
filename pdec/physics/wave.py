"""1-D elastic wave rod: femformal ``mechlinfem.mechlinfem`` equivalent.

Continuous problem (reference NL corpus): a steel/brass rod clamped at the
left end (displacement ``g0 = 0``) with a controllable time-varying force at
the right end; displacement follows the 1-D elastic wave equation with
piecewise density ``rho`` and Young's modulus ``E``:

    rho(x) d2u/dt2 = d/dx ( E(x) du/dx ) + f

FEM semi-discretization over free nodes 1..N:

    M u'' + K u = F + e_N w(t)

lowered to first-order form z = [u; v] and discretized with the trapezoidal
rule (equivalent to Newmark average acceleration, beta=1/4, gamma=1/2 for
LTI systems — unconditionally stable; the corpus dt of 0.0025 s exceeds the
explicit CFL limit for these rods, so an implicit scheme is required):

    [[I, 0], [0, M]] z' = [[0, I], [-K, 0]] z + [0; F + e_N w]
    (E - dt/2 A) z_{k+1} = (E + dt/2 A) z_k + dt [0; F + e_N w_k]

The dense 2N x 2N propagator (N ~ 20 -> 40 x 40) is built once per problem;
rollouts are batched mat-vec scans.  Displacement output = z[:N].

Contract choices (Femformal itself is not in the reference snapshot —
SURVEY.md §0.1): materials at element midpoints, consistent mass, zero
initial displacement and velocity, piecewise-constant control per step.
"""

from __future__ import annotations

import jax.numpy as jnp

from pdec.physics.assembly import assemble_tridiag


def build_wave_system(
    xpart: jnp.ndarray,
    rho_e: jnp.ndarray,
    elastic_e: jnp.ndarray,
    g0: jnp.ndarray,
    dt: jnp.ndarray,
    f_nodal: jnp.ndarray | None = None,
):
    """Build the discrete propagator for a wave rod.

    Returns (a_d [2N,2N], b_d [2N], c_d [2N], x0 [2N]); state = [u; v] over
    free nodes 1..N.
    """
    n_nodes = xpart.shape[0]
    n_free = n_nodes - 1
    dtype = xpart.dtype
    mass, stiff = assemble_tridiag(xpart, rho_e, elastic_e)
    m_full = mass.to_dense()
    k_full = stiff.to_dense()

    m_ff = m_full[1:, 1:]
    k_ff = k_full[1:, 1:]
    k_f0 = k_full[1:, 0]

    f_const = -k_f0 * g0
    if f_nodal is not None:
        f_const = f_const + f_nodal[1:]

    eye = jnp.eye(n_free, dtype=dtype)
    zero = jnp.zeros((n_free, n_free), dtype=dtype)

    e_blk = jnp.block([[eye, zero], [zero, m_ff]])
    a_blk = jnp.block([[zero, eye], [-k_ff, zero]])

    s_mat = e_blk - 0.5 * dt * a_blk
    r_mat = e_blk + 0.5 * dt * a_blk

    b_vec = jnp.zeros((2 * n_free,), dtype).at[-1].set(1.0)  # force on v_N row
    c_vec = jnp.concatenate([jnp.zeros((n_free,), dtype), f_const])

    a_d = jnp.linalg.solve(s_mat, r_mat)
    bc = jnp.linalg.solve(s_mat, dt * jnp.stack([b_vec, c_vec], axis=1))
    b_d, c_d = bc[:, 0], bc[:, 1]

    x0 = jnp.zeros((2 * n_free,), dtype)
    return a_d, b_d, c_d, x0
