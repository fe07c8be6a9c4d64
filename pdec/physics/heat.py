"""1-D heat rod: femformal ``heatlinfem.heatlinfem_mix`` equivalent.

Continuous problem (reference NL corpus): a rod of length L with the left
end held at temperature ``g0`` and a controllable heat source at the right
end; temperature follows the 1-D linear heat equation with piecewise
materials ``rho*c`` and conductivity ``E``:

    rho(x) c(x) du/dt = d/dx ( E(x) du/dx ) + f

FEM semi-discretization over free nodes 1..N (node 0 eliminated by the
Dirichlet BC, its stiffness coupling moved into the constant load):

    M x' + K x = F + e_N u(t)

Time discretization is the theta scheme (theta = 1/2, Crank-Nicolson;
unconditionally stable, matching the implicit stepping the reference relies
on — its corpus uses dt far above the explicit stability limit):

    (M + theta dt K) x_{k+1} = (M - (1-theta) dt K) x_k + dt (F + e_N u_k)

which lowers to the discrete LTI form ``x_{k+1} = A_d x_k + b_d u_k + c_d``
with a one-time dense solve (N ~ 30).

Contract choices documented for parity auditing (the reference never ships
Femformal, only calls it — SURVEY.md §0.1):
- materials sampled at element midpoints,
- consistent (non-lumped) mass matrix,
- initial condition: uniform temperature ``x_0 = g0``,
- control is piecewise-constant per fine time step at the free end node.
"""

from __future__ import annotations

import jax.numpy as jnp

from pdec.physics.assembly import assemble_tridiag


def build_heat_system(
    xpart: jnp.ndarray,
    rho_e: jnp.ndarray,
    elastic_e: jnp.ndarray,
    g0: jnp.ndarray,
    dt: jnp.ndarray,
    f_nodal: jnp.ndarray | None = None,
    theta: float = 0.5,
):
    """Build the discrete propagator for a heat rod.

    Returns (a_d [N,N], b_d [N], c_d [N], x0 [N]) over free nodes 1..N.
    """
    n_nodes = xpart.shape[0]
    n_free = n_nodes - 1
    mass, stiff = assemble_tridiag(xpart, rho_e, elastic_e)
    m_full = mass.to_dense()
    k_full = stiff.to_dense()

    m_ff = m_full[1:, 1:]
    k_ff = k_full[1:, 1:]
    k_f0 = k_full[1:, 0]

    f_const = -k_f0 * g0
    if f_nodal is not None:
        f_const = f_const + f_nodal[1:]

    b_vec = jnp.zeros((n_free,), xpart.dtype).at[-1].set(1.0)

    s_mat = m_ff + theta * dt * k_ff
    r_mat = m_ff - (1.0 - theta) * dt * k_ff

    a_d = jnp.linalg.solve(s_mat, r_mat)
    bc = jnp.linalg.solve(s_mat, dt * jnp.stack([b_vec, f_const], axis=1))
    b_d, c_d = bc[:, 0], bc[:, 1]

    x0 = jnp.full((n_free,), g0, dtype=xpart.dtype)
    return a_d, b_d, c_d, x0
