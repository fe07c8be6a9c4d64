"""Large-mesh implicit stepping: O(N) per step via the Thomas solver.

The corpus meshes are tiny (N in {20, 30}) and the dense-propagator path
(`pdec.physics.heat` + `pdec.physics.rollout`) is the right design there:
one dense solve per problem, then GEMM rollouts.  Beyond reference parity
— fine meshes with thousands of nodes, where the dense N x N propagator is
O(N^2) memory and the one-time `jnp.linalg.solve` O(N^3) — the theta-scheme
step must instead solve its tridiagonal system directly each step:

    (M + theta dt K) x_{k+1} = (M - (1-theta) dt K) x_k + dt (F + e_N u_k)

Both operators stay in tridiagonal form (`pdec.physics.assembly.Tridiag`);
the solve is `pdec.ops.tridiag.thomas_solve` — sequential O(N) in the
mesh, but ``vmap``-batched over problems/controls so the TPU lanes stay
full (the scan is over N, the vector dimension is the batch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pdec.ops.tridiag import thomas_solve
from pdec.physics.assembly import Tridiag, assemble_tridiag


def heat_implicit_operators(xpart, rho_e, elastic_e, dt, theta: float = 0.5):
    """Tridiagonal (S, R) over free nodes 1..N plus the constant load.

    Returns (s_tri, r_tri, f_const) with S = M + theta dt K and
    R = M - (1-theta) dt K restricted to free nodes, and
    f_const = -K[1:, 0] * g0-coupling column (per unit g0).
    """
    mass, stiff = assemble_tridiag(xpart, rho_e, elastic_e)
    m_diag, m_off = mass.diag[1:], mass.off[1:]
    k_diag, k_off = stiff.diag[1:], stiff.off[1:]
    s_tri = Tridiag(m_diag + theta * dt * k_diag, m_off + theta * dt * k_off)
    r_tri = Tridiag(
        m_diag - (1.0 - theta) * dt * k_diag,
        m_off - (1.0 - theta) * dt * k_off,
    )
    # Dirichlet coupling: K[1, 0] is the first entry of the stiffness
    # off-diagonal; only free node 1 couples to the boundary node.
    k_10 = stiff.off[0]
    n_free = m_diag.shape[0]
    coupling = jnp.zeros((n_free,), xpart.dtype).at[0].set(-k_10)
    return s_tri, r_tri, coupling


def _tri_bands(tri: Tridiag):
    """(lower, diag, upper) bands in `thomas_solve` layout."""
    zero = jnp.zeros((1,), tri.diag.dtype)
    lower = jnp.concatenate([zero, tri.off])
    upper = jnp.concatenate([tri.off, zero])
    return lower, tri.diag, upper


def rollout_heat_implicit(
    xpart,
    rho_e,
    elastic_e,
    g0,
    dt,
    controls,
    theta: float = 0.5,
    f_nodal=None,
):
    """Crank-Nicolson heat rollout without ever densifying the operators.

    Args:
      xpart: ``[N+1]`` node positions (N can be thousands).
      rho_e, elastic_e: ``[N]`` per-element materials.
      g0: Dirichlet value at node 0.
      dt: fine time step.
      controls: ``[T]`` boundary input at the free end per step.
      f_nodal: optional ``[N+1]`` nodal load.

    Returns states ``[T+1, N]`` over the free nodes (node 0 excluded),
    matching `pdec.physics.rollout.rollout_states` of the dense path.
    """
    s_tri, r_tri, coupling = heat_implicit_operators(
        xpart, rho_e, elastic_e, dt, theta
    )
    f_const = coupling * g0
    if f_nodal is not None:
        f_const = f_const + f_nodal[1:]
    lower, diag, upper = _tri_bands(s_tri)
    n_free = diag.shape[0]
    b_vec = jnp.zeros((n_free,), xpart.dtype).at[-1].set(1.0)
    x0 = jnp.full((n_free,), g0, dtype=xpart.dtype)

    def step(x, u):
        rhs = r_tri.matvec(x) + dt * (f_const + b_vec * u)
        x_next = thomas_solve(lower, diag, upper, rhs)
        return x_next, x_next

    _, xs = jax.lax.scan(step, x0, controls)
    return jnp.concatenate([x0[None, :], xs], axis=0)
