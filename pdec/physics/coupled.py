"""Multi-material coupled thermoelastic rod (BASELINE stretch config #3:
"Multi-material coupled rods with nested STL always/until specs
(heat + wave)").

Beyond the reference's single-physics rods (femformal ``heatlinfem`` /
``mechlinfem``, each reached separately via
``eval_robustness_wrapper.py:5-21``): one system couples a heat rod to an
elastic rod through thermal expansion.  The boundary heat input is the only
control; the temperature field loads the elastic rod with nodal thermal
forces, so specs can constrain BOTH fields at once ("keep displacement
bounded *until* the hot zone reaches temperature", etc.).

Model (one-way thermoelastic coupling, the standard weak form):

    rho_h(x) c(x) dT/dt = d/dx ( k(x) dT/dx ) + boundary input w(t)
    rho_w(x) d2u/dt2    = d/dx ( E(x) ( du/dx - alpha(x) (T - T_ref) ) )

FEM thermal force on an element with averaged temperature T_e:
``F = E_e alpha_e (T_e - T_ref) * (-1, +1)`` on its two nodes, i.e. a
linear map ``G`` from nodal temperatures to nodal forces.  T_ref = g0 (the
initial uniform temperature), so the system starts stress-free.

Discrete state z = [T_free (N), u_0 == 0, u_free (N), v_free (N)]:
heat block is the theta-scheme propagator, wave block the trapezoidal
propagator with the thermal force applied explicitly at step k (one-way
coupling; dt is far below the thermal time scale).  The dummy ``u_0`` row
keeps the clamped end inside the OUTPUT slice, so the standard rollout
extraction (``states[:, :n_out]`` with g0 prepended) yields

    y = [g0, T_1..T_N, 0, u_1..u_N]    over    xs = [xpart, 2L + xpart]

— both fields on one spatial axis, displacement nodes offset by 2L.  SSTL
clauses select the field by their position interval ([0, L] = temperature,
[2L, 3L] = displacement); semantics/synthesis need zero changes.
"""

from __future__ import annotations

import jax.numpy as jnp

from pdec.physics.assembly import assemble_tridiag
from pdec.physics.heat import build_heat_system
from pdec.physics.problem import DiscreteSystem


def thermal_force_matrix(xpart, elastic_e, alpha_e):
    """Nodal thermal-force map ``G [N+1, N+1]``: F = G @ (T_full - T_ref)."""
    n_el = xpart.shape[0] - 1
    dtype = xpart.dtype
    g = jnp.zeros((n_el + 1, n_el + 1), dtype=dtype)
    coef = elastic_e * alpha_e  # [n_el]
    idx = jnp.arange(n_el)
    # element e with end nodes (e, e+1), averaged temperature:
    # F_left -= coef * (T_e + T_{e+1}) / 2 ; F_right += the same
    half = 0.5 * coef
    g = g.at[idx, idx].add(-half)
    g = g.at[idx, idx + 1].add(-half)
    g = g.at[idx + 1, idx].add(half)
    g = g.at[idx + 1, idx + 1].add(half)
    return g


def build_coupled_rod(
    xpart,
    heat_rho_e,
    heat_k_e,
    wave_rho_e,
    wave_e_e,
    alpha_e,
    g0,
    dt,
    theta: float = 0.5,
):
    """Discrete propagator for the coupled rod.

    Returns ``(a_d, b_d, c_d, x0)`` with state
    ``[T_free (N), u_0, u_free (N), v_free (N)]`` (size 3N + 1); the single
    control is the boundary heat input.
    """
    n_free = xpart.shape[0] - 1
    dtype = xpart.dtype

    # heat block (theta scheme)
    a_h, b_h, c_h, x0_h = build_heat_system(
        xpart, heat_rho_e, heat_k_e, g0, dt, theta=theta
    )

    # wave block (trapezoidal), clamped at node 0, no direct control
    mass, stiff = assemble_tridiag(xpart, wave_rho_e, wave_e_e)
    m_ff = mass.to_dense()[1:, 1:]
    k_ff = stiff.to_dense()[1:, 1:]
    eye = jnp.eye(n_free, dtype=dtype)
    zero = jnp.zeros((n_free, n_free), dtype=dtype)
    e_blk = jnp.block([[eye, zero], [zero, m_ff]])
    a_blk = jnp.block([[zero, eye], [-k_ff, zero]])
    s_mat = e_blk - 0.5 * dt * a_blk
    s_inv = jnp.linalg.inv(s_mat)
    a_w = s_inv @ (e_blk + 0.5 * dt * a_blk)

    # thermal coupling: force rows of the wave update from free temperatures
    g_full = thermal_force_matrix(xpart, wave_e_e, alpha_e)
    g_ff = g_full[1:, 1:]  # column 0 multiplies (g0 - T_ref) == 0
    # dt * S^{-1} [0; F] -> only the force half of the stacked RHS
    force_map = dt * s_inv[:, n_free:]  # [2N, N]
    couple = force_map @ g_ff  # [2N, N], applied to (T_free - g0)

    n_state = 3 * n_free + 1
    a_d = jnp.zeros((n_state, n_state), dtype=dtype)
    a_d = a_d.at[:n_free, :n_free].set(a_h)
    # u_0 row stays identically zero (clamped end, kept for output layout)
    a_d = a_d.at[n_free + 1:, :n_free].set(couple)
    a_d = a_d.at[n_free + 1:, n_free + 1:].set(a_w)

    b_d = jnp.zeros((n_state,), dtype).at[:n_free].set(b_h)
    c_d = jnp.zeros((n_state,), dtype)
    c_d = c_d.at[:n_free].set(c_h)
    # stress-free reference: subtract the g0 baseline from the coupling
    c_d = c_d.at[n_free + 1:].add(-couple @ jnp.full((n_free,), g0, dtype))

    x0 = jnp.zeros((n_state,), dtype).at[:n_free].set(x0_h)
    return a_d, b_d, c_d, x0


def coupled_system(
    xpart,
    heat_rho_e,
    heat_k_e,
    wave_rho_e,
    wave_e_e,
    alpha_e,
    g0,
    dt,
    n_steps: int,
    u_scale,
) -> DiscreteSystem:
    """Lower a coupled rod to a `DiscreteSystem` (direct rollout path; the
    coupled propagator is not symmetric so the spectral shortcut is off)."""
    a_d, b_d, c_d, x0 = build_coupled_rod(
        xpart, heat_rho_e, heat_k_e, wave_rho_e, wave_e_e, alpha_e, g0, dt
    )
    n_free = xpart.shape[0] - 1
    length = xpart[-1]
    xs = jnp.concatenate([xpart, 2.0 * length + xpart])
    return DiscreteSystem(
        a_d=a_d,
        b_d=b_d,
        c_d=c_d,
        x0=x0,
        g0=jnp.asarray(g0),
        xs=xs,
        dt=jnp.asarray(dt),
        n_steps=jnp.asarray(n_steps, jnp.int32),
        u_scale=jnp.asarray(u_scale),
        spectral=None,
        n_out=2 * n_free + 1,
    )
