"""1-D linear FEM assembly: tridiagonal mass and stiffness matrices.

Semantics mirror femformal's ``heatlinfem_mix``/``mechlinfem`` assembly
(reference programs construct them via
``fosys = heatlinfem.heatlinfem_mix(xpart, rho, E, g, f_nodal, dt)``,
see ``utils/few_shot_prompts/examples/one_d_heat/examples.jsonl``):

- mesh nodes ``xpart[0..N]`` (possibly non-uniform),
- per-element material coefficients sampled at element midpoints,
- linear (P1) shape functions:

    element mass       m_e = rho_e * h_e / 6 * [[2, 1], [1, 2]]
    element stiffness  k_e = E_e / h_e * [[1, -1], [-1, 1]]

Matrices are kept in tridiagonal (diag, lower, upper) form; they are only
densified once per problem when building the discrete propagator
(`pdec.physics.problem`), never in the hot rollout loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Tridiag(NamedTuple):
    """Symmetric tridiagonal matrix: main diagonal + one off-diagonal."""

    diag: jnp.ndarray  # [n]
    off: jnp.ndarray  # [n-1]

    def to_dense(self) -> jnp.ndarray:
        n = self.diag.shape[0]
        return (
            jnp.diag(self.diag)
            + jnp.diag(self.off, k=1)
            + jnp.diag(self.off, k=-1)
        )

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        upper = jnp.concatenate([self.off * x[1:], jnp.zeros((1,), x.dtype)])
        lower = jnp.concatenate([jnp.zeros((1,), x.dtype), self.off * x[:-1]])
        return self.diag * x + upper + lower


def element_midpoints(xpart: jnp.ndarray) -> jnp.ndarray:
    """Material sampling points: element midpoints."""
    return 0.5 * (xpart[:-1] + xpart[1:])


def assemble_tridiag(
    xpart: jnp.ndarray,
    rho_e: jnp.ndarray,
    elastic_e: jnp.ndarray,
    lumped_mass: bool = False,
):
    """Assemble global (mass, stiffness) tridiagonals over all N+1 nodes.

    Args:
      xpart: ``[N+1]`` node positions.
      rho_e: ``[N]`` per-element density (or rho*c for heat).
      elastic_e: ``[N]`` per-element Young's modulus (or conductivity).
      lumped_mass: row-sum mass lumping (diagonal mass matrix).

    Returns:
      (mass, stiffness) as `Tridiag` over the full node set.
    """
    h = jnp.diff(xpart)  # [N]

    me = rho_e * h / 6.0  # element mass scale
    ke = elastic_e / h  # element stiffness scale

    zero = jnp.zeros((1,), xpart.dtype)
    if lumped_mass:
        m_diag = jnp.concatenate([3.0 * me, zero]) + jnp.concatenate([zero, 3.0 * me])
        m_off = jnp.zeros_like(me)
    else:
        m_diag = jnp.concatenate([2.0 * me, zero]) + jnp.concatenate([zero, 2.0 * me])
        m_off = me
    k_diag = jnp.concatenate([ke, zero]) + jnp.concatenate([zero, ke])
    k_off = -ke

    return Tridiag(m_diag, m_off), Tridiag(k_diag, k_off)
