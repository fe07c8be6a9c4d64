"""Tridiagonal solvers for large FEM meshes.

The corpus meshes are tiny (N in {20, 30}), where dense propagators win.
For scaling the physics beyond reference parity (fine meshes, N in the
thousands), the implicit step needs a real tridiagonal solve: `thomas_solve`
is the sequential O(N) algorithm (vmap-batched over problems; XLA vectorizes
the batch across lanes, so the scan is sequential in N but 8x128-wide in
problems — the right trade on TPU for batched workloads).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def thomas_solve(lower, diag, upper, rhs):
    """Solve tridiagonal systems: lower[i] x[i-1] + diag[i] x[i] +
    upper[i] x[i+1] = rhs[i].

    Args:
      lower: ``[n]`` sub-diagonal (lower[0] unused).
      diag: ``[n]`` main diagonal.
      upper: ``[n]`` super-diagonal (upper[n-1] unused).
      rhs: ``[n]``.

    Returns x ``[n]``.  Batch with ``vmap``.
    """

    def fwd(carry, inp):
        c_prev, d_prev = carry
        a, b, c, d = inp
        denom = b - a * c_prev
        c_new = c / denom
        d_new = (d - a * d_prev) / denom
        return (c_new, d_new), (c_new, d_new)

    n = diag.shape[0]
    inputs = (lower, diag, upper, rhs)
    (_, _), (c_prime, d_prime) = jax.lax.scan(
        fwd, (jnp.zeros((), diag.dtype), jnp.zeros((), diag.dtype)), inputs
    )

    def bwd(x_next, inp):
        c, d = inp
        x = d - c * x_next
        return x, x

    _, xs = jax.lax.scan(bwd, jnp.zeros((), diag.dtype), (c_prime, d_prime),
                         reverse=True)
    return xs
