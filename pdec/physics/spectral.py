"""Spectral (eigenbasis) rollout: closed-form LTI trajectories.

Direct rollout is a T-step sequential scan — measured to be the synthesis
throughput bound on TPU (latency of the dependency chain, not FLOPs).
Diagonalizing the propagator once per problem ON THE HOST (TPU has no
``eig``; this runs in numpy at problem-build time, complex64) gives

    x_{k+1} = A x_k + b u_k + c,  A = V diag(lam) V^{-1}
    z = V^{-1} x:   z_{k+1} = lam * z_k + beta u_k + gamma   (elementwise!)

and with piecewise-constant control per chunk the within-chunk evolution
has a closed form:

    z_{m+o} = lam^o z_m + geom_o * (beta u + gamma),
    geom_o = (1 - lam^o) / (1 - lam)   (-> o as lam -> 1)

so the device-side work per optimizer iteration collapses to a ~20-step
elementwise scan over chunks plus ONE batched GEMM back-transform
``x = Re(V z)`` over all output times at once — fully parallel in time,
in both autodiff directions.

Numerics: heat propagators are diagonalizable with real spectra in (0, 1);
wave (trapezoidal) propagators have unit-circle complex spectra, so
|lam^o| = 1 and powers are stable.  Accuracy vs the direct rollout is
tested to ~1e-3 relative — within the robustness comparison tolerance; the
final hard evaluation in synthesis always uses the direct rollout.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class SpectralOps(NamedTuple):
    """Complex spectral operators, split into real/imag float32 arrays."""

    lam_re: jnp.ndarray  # [S]
    lam_im: jnp.ndarray  # [S]
    vr: jnp.ndarray  # [S, S] Re(V)
    vi: jnp.ndarray  # [S, S] Im(V)
    beta_re: jnp.ndarray  # [S] Re(V^-1 b)
    beta_im: jnp.ndarray
    gamma_re: jnp.ndarray  # [S] Re(V^-1 c)
    gamma_im: jnp.ndarray
    z0_re: jnp.ndarray  # [S] Re(V^-1 x0)
    z0_im: jnp.ndarray


def spectral_ops(a_d, b_d, c_d, x0) -> SpectralOps:
    """Host-side eigendecomposition (numpy; complex128 internally)."""
    a = np.asarray(a_d, np.float64)
    lam, v = np.linalg.eig(a)
    v_inv = np.linalg.inv(v)
    beta = v_inv @ np.asarray(b_d, np.float64)
    gamma = v_inv @ np.asarray(c_d, np.float64)
    z0 = v_inv @ np.asarray(x0, np.float64)

    def sp(x):
        return (
            jnp.asarray(np.real(x), jnp.float32),
            jnp.asarray(np.imag(x), jnp.float32),
        )

    lam_re, lam_im = sp(lam)
    vr, vi = sp(v)
    beta_re, beta_im = sp(beta)
    gamma_re, gamma_im = sp(gamma)
    z0_re, z0_im = sp(z0)
    return SpectralOps(
        lam_re, lam_im, vr, vi, beta_re, beta_im, gamma_re, gamma_im,
        z0_re, z0_im,
    )


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _cpow_table(lam_re, lam_im, offsets):
    """lam^o for each o in offsets (static python list) -> [len(offsets), S]."""
    rows_re, rows_im = [], []
    pr = jnp.ones_like(lam_re)
    pi = jnp.zeros_like(lam_im)
    k = 0
    out = {}
    max_o = max(offsets)
    for step in range(1, max_o + 1):
        pr, pi = _cmul(pr, pi, lam_re, lam_im)
        if step in offsets:
            out[step] = (pr, pi)
    for o in offsets:
        rows_re.append(out[o][0])
        rows_im.append(out[o][1])
    return jnp.stack(rows_re), jnp.stack(rows_im)


def _geom(lam_re, lam_im, pow_re, pow_im, o: int):
    """(1 - lam^o) / (1 - lam) with the lam->1 limit (= o)."""
    num_re, num_im = 1.0 - pow_re, -pow_im
    den_re, den_im = 1.0 - lam_re, -lam_im
    den_sq = den_re * den_re + den_im * den_im
    g_re = (num_re * den_re + num_im * den_im) / jnp.maximum(den_sq, 1e-30)
    g_im = (num_im * den_re - num_re * den_im) / jnp.maximum(den_sq, 1e-30)
    near_one = den_sq < 1e-12
    return (
        jnp.where(near_one, float(o), g_re),
        jnp.where(near_one, 0.0, g_im),
    )


def spectral_trajectory_strided(
    ops: SpectralOps,
    chunk_controls,  # [n_chunks]
    g0,
    n_out: int,
    chunk: int,
    stride: int,
):
    """Strided field trajectory [T//stride + 1, n_out + 1] (t=0 included)."""
    offsets = list(range(stride, chunk + 1, stride))
    pow_re, pow_im = _cpow_table(ops.lam_re, ops.lam_im, offsets)  # [O, S]
    geoms = [
        _geom(ops.lam_re, ops.lam_im, pow_re[i], pow_im[i], o)
        for i, o in enumerate(offsets)
    ]
    g_re = jnp.stack([g[0] for g in geoms])  # [O, S]
    g_im = jnp.stack([g[1] for g in geoms])
    # chunk-step propagator = lam^chunk (last offset when stride | chunk)
    cp_re, cp_im = pow_re[-1], pow_im[-1]
    cg_re, cg_im = g_re[-1], g_im[-1]

    def step(carry, u):
        zr, zi = carry
        fr = ops.beta_re * u + ops.gamma_re  # forcing (beta u + gamma)
        fi = ops.beta_im * u + ops.gamma_im
        # emitted states at each offset: lam^o z + geom_o * f
        er1, ei1 = _cmul(pow_re, pow_im, zr[None, :], zi[None, :])
        er2, ei2 = _cmul(g_re, g_im, fr[None, :], fi[None, :])
        out_re, out_im = er1 + er2, ei1 + ei2  # [O, S]
        # carry = chunk-end state
        nr1, ni1 = _cmul(cp_re, cp_im, zr, zi)
        nr2, ni2 = _cmul(cg_re, cg_im, fr, fi)
        return (nr1 + nr2, ni1 + ni2), (out_re, out_im)

    (zr, zi), (z_re, z_im) = jax.lax.scan(
        step, (ops.z0_re, ops.z0_im), chunk_controls
    )
    t_out = z_re.shape[0] * z_re.shape[1]
    z_re = z_re.reshape(t_out, -1)
    z_im = z_im.reshape(t_out, -1)
    # back-transform all times at once: x = Re(V z) = Vr zr - Vi zi
    # (one parallel GEMM — the whole point)
    x = (
        z_re @ ops.vr.T - z_im @ ops.vi.T
    )  # [T_out, S]
    x0 = ops.z0_re @ ops.vr.T - ops.z0_im @ ops.vi.T
    x = jnp.concatenate([x0[None, :], x], axis=0)
    field = x[:, :n_out]
    left = jnp.full((x.shape[0], 1), g0, dtype=x.dtype)
    return jnp.concatenate([left, field], axis=1)
