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

so the device-side work per optimizer iteration collapses to a short
chunk-boundary recurrence (strategy selectable: sequential scan /
associative scan / causal Toeplitz GEMM — see ``TRAJECTORY_MODE``) plus
ONE batched GEMM back-transform ``x = Re(V z)`` over all output times at
once — parallel in time within chunks, in both autodiff directions.

Numerics: heat propagators are diagonalizable with real spectra in (0, 1);
wave (trapezoidal) propagators have unit-circle complex spectra, so
|lam^o| = 1 and powers are stable.  Accuracy vs the direct rollout is
tested to ~1e-3 relative — within the robustness comparison tolerance; the
final hard evaluation in synthesis always uses the direct rollout.
"""

from __future__ import annotations

from typing import NamedTuple

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


class SpectralTables(NamedTuple):
    """Control-independent tables for the parallel-in-time trajectory.

    The chunk recurrence ``z_{m+1} = lam^c z_m + geom_c f_m`` unrolls in
    closed form to

        z_m = lam^{c m} z_0 + sum_{j<m} lam^{c(m-1-j)} geom_c f_j

    i.e. a *causal Toeplitz matmul* over chunks.  Materializing that
    kernel once per problem turns every trajectory evaluation from an
    M-step sequential ``lax.scan`` (the measured synthesis latency bound
    on TPU: ~5k sequential scan steps per wave solve, each microseconds
    of tiny elementwise work) into a depth-1 batched GEMM + elementwise
    emission — fully parallel in time, in both autodiff directions.

    ``kern``/``cpow`` depend only on (ops, chunk, n_chunks) and are shared
    across strides via ``spectral_tables(..., base=...)``; the per-stride
    offset rows (``pow``/``geo``) are small.
    """

    pow_re: jnp.ndarray  # [O, S] lam^o, o in offsets(stride)
    pow_im: jnp.ndarray
    geo_re: jnp.ndarray  # [O, S] geom_o
    geo_im: jnp.ndarray
    kern_re: jnp.ndarray  # [M, M, S] K[m, j] = lam^{c(m-1-j)} geom_c (j < m)
    kern_im: jnp.ndarray
    cpow_re: jnp.ndarray  # [M, S] lam^{c m}, m = 0..M-1
    cpow_im: jnp.ndarray


def spectral_tables(
    ops: SpectralOps, chunk: int, stride: int, n_chunks: int,
    base: SpectralTables | None = None,
) -> SpectralTables:
    """Precompute `SpectralTables`; pass another stride's tables as
    ``base`` to share the (stride-independent) chunk kernel."""
    offsets = list(range(stride, chunk + 1, stride))
    pow_re, pow_im = _cpow_table(ops.lam_re, ops.lam_im, offsets)  # [O, S]
    geoms = [
        _geom(ops.lam_re, ops.lam_im, pow_re[i], pow_im[i], o)
        for i, o in enumerate(offsets)
    ]
    g_re = jnp.stack([g[0] for g in geoms])  # [O, S]
    g_im = jnp.stack([g[1] for g in geoms])
    if base is not None:
        return SpectralTables(
            pow_re, pow_im, g_re, g_im,
            base.kern_re, base.kern_im, base.cpow_re, base.cpow_im,
        )
    # chunk-step propagator lam^c and its geometric sum (stride | chunk,
    # so the last offset row IS o = chunk)
    cp_re, cp_im = pow_re[-1], pow_im[-1]
    cg_re, cg_im = g_re[-1], g_im[-1]
    # lam^{c m}: M tiny elementwise complex muls, traced ONCE per problem
    rows_re, rows_im = [jnp.ones_like(cp_re)], [jnp.zeros_like(cp_im)]
    for _ in range(n_chunks - 1):
        nr, ni = _cmul(rows_re[-1], rows_im[-1], cp_re, cp_im)
        rows_re.append(nr)
        rows_im.append(ni)
    cpow_re = jnp.stack(rows_re)  # [M, S]
    cpow_im = jnp.stack(rows_im)
    # T[d] = lam^{c d} geom_c; K[m, j] = T[m-1-j] for j < m else 0
    t_re, t_im = _cmul(cpow_re, cpow_im, cg_re[None, :], cg_im[None, :])
    m_idx = jnp.arange(n_chunks)
    d = m_idx[:, None] - 1 - m_idx[None, :]  # [M, M]
    valid = (d >= 0)[:, :, None]
    dc = jnp.clip(d, 0, n_chunks - 1)
    kern_re = jnp.where(valid, t_re[dc], 0.0)  # [M, M, S]
    kern_im = jnp.where(valid, t_im[dc], 0.0)
    return SpectralTables(
        pow_re, pow_im, g_re, g_im, kern_re, kern_im, cpow_re, cpow_im
    )


# Chunk-boundary state computation strategy (A/B-tested on-chip with
# benchmarks/microbench_spectral.py; see docs/PERF.md):
#   "toeplitz" — causal Toeplitz GEMM, depth 1
#   "ascan"    — associative scan over chunks, depth log2(M)
#   "scan"     — sequential lax.scan, depth M (the round-3 baseline)
# Measured on-chip at production lane counts (256x7): scan WINS — the
# M~=20-56 chunk scan is not the latency bound there, and both
# parallel-in-time forms pay real extra FLOPs/bytes for their depth
# reduction (wave grad 7.2 scan / 7.6 ascan / 10.4 toeplitz ms; heat
# hard-eval 3.2 / 3.4 / 21.9 ms).  Kept selectable for small-lane or
# future-hardware regimes where sequential depth dominates.
TRAJECTORY_MODE = "scan"


def _boundary_toeplitz(tb: SpectralTables, ops: SpectralOps, fr, fi):
    """z_m = lam^{cm} z0 + K @ f  (causal Toeplitz GEMM, depth 1)."""
    zr = (jnp.einsum("mjs,js->ms", tb.kern_re, fr)
          - jnp.einsum("mjs,js->ms", tb.kern_im, fi))
    zi = (jnp.einsum("mjs,js->ms", tb.kern_re, fi)
          + jnp.einsum("mjs,js->ms", tb.kern_im, fr))
    z0r, z0i = _cmul(tb.cpow_re, tb.cpow_im,
                     ops.z0_re[None, :], ops.z0_im[None, :])
    return zr + z0r, zi + z0i


def _boundary_ascan(tb: SpectralTables, ops: SpectralOps, fr, fi):
    """Associative scan over the affine chunk maps (depth log2 M).

    Element m is the map z -> lam^c z + geom_c f_m; composing prefixes
    gives the chunk-END state after chunk m, so boundary states are the
    shifted prefixes with z_start[0] = z0."""
    import jax

    m = fr.shape[0]
    cp_re, cp_im = tb.pow_re[-1], tb.pow_im[-1]  # lam^chunk
    cg_re, cg_im = tb.geo_re[-1], tb.geo_im[-1]  # geom_chunk
    a_re = jnp.broadcast_to(cp_re[None, :], fr.shape)
    a_im = jnp.broadcast_to(cp_im[None, :], fr.shape)
    b_re, b_im = _cmul(cg_re[None, :], cg_im[None, :], fr, fi)

    def compose(x, y):
        x_ar, x_ai, x_br, x_bi = x
        y_ar, y_ai, y_br, y_bi = y
        ar, ai = _cmul(y_ar, y_ai, x_ar, x_ai)
        tr, ti = _cmul(y_ar, y_ai, x_br, x_bi)
        return ar, ai, tr + y_br, ti + y_bi

    p_ar, p_ai, p_br, p_bi = jax.lax.associative_scan(
        compose, (a_re, a_im, b_re, b_im), axis=0
    )
    # z_end[m] = A_pref[m] z0 + B_pref[m]; z_start[m] = z_end[m-1]
    zr0, zi0 = _cmul(p_ar, p_ai, ops.z0_re[None, :], ops.z0_im[None, :])
    z_end_re, z_end_im = zr0 + p_br, zi0 + p_bi
    zr = jnp.concatenate([ops.z0_re[None, :], z_end_re[: m - 1]], axis=0)
    zi = jnp.concatenate([ops.z0_im[None, :], z_end_im[: m - 1]], axis=0)
    return zr, zi


def _boundary_scan(tb: SpectralTables, ops: SpectralOps, fr, fi):
    """Sequential chunk recurrence (depth M — the round-3 baseline)."""
    import jax

    cp_re, cp_im = tb.pow_re[-1], tb.pow_im[-1]
    cg_re, cg_im = tb.geo_re[-1], tb.geo_im[-1]

    def step(carry, f):
        zr, zi = carry
        f_r, f_i = f
        nr, ni = _cmul(cp_re, cp_im, zr, zi)
        br, bi = _cmul(cg_re, cg_im, f_r, f_i)
        return (nr + br, ni + bi), (zr, zi)

    _, (zr, zi) = jax.lax.scan(step, (ops.z0_re, ops.z0_im), (fr, fi))
    return zr, zi


_BOUNDARY = {
    "toeplitz": _boundary_toeplitz,
    "ascan": _boundary_ascan,
    "scan": _boundary_scan,
}


def spectral_trajectory_strided(
    ops: SpectralOps,
    chunk_controls,  # [n_chunks]
    g0,
    n_out: int,
    chunk: int,
    stride: int,
    tables: SpectralTables | None = None,
    mode: str | None = None,
):
    """Strided field trajectory [T//stride + 1, n_out + 1] (t=0 included).

    Chunk-boundary states via the configured strategy (`TRAJECTORY_MODE`),
    within-chunk emission as one elementwise broadcast, back-transform as
    one GEMM.  Pass precomputed ``tables`` in hot loops (synthesis
    computes them once per problem and closes over them, so optimizer
    iterations pay zero table cost)."""
    n_chunks = chunk_controls.shape[0]
    tb = tables
    if tb is None:
        tb = spectral_tables(ops, chunk, stride, n_chunks)

    fr = ops.beta_re[None, :] * chunk_controls[:, None] + ops.gamma_re[None, :]
    fi = ops.beta_im[None, :] * chunk_controls[:, None] + ops.gamma_im[None, :]

    zr, zi = _BOUNDARY[mode or TRAJECTORY_MODE](tb, ops, fr, fi)  # [M, S]

    # emitted states at each within-chunk offset: lam^o z_m + geom_o f_m
    er1, ei1 = _cmul(tb.pow_re[None], tb.pow_im[None],
                     zr[:, None, :], zi[:, None, :])
    er2, ei2 = _cmul(tb.geo_re[None], tb.geo_im[None],
                     fr[:, None, :], fi[:, None, :])
    z_re = (er1 + er2).reshape(-1, zr.shape[-1])  # [M*O, S]
    z_im = (ei1 + ei2).reshape(-1, zi.shape[-1])
    # back-transform all times at once: x = Re(V z) = Vr zr - Vi zi
    # (one parallel GEMM)
    x = z_re @ ops.vr.T - z_im @ ops.vi.T  # [T_out, S]
    x0 = ops.z0_re @ ops.vr.T - ops.z0_im @ ops.vi.T
    x = jnp.concatenate([x0[None, :], x], axis=0)
    field = x[:, :n_out]
    left = jnp.full((x.shape[0], 1), g0, dtype=x.dtype)
    return jnp.concatenate([left, field], axis=1)
