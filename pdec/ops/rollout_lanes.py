"""Batched LTI rollout as a Pallas TPU kernel: batch in the lanes.

The synthesis hot loop rolls out thousands of *different* small LTI systems
(state dim ~30-40).  As batched mat-vecs, XLA maps these onto the MXU where
they occupy a sliver of each 128x128 tile (N=1, K~31) — measured ceiling
~170 solves/s/chip.  The right layout on TPU is VPU-native: put the batch
in the 128-wide lane dimension and keep the state in sublanes:

    A stored [S_j, S_i, 128]   (one lane per problem instance)
    x stored [S, 128]
    step:  for j in range(S):  acc[S_i, 128] += A[j] * x[j]  (VPU FMAs)

Each grid program owns one 128-instance tile, keeps its propagator resident
in VMEM (~0.5 MB), scans all T fine steps in-kernel, and writes only every
``stride``-th state to HBM (the smooth objective is evaluated on the
strided grid; exact hard evaluation happens elsewhere).

The backward pass is a hand-written adjoint, not autodiff-of-scan: for LTI
systems the control gradient needs NO forward states —

    lam_T = g_T;   lam_k = A^T lam_{k+1} + g_k    (g = cotangent at
                                                    strided outputs)
    du_k  = b . lam_{k+1};  chunk grads sum over their fine steps

so the backward kernel has the same cost/shape as the forward and zero
residual memory.  Exposed through ``jax.custom_vjp`` (gradients flow to the
controls only; system matrices are problem constants).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _round_up(n, m):
    return ((n + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(a_ref, b_ref, c_ref, x0_ref, u_ref, y_ref, *,
                s_pad: int, chunk: int, stride: int, n_chunks: int):
    """One 128-instance tile: roll out all T = n_chunks*chunk steps.

    a_ref: [1, S_j, S_i, L]; b/c/x0: [1, S, L]; u: [1, n_chunks, L];
    y: [1, T//stride, S, L] (strided states, newest-first ordering skipped —
    natural time order).
    """
    b = b_ref[0]
    c = c_ref[0]

    def chunk_body(ci, x):
        u = u_ref[0, ci]  # [L]
        bu_c = b * u[None, :] + c  # [S, L]

        def step_body(si, x):
            # x_{k+1} = A x_k + b u + c, A as [S_j, S_i, L]
            acc = bu_c
            for j in range(s_pad):
                acc = acc + a_ref[0, j] * x[j][None, :]
            # write strided outputs
            k = ci * chunk + si  # 0-based fine step; state index k+1
            @pl.when((k + 1) % stride == 0)
            def _():
                y_ref[0, (k + 1) // stride - 1] = acc
            return acc

        return jax.lax.fori_loop(0, chunk, step_body, x)

    jax.lax.fori_loop(0, n_chunks, chunk_body, x0_ref[0])


def _fwd_pallas(a, b, c, x0, u, chunk: int, stride: int):
    """a: [tiles, S_j, S_i, L]; b/c/x0: [tiles, S, L]; u: [tiles, n_chunks, L]
    -> y [tiles, T//stride, S, L]."""
    tiles, s_pad, _, lanes = a.shape
    n_chunks = u.shape[1]
    t_out = (n_chunks * chunk) // stride
    kernel = functools.partial(
        _fwd_kernel, s_pad=s_pad, chunk=chunk, stride=stride,
        n_chunks=n_chunks,
    )
    return pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((1, s_pad, s_pad, lanes), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_chunks, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_out, s_pad, lanes),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tiles, t_out, s_pad, lanes),
                                       jnp.float32),
    )(a, b, c, x0, u)


# ---------------------------------------------------------------------------
# Backward (adjoint) kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(at_ref, b_ref, g_ref, du_ref, *,
                s_pad: int, chunk: int, stride: int, n_chunks: int):
    """Adjoint recursion, reverse time.

    ``at_ref`` holds the TRANSPOSED propagator in the same lane layout as
    the forward (at[i] rows give lam' = sum_i at[i] * lam[i] with the
    identical broadcast-FMA pattern — no in-kernel transposes or
    concatenates, which Mosaic compiles poorly).
    du[chunk] accumulates b . lam_{k+1} over the chunk's fine steps;
    g_ref: [1, T//stride, S, L] cotangents at strided states.
    """
    b = b_ref[0]
    lam0 = jnp.zeros_like(b)

    def chunk_body(rci, lam):
        ci = n_chunks - 1 - rci
        du_acc = jnp.zeros_like(du_ref[0, 0])

        def step_body(rsi, carry):
            lam, du_acc = carry
            si = chunk - 1 - rsi
            k = ci * chunk + si  # state index k+1 produced by this step
            # inject cotangent if state k+1 was a strided output
            is_out = ((k + 1) % stride) == 0
            g = jnp.where(
                is_out,
                g_ref[0, jnp.maximum((k + 1) // stride - 1, 0)],
                jnp.zeros_like(lam),
            )
            lam = lam + g
            # du_k = b . lam (lam currently = dL/dx_{k+1})
            du_acc = du_acc + jnp.sum(b * lam, axis=0)
            # lam <- A^T lam via the pre-transposed operand
            acc = jnp.zeros_like(lam)
            for i in range(s_pad):
                acc = acc + at_ref[0, i] * lam[i][None, :]
            return acc, du_acc

        lam, du_acc = jax.lax.fori_loop(0, chunk, step_body, (lam, du_acc))
        du_ref[0, ci] = du_acc
        return lam

    jax.lax.fori_loop(0, n_chunks, chunk_body, lam0)


def _bwd_pallas(a, b, g, chunk: int, stride: int, n_chunks: int):
    tiles, s_pad, _, lanes = a.shape
    # a is [tiles, S_j, S_i, L]; swapping the S axes gives the transpose in
    # the layout the forward-style FMA loop expects
    at = a.transpose(0, 2, 1, 3)
    kernel = functools.partial(
        _bwd_kernel, s_pad=s_pad, chunk=chunk, stride=stride,
        n_chunks=n_chunks,
    )
    return pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((1, s_pad, s_pad, lanes), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g.shape[1], s_pad, lanes),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_chunks, lanes), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tiles, n_chunks, lanes), jnp.float32),
    )(at, b, g)


# ---------------------------------------------------------------------------
# custom_vjp wrapper + jax reference
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def rollout_lanes(a, b, c, x0, u, chunk: int, stride: int):
    """Strided lane-major rollout; differentiable wrt ``u`` only."""
    return _fwd_pallas(a, b, c, x0, u, chunk, stride)


def _rl_fwd(a, b, c, x0, u, chunk, stride):
    return _fwd_pallas(a, b, c, x0, u, chunk, stride), (a, b)


def _rl_bwd(chunk, stride, res, g):
    a, b = res
    n_chunks = g.shape[1] * stride // chunk
    du = _bwd_pallas(a, b, g, chunk, stride, n_chunks)
    zero = lambda x: jnp.zeros_like(x)
    return zero(a), zero(b), jnp.zeros_like(b), jnp.zeros_like(b), du


rollout_lanes.defvjp(_rl_fwd, _rl_bwd)


def rollout_lanes_reference(a, b, c, x0, u, chunk: int, stride: int):
    """Pure-jax executable spec of the kernel (tests + CPU fallback).

    Same signature/layout: a [tiles, S_j, S_i, L] etc.
    """
    n_chunks = u.shape[1]
    t_total = n_chunks * chunk

    def per_tile(a_t, b_t, c_t, x0_t, u_t):
        def step(x, k):
            ci = k // chunk
            uu = u_t[ci]  # [L]
            x_next = (
                jnp.einsum("jil,jl->il", a_t, x,
                           precision=jax.lax.Precision.HIGHEST)
                + b_t * uu[None, :]
                + c_t
            )
            return x_next, x_next

        _, states = jax.lax.scan(step, x0_t, jnp.arange(t_total))
        return states[stride - 1 :: stride]  # [T//stride, S, L]

    return jax.vmap(per_tile)(a, b, c, x0, u)


# ---------------------------------------------------------------------------
# Packing helpers: instance-major <-> lane-major
# ---------------------------------------------------------------------------


def pack_lanes(arr, s_pad: int = None):
    """[B_inst, ...dims..., S(, S2)] -> tiles with instances in lanes.

    For a 2-D system matrix input [B, S, S] returns [tiles, S_j, S_i, L];
    for vectors [B, S] returns [tiles, S, L]; for controls [B, K] returns
    [tiles, K, L].  B is padded to a multiple of 128, S to ``s_pad``.
    """
    b_inst = arr.shape[0]
    b_pad = _round_up(b_inst, LANES)
    pad_rows = [(0, b_pad - b_inst)] + [(0, 0)] * (arr.ndim - 1)
    arr = jnp.pad(arr, pad_rows)
    if s_pad is not None:
        if arr.ndim == 3:  # [B, S, S] matrices (rows=out index i, cols=in j)
            arr = jnp.pad(
                arr, [(0, 0), (0, s_pad - arr.shape[1]), (0, s_pad - arr.shape[2])]
            )
            # -> [tiles, L, S_i, S_j] -> [tiles, S_j, S_i, L]
            arr = arr.reshape(b_pad // LANES, LANES, s_pad, s_pad)
            return arr.transpose(0, 3, 2, 1)
        arr = jnp.pad(arr, [(0, 0), (0, s_pad - arr.shape[1])])
    arr = arr.reshape(b_pad // LANES, LANES, arr.shape[1])
    return arr.transpose(0, 2, 1)


def unpack_lanes(y, b_inst: int):
    """[tiles, T, S, L] -> [B_inst, T, S]."""
    tiles, t_out, s_pad, lanes = y.shape
    y = y.transpose(0, 3, 1, 2).reshape(tiles * lanes, t_out, s_pad)
    return y[:b_inst]
