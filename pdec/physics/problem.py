"""Problem lowering: `FemProgram` -> device-ready `DiscreteSystem`.

This is the bridge between the (host-side, parsed) coder-dialect program and
the jit/vmap world: fixed-shape arrays only, suitable for stacking whole
eval datasets into one batched synthesis call.

Also defines the control-authority contract: the synthesis bound on the
boundary input is scaled from the rod's static compliance so that the
reachable field spans the magnitude of the spec profiles (the reference's
Gurobi MILP bounds live inside the unshipped Femformal examples —
SURVEY.md §0.1; this documented scaling is our equivalent).
"""

from __future__ import annotations

from typing import Optional

import flax.struct as struct
import jax
import jax.numpy as jnp
import numpy as np

from pdec.physics.heat import build_heat_system
from pdec.physics.spectral import SpectralOps, spectral_ops
from pdec.physics.wave import build_wave_system
from pdec.stl.program import FemProgram

KIND_HEAT = 0
KIND_WAVE = 1


@struct.dataclass
class DiscreteSystem:
    """Discrete-time LTI rod system plus output/bookkeeping metadata.

    Array fields are pytree leaves (batchable under vmap/pjit); ``n_out``
    is static metadata (it fixes output shapes inside jit).
    """

    a_d: jnp.ndarray  # [S, S]
    b_d: jnp.ndarray  # [S]
    c_d: jnp.ndarray  # [S]
    x0: jnp.ndarray  # [S]
    g0: jnp.ndarray  # scalar Dirichlet value
    xs: jnp.ndarray  # [n_out + 1] node positions
    dt: jnp.ndarray  # scalar fine step
    n_steps: jnp.ndarray  # scalar int: valid steps (<= controls length)
    u_scale: jnp.ndarray  # scalar control bound (|u| <= u_scale)
    # host-precomputed eigenbasis operators (pdec.physics.spectral); when
    # present the synthesis objective uses the closed-form parallel-in-time
    # rollout instead of the sequential scan
    spectral: Optional[SpectralOps] = None
    n_out: int = struct.field(pytree_node=False, default=0)


def build_system(
    kind: str,
    xpart,
    rho_e,
    elastic_e,
    g0,
    dt,
    f_nodal=None,
):
    if kind == "heat":
        return build_heat_system(xpart, rho_e, elastic_e, g0, dt, f_nodal)
    if kind == "wave":
        return build_wave_system(xpart, rho_e, elastic_e, g0, dt, f_nodal)
    raise ValueError(f"unknown kind {kind!r}")


def static_compliance(xpart, elastic_e) -> jnp.ndarray:
    """Tip deflection/temperature-rise per unit boundary input:
    R = sum_e h_e / E_e (series resistance of the rod)."""
    h = jnp.diff(xpart)
    return jnp.sum(h / elastic_e)


def control_scale(kind: str, xpart, elastic_e, field_span: float) -> jnp.ndarray:
    """Control bound so a constant input can move the tip by ``field_span``.

    field_span defaults: heat 300 (K around the boundary temperature — spec
    profiles in the corpus sit within ~±200 K of g0), wave 10 (mm — spec
    profiles are ±~2 mm).
    """
    r = static_compliance(xpart, elastic_e)
    return jnp.asarray(field_span) / r


_DEFAULT_FIELD_SPAN = {"heat": 300.0, "wave": 10.0}


def problem_from_program(
    prog: FemProgram,
    max_steps: int | None = None,
    dtype=np.float32,
) -> DiscreteSystem:
    """Lower a parsed coder program to a `DiscreteSystem`.

    ``max_steps`` pads the time axis so problems with different horizons
    batch together; steps beyond ``n_steps`` are masked out of robustness
    windows via `trajectory_times`.
    """
    n = prog.n_elements
    xpart = np.linspace(0.0, prog.length, n + 1).astype(dtype)
    mids = 0.5 * (xpart[:-1] + xpart[1:])
    rho_e = np.array([prog.rho(float(x)) for x in mids], dtype=dtype)
    elastic_e = np.array([prog.elastic(float(x)) for x in mids], dtype=dtype)
    g0 = dtype(prog.g0 if prog.g0 is not None else 0.0)

    n_steps = int(round(prog.t_final / prog.dt))
    if max_steps is None:
        max_steps = n_steps
    if n_steps > max_steps:
        raise ValueError(f"n_steps {n_steps} > max_steps {max_steps}")

    a_d, b_d, c_d, x0 = build_system(
        prog.kind, jnp.asarray(xpart), jnp.asarray(rho_e), jnp.asarray(elastic_e),
        jnp.asarray(g0), jnp.asarray(dtype(prog.dt)),
    )
    u_scale = control_scale(
        prog.kind, jnp.asarray(xpart), jnp.asarray(elastic_e),
        _DEFAULT_FIELD_SPAN[prog.kind],
    )
    return DiscreteSystem(
        a_d=a_d,
        b_d=b_d,
        c_d=c_d,
        x0=x0,
        g0=jnp.asarray(g0),
        xs=jnp.asarray(xpart),
        dt=jnp.asarray(dtype(prog.dt)),
        n_steps=jnp.asarray(n_steps, dtype=jnp.int32),
        u_scale=u_scale.astype(dtype),
        spectral=spectral_ops(a_d, b_d, c_d, x0),
        n_out=n,
    )


@jax.jit
def _batch_build_heat(xpart, rho_e, elastic_e, g0, dt):
    a, b, c, x0 = jax.vmap(build_heat_system)(xpart, rho_e, elastic_e, g0, dt)
    u = jax.vmap(lambda xp, e: control_scale(
        "heat", xp, e, _DEFAULT_FIELD_SPAN["heat"]))(xpart, elastic_e)
    return a, b, c, x0, u


@jax.jit
def _batch_build_wave(xpart, rho_e, elastic_e, g0, dt):
    a, b, c, x0 = jax.vmap(build_wave_system)(xpart, rho_e, elastic_e, g0, dt)
    u = jax.vmap(lambda xp, e: control_scale(
        "wave", xp, e, _DEFAULT_FIELD_SPAN["wave"]))(xpart, elastic_e)
    return a, b, c, x0, u


def _spectral_ops_batched(a_d, b_d, c_d, x0) -> SpectralOps:
    """Batched host-side eigendecomposition ([B,S,S] etc, numpy eig)."""
    a = np.asarray(a_d, np.float64)
    lam, v = np.linalg.eig(a)  # [B,S], [B,S,S]
    v_inv = np.linalg.inv(v)
    beta = np.einsum("bij,bj->bi", v_inv, np.asarray(b_d, np.float64))
    gamma = np.einsum("bij,bj->bi", v_inv, np.asarray(c_d, np.float64))
    z0 = np.einsum("bij,bj->bi", v_inv, np.asarray(x0, np.float64))

    def sp(x):
        return (jnp.asarray(np.real(x), jnp.float32),
                jnp.asarray(np.imag(x), jnp.float32))

    return SpectralOps(*sp(lam), *sp(v), *sp(beta), *sp(gamma), *sp(z0))


def problems_from_programs(
    progs, max_steps: int, dtype=np.float32
) -> DiscreteSystem:
    """Batched lowering: same-family programs -> ONE stacked `DiscreteSystem`.

    Equivalent to ``stack_systems([problem_from_program(p) ...])`` but does
    the FEM assembly in one jitted vmap dispatch and the eigendecomposition
    as one batched ``np.linalg.eig`` — per-program host/device round trips
    (~0.2 s each through the device tunnel) collapse to a handful of batched
    transfers.  This is the hot path for datagen-scale utility scoring.
    """
    kind = progs[0].kind
    n = progs[0].n_elements
    if any(p.kind != kind or p.n_elements != n for p in progs):
        raise ValueError("programs must share kind and n_elements")

    xpart = np.stack([np.linspace(0.0, p.length, n + 1) for p in progs]
                     ).astype(dtype)
    mids = 0.5 * (xpart[:, :-1] + xpart[:, 1:])
    rho_e = np.stack([[p.rho(float(x)) for x in row]
                      for p, row in zip(progs, mids)]).astype(dtype)
    elastic_e = np.stack([[p.elastic(float(x)) for x in row]
                          for p, row in zip(progs, mids)]).astype(dtype)
    g0 = np.asarray([p.g0 if (p.kind == "heat" and p.g0 is not None) else 0.0
                     for p in progs], dtype)
    dt = np.asarray([p.dt for p in progs], dtype)
    n_steps = np.asarray([int(round(p.t_final / p.dt)) for p in progs],
                         np.int32)
    if int(n_steps.max()) > max_steps:
        raise ValueError(f"n_steps {int(n_steps.max())} > max_steps {max_steps}")

    build = _batch_build_heat if kind == "heat" else _batch_build_wave
    a_d, b_d, c_d, x0, u_scale = build(xpart, rho_e, elastic_e, g0, dt)
    return DiscreteSystem(
        a_d=a_d, b_d=b_d, c_d=c_d, x0=x0,
        g0=jnp.asarray(g0), xs=jnp.asarray(xpart), dt=jnp.asarray(dt),
        n_steps=jnp.asarray(n_steps), u_scale=u_scale,
        spectral=_spectral_ops_batched(a_d, b_d, c_d, x0), n_out=n,
    )


def take_systems(stacked: DiscreteSystem, idx) -> DiscreteSystem:
    """Gather rows of a stacked `DiscreteSystem` (on-device fancy index)."""
    idx = jnp.asarray(idx)
    gather = lambda x: jnp.take(x, idx, axis=0)
    spectral = (None if stacked.spectral is None
                else jax.tree.map(gather, stacked.spectral))
    fields = ("a_d", "b_d", "c_d", "x0", "g0", "xs", "dt", "n_steps",
              "u_scale")
    leaves = {f: gather(getattr(stacked, f)) for f in fields}
    return DiscreteSystem(n_out=stacked.n_out, spectral=spectral, **leaves)


def stack_systems(systems) -> DiscreteSystem:
    """Stack same-family `DiscreteSystem`s into leading-batch-dim arrays."""
    n_out = systems[0].n_out
    if any(s.n_out != n_out for s in systems):
        raise ValueError("cannot stack systems with different n_out")
    fields = ("a_d", "b_d", "c_d", "x0", "g0", "xs", "dt", "n_steps", "u_scale")
    leaves = {f: jnp.stack([getattr(s, f) for s in systems]) for f in fields}
    spectral = None
    if all(s.spectral is not None for s in systems):
        spectral = jax.tree.map(lambda *xs: jnp.stack(xs),
                                *[s.spectral for s in systems])
    return DiscreteSystem(n_out=n_out, spectral=spectral, **leaves)


_FAR_FUTURE = 1e30


def trajectory_times(dt, n_steps, max_steps: int):
    """Time stamps ``[max_steps+1]`` with invalid (padded) steps pushed to
    +inf so they never enter any clause window."""
    k = jnp.arange(max_steps + 1)
    ts = k.astype(jnp.float32) * dt
    return jnp.where(k <= n_steps, ts, _FAR_FUTURE)
