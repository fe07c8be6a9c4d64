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
