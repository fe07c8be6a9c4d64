"""Bisect the lanes objective per-iteration cost."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time, functools
import jax, jax.numpy as jnp, numpy as np
from bench import build_batch
from pdec.control.synthesis import SynthesisConfig, _field_scale
from pdec.ops.rollout_lanes import pack_lanes, rollout_lanes, unpack_lanes
from pdec.physics.problem import trajectory_times
from pdec.stl.semantics import smooth_robustness

B, MAX_STEPS = 512, 320
systems, cl, pr = build_batch(B, MAX_STEPS, seed=42)
cfg = SynthesisConfig()
n_starts, stride, chunk = cfg.n_starts, cfg.eval_stride, cfg.chunk
inst = B * n_starts
n_chunks = MAX_STEPS // chunk
t_out = MAX_STEPS // stride
s_pad = 32
n_out = systems.n_out

rep = lambda x: jnp.repeat(x, n_starts, axis=0)
a_l = pack_lanes(rep(systems.a_d), s_pad)
b_l = pack_lanes(rep(systems.b_d), s_pad)
c_l = pack_lanes(rep(systems.c_d), s_pad)
x0_l = pack_lanes(rep(systems.x0), s_pad)
ts_full = jax.vmap(lambda dt, ns: trajectory_times(dt, ns, MAX_STEPS))(systems.dt, systems.n_steps)
ts_s = rep(ts_full[:, stride::stride])
xs_i = rep(systems.xs); g0_i = rep(systems.g0); us_i = rep(systems.u_scale)
cl_i = rep(cl); pr_i = rep(pr)
theta = jax.random.normal(jax.random.PRNGKey(0), (inst, n_chunks)) * 0.3

def rollout_part(theta):
    u = us_i[:, None] * jnp.tanh(theta)
    y = rollout_lanes(a_l, b_l, c_l, x0_l, pack_lanes(u), chunk, stride)
    return jnp.sum(unpack_lanes(y, inst))

def full_obj(theta):
    u = us_i[:, None] * jnp.tanh(theta)
    y = rollout_lanes(a_l, b_l, c_l, x0_l, pack_lanes(u), chunk, stride)
    states = unpack_lanes(y, inst)
    fields = jnp.concatenate([jnp.broadcast_to(g0_i[:, None, None], (inst, t_out, 1)), states[:, :, :n_out]], axis=2)
    rhos = jax.vmap(smooth_robustness, in_axes=(0,0,0,0,0,None))(fields, ts_s, xs_i, cl_i, pr_i, 0.5)
    return -jnp.sum(rhos)

def rob_only(fields):
    rhos = jax.vmap(smooth_robustness, in_axes=(0,0,0,0,0,None))(fields, ts_s, xs_i, cl_i, pr_i, 0.5)
    return -jnp.sum(rhos)

def timeit(name, fn, *xs):
    r = fn(*xs); np.asarray(jax.tree.leaves(r)[0]).ravel()[:1] if hasattr(jax.tree.leaves(r)[0], 'ravel') else r
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); r = fn(*xs)
        jax.tree.leaves(r)[0].block_until_ready() if False else np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1000:.1f} ms", flush=True)

fields0 = jnp.zeros((inst, t_out, n_out + 1)) + 300.0
timeit("rollout-part grad", jax.jit(jax.grad(rollout_part)), theta)
timeit("full objective grad", jax.jit(jax.grad(full_obj)), theta)
timeit("robustness-only grad", jax.jit(jax.grad(rob_only)), fields0)
