"""Isolate the pathological backward inside the spatial softmin."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time
import jax, jax.numpy as jnp, numpy as np
from jax.scipy.special import logsumexp

B, T, X = 2048 * 8, 321, 31
key = jax.random.PRNGKey(0)
traj = jax.random.normal(key, (B, T, X)) * 10 + 300
xs = jnp.linspace(0, 100, X)
tau = 0.5


def timeit(name, fn, *args):
    r = fn(*args); np.asarray(jax.tree.leaves(r)[0])
    times = []
    for _ in range(3):
        t0 = time.perf_counter(); r = fn(*args); np.asarray(jax.tree.leaves(r)[0])
        times.append(time.perf_counter() - t0)
    print(f"{name}: {min(times)*1000:.1f} ms")


mask = (xs >= 20) & (xs <= 80)

def v1_plain_lse(traj):
    z = traj - (0.1 * xs + 300)[None, None, :]
    out = -tau * logsumexp(-z / tau, axis=2)
    return jnp.sum(out)

def v2_lse_where(traj):
    z = traj - (0.1 * xs + 300)[None, None, :]
    out = -tau * logsumexp(-z / tau, axis=2, where=mask[None, None, :])
    return jnp.sum(out)

def v3_select(traj):
    z = traj - (0.1 * xs + 300)[None, None, :]
    cmp = jnp.float32(0.0)
    z = jnp.select([cmp == 0, cmp == 1, cmp == 4], [z, -z, -jnp.abs(z)], default=z)
    return jnp.sum(-tau * logsumexp(-z / tau, axis=2))

def v4_interp(traj):
    xq = jnp.stack([jnp.float32(22.3), jnp.float32(77.7)])
    h = xs[1] - xs[0]
    w = jnp.maximum(0.0, 1.0 - jnp.abs(jnp.clip(xq, xs[0], xs[-1])[:, None] - xs[None, :]) / h)
    w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-9)
    u = jnp.einsum("btx,qx->btq", traj, w)
    return jnp.sum(-tau * logsumexp(-u / tau, axis=2))

def v5_where_manual(traj):
    z = traj - (0.1 * xs + 300)[None, None, :]
    zm = jnp.where(mask[None, None, :], -z / tau, -1e30)
    m = jax.lax.stop_gradient(jnp.max(zm, axis=2, keepdims=True))
    out = -tau * (jnp.log(jnp.sum(jnp.exp(zm - m), axis=2)) + m[..., 0])
    return jnp.sum(out)

for name, fn in [("plain lse", v1_plain_lse), ("lse where", v2_lse_where),
                 ("select", v3_select), ("interp", v4_interp),
                 ("manual masked lse", v5_where_manual)]:
    timeit(f"{name} fwd", jax.jit(fn), traj)
    timeit(f"{name} bwd", jax.jit(jax.grad(fn)), traj)
