"""Incremental on-device smoke test of the lane rollout kernel."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax, jax.numpy as jnp, numpy as np
from pdec.ops.rollout_lanes import (
    pack_lanes, rollout_lanes, rollout_lanes_reference,
)

stage = sys.argv[1] if len(sys.argv) > 1 else "fwd_small"

def mk(n_inst, s, n_chunks, chunk, s_pad):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    a = jax.random.normal(ks[0], (n_inst, s, s)) * (0.5 / s) + jnp.eye(s)[None] * 0.7
    b = jax.random.normal(ks[1], (n_inst, s))
    c = jax.random.normal(ks[2], (n_inst, s)) * 0.1
    x0 = jax.random.normal(ks[3], (n_inst, s))
    u = jax.random.normal(ks[4], (n_inst, n_chunks))
    return (pack_lanes(a, s_pad), pack_lanes(b, s_pad), pack_lanes(c, s_pad),
            pack_lanes(x0, s_pad), pack_lanes(u))

if stage == "fwd_small":
    args = mk(128, 8, 4, 8, 8)
    chunk, stride = 8, 4
elif stage == "fwd_real":
    args = mk(256, 30, 20, 16, 32)
    chunk, stride = 16, 4
elif stage == "bwd_small":
    args = mk(128, 8, 4, 8, 8)
    chunk, stride = 8, 4
elif stage == "bwd_real":
    args = mk(256, 30, 20, 16, 32)
    chunk, stride = 16, 4

if stage.startswith("fwd"):
    got = np.asarray(rollout_lanes(*args, chunk, stride))
    ref = np.asarray(rollout_lanes_reference(*args, chunk, stride))
    print("maxdiff", np.abs(got - ref).max(), "shape", got.shape)
else:
    def loss_k(u):
        y = rollout_lanes(args[0], args[1], args[2], args[3], u, chunk, stride)
        return jnp.sum(y * jnp.sin(jnp.arange(y.size).reshape(y.shape) * 0.01))
    def loss_r(u):
        y = rollout_lanes_reference(args[0], args[1], args[2], args[3], u, chunk, stride)
        return jnp.sum(y * jnp.sin(jnp.arange(y.size).reshape(y.shape) * 0.01))
    gk = np.asarray(jax.grad(loss_k)(args[4]))
    gr = np.asarray(jax.grad(loss_r)(args[4]))
    print("grad maxdiff", np.abs(gk - gr).max(), "ref scale", np.abs(gr).max())
print("OK", stage)
