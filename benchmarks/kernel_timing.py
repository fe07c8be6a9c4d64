"""Time the lane rollout kernel fwd/bwd in isolation on device."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time
import jax, jax.numpy as jnp, numpy as np
from pdec.ops.rollout_lanes import pack_lanes, rollout_lanes

INST, S, N_CHUNKS, CHUNK, STRIDE, S_PAD = 3072, 30, 20, 16, 4, 32
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 5)
a = jax.random.normal(ks[0], (INST, S, S)) * 0.01 + jnp.eye(S)[None] * 0.9
args = (pack_lanes(a, S_PAD),
        pack_lanes(jax.random.normal(ks[1], (INST, S)), S_PAD),
        pack_lanes(jax.random.normal(ks[2], (INST, S)) * 0.01, S_PAD),
        pack_lanes(jax.random.normal(ks[3], (INST, S)), S_PAD),
        pack_lanes(jax.random.normal(ks[4], (INST, N_CHUNKS))))

def timeit(name, fn, *xs):
    r = fn(*xs); np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); r = fn(*xs)
        np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1000:.1f} ms", flush=True)

fwd = jax.jit(lambda *xs: rollout_lanes(*xs, CHUNK, STRIDE))
timeit("kernel fwd", fwd, *args)
loss = lambda u: jnp.sum(rollout_lanes(args[0], args[1], args[2], args[3], u, CHUNK, STRIDE))
timeit("kernel fwd+bwd", jax.jit(jax.grad(loss)), args[4])
