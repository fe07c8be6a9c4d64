"""Validate + time the Pallas flash attention kernel on the real TPU."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time
import jax, jax.numpy as jnp, numpy as np
from pdec.ops.attention import attention_reference
from pdec.ops.flash_attention import flash_attention

B, T, H, KV, D = 4, 2048, 16, 8, 128
key = jax.random.PRNGKey(0)
q = jax.random.normal(key, (B, T, H, D), jnp.bfloat16)
k = jax.random.normal(jax.random.PRNGKey(1), (B, T, KV, D), jnp.bfloat16)
v = jax.random.normal(jax.random.PRNGKey(2), (B, T, KV, D), jnp.bfloat16)

ref = attention_reference(q, k, v, causal=True)
out = flash_attention(q, k, v, causal=True)
d = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
print("maxdiff", d.max(), "mean", d.mean(), flush=True)

f = jax.jit(lambda q, k, v: flash_attention(q, k, v, causal=True))
r = jax.jit(lambda q, k, v: attention_reference(q, k, v, causal=True))
for name, fn in (("flash", f), ("xla-ref", r)):
    o = fn(q, k, v); np.asarray(o).ravel()[:1]
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); o = fn(q, k, v)
        np.asarray(jnp.sum(o))  # scalar barrier (avoid tunnel transfer)
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1000:.1f} ms", flush=True)
