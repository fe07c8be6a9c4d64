"""A/B: rollout GEMM precision HIGH (bf16x3) vs HIGHEST (fp32)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import functools, time
import jax, numpy as np

import pdec.physics.rollout as rollout_mod
from bench import build_batch
from pdec.control.synthesis import SynthesisConfig, synthesize_batch

B, MAX_STEPS = 1024, 320
systems, cl, pr = build_batch(B, MAX_STEPS, seed=42)
key = jax.random.PRNGKey(7)
cfg = SynthesisConfig()

def run(name):
    fn = jax.jit(functools.partial(synthesize_batch, max_steps=MAX_STEPS, config=cfg))
    res = fn(systems, cl, pr, key)
    rho = np.asarray(res.robustness)
    t0 = time.perf_counter()
    res = fn(systems, cl, pr, key)
    rho = np.asarray(res.robustness)
    dt = time.perf_counter() - t0
    print(f"{name}: {B/dt:7.1f} solves/s | mean rho {rho.mean():+.5f}", flush=True)
    return rho

r_hi = run("HIGHEST")
# monkeypatch precision and re-jit
import jax.numpy as jnp
orig_dot = jnp.dot
rollout_mod.jax.lax.Precision  # noqa
import pdec.physics.rollout as rm
src_prec = jax.lax.Precision.HIGH
def patched_dot(a, b, **kw):
    kw["precision"] = src_prec
    return orig_dot(a, b, **kw)
rm.jnp = type(sys)("jnp_patch")
for attr in dir(jnp):
    try: setattr(rm.jnp, attr, getattr(jnp, attr))
    except Exception: pass
rm.jnp.dot = patched_dot
r_lo = run("HIGH   ")
d = np.abs(r_hi - r_lo)
print(f"robustness delta: mean {d.mean():.5f} p99 {np.percentile(d,99):.5f} max {d.max():.5f}")
