import sys
sys.path.insert(0, "/root/repo")
import functools, time
import jax, numpy as np
from bench import build_batch
from pdec.control.lanes import synthesize_batch_lanes
from pdec.control.synthesis import SynthesisConfig

B, MAX_STEPS = int(sys.argv[1]), 320
systems, cl, pr = build_batch(B, MAX_STEPS, seed=42)
key = jax.random.PRNGKey(7)
cfg = SynthesisConfig()
fn = jax.jit(functools.partial(synthesize_batch_lanes, max_steps=MAX_STEPS, config=cfg))
print("compiling...", flush=True)
res = fn(systems, cl, pr, key)
rho = np.asarray(res.robustness)
print("compiled; first result ok", flush=True)
t0 = time.perf_counter()
res = fn(systems, cl, pr, key)
rho = np.asarray(res.robustness)
dt = time.perf_counter() - t0
print(f"lanes: {B/dt:.1f} solves/s ({dt:.2f}s) mean rho {rho.mean():+.4f} feasible {(rho>0).mean():.3f}", flush=True)
