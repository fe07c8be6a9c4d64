"""A/B: lane-major Pallas kernel vs reference synthesis path on device."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools
import time
import jax, numpy as np

from bench import build_batch
from pdec.control.lanes import synthesize_batch_lanes
from pdec.control.synthesis import SynthesisConfig, synthesize_batch

B, MAX_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2048, 320
systems, cl, pr = build_batch(B, MAX_STEPS, seed=42)
key = jax.random.PRNGKey(7)
cfg = SynthesisConfig()


def run(name, fn):
    res = fn(systems, cl, pr, key)
    rho = np.asarray(res.robustness)
    t0 = time.perf_counter()
    res = fn(systems, cl, pr, key)
    rho = np.asarray(res.robustness)
    dt = time.perf_counter() - t0
    print(f"{name}: {B/dt:8.1f} solves/s ({dt:.2f}s) | mean rho "
          f"{rho.mean():+.4f} | feasible {(rho > 0).mean():.3f}")
    return rho


r1 = run("reference path", jax.jit(functools.partial(
    synthesize_batch, max_steps=MAX_STEPS, config=cfg)))
r2 = run("lanes kernel  ", jax.jit(functools.partial(
    synthesize_batch_lanes, max_steps=MAX_STEPS, config=cfg)))
print(f"robustness agreement: mean |delta| {np.abs(r1 - r2).mean():.4f}, "
      f"p95 {np.percentile(np.abs(r1 - r2), 95):.4f}")
