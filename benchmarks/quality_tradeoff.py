"""Synthesis quality vs compute budget: robustness delta across configs."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time
import jax, jax.numpy as jnp, numpy as np

from bench import build_batch
from pdec.control.synthesis import SynthesisConfig, synthesize_batch

B, MAX_STEPS = 512, 320
systems, cl, pr = build_batch(B, MAX_STEPS, seed=42)
key = jax.random.PRNGKey(7)

CONFIGS = {
    "full (60it/8st/s4)": SynthesisConfig(n_iters=60, n_starts=8, eval_stride=4),
    "fast-c16 (40it/6st/s4/c16)": SynthesisConfig(n_iters=40, n_starts=6, eval_stride=4, chunk=16),
    "fast-c32 (40it/6st/s4/c32)": SynthesisConfig(n_iters=40, n_starts=6, eval_stride=4, chunk=32),
    "fast-c64 (40it/6st/s4/c64)": SynthesisConfig(n_iters=40, n_starts=6, eval_stride=4, chunk=64),
}

synth = jax.jit(synthesize_batch, static_argnames=("max_steps", "config"))
base = None
for name, cfg in CONFIGS.items():
    res = synth(systems, cl, pr, key, max_steps=MAX_STEPS, config=cfg)
    rho = np.asarray(res.robustness)
    t0 = time.perf_counter()
    res = synth(systems, cl, pr, key, max_steps=MAX_STEPS, config=cfg)
    rho = np.asarray(res.robustness)
    dt = time.perf_counter() - t0
    if base is None:
        base = rho
    delta = rho - base
    print(f"{name}: {B/dt:7.1f} solves/s | mean rho {rho.mean():8.4f} | "
          f"feasible {(rho>0).mean():.3f} | vs full: mean_delta {delta.mean():+.4f} "
          f"p5_delta {np.percentile(delta,5):+.4f}")
