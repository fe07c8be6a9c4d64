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
    "default (40it/6st/p8)": SynthesisConfig(),
    "lean (26it/6st/p6)": SynthesisConfig(n_iters=26, polish_iters=6),
    "leaner (20it/4st/p6)": SynthesisConfig(n_iters=20, n_starts=4, polish_iters=6),
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
