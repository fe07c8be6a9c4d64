#!/usr/bin/env python
"""Probe aggressive stride/incumbent configs for one family on-chip.

    python benchmarks/stride_probe.py wave
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "wave"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    from bench import build_batch
    from pdec.control.synthesis import SynthesisConfig, synthesize_batch

    base = SynthesisConfig.for_family(kind)
    variants = {
        "family-default": base,
        "sel4": base._replace(sel_stride=4),
        "sel8": base._replace(sel_stride=8),
        "sel4+inc3": base._replace(sel_stride=4, incumbent_every=3),
        "sel4+inc4": base._replace(sel_stride=4, incumbent_every=4),
    }
    systems, cl, pr, max_steps = build_batch(kind, n)
    synth = jax.jit(synthesize_batch, static_argnames=("max_steps", "config"))
    for name, cfg in variants.items():
        res = synth(systems, cl, pr, jax.random.PRNGKey(0),
                    max_steps=max_steps, config=cfg)
        _ = np.asarray(res.robustness)
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            res = synth(systems, cl, pr, jax.random.PRNGKey(i + 1),
                        max_steps=max_steps, config=cfg)
            rho = np.asarray(res.robustness)
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"{kind} {name:18s}: {n / best:8.1f} solves/s  "
              f"feas={float((rho > 0).mean()):.3f} "
              f"mean_rho={float(rho.mean()):+.3f}", flush=True)


if __name__ == "__main__":
    main()
