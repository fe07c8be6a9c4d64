#!/usr/bin/env python
"""Dispatch-width scaling study for the synthesis hot path.

Measures end-to-end `synthesize_batch` throughput (shipped defaults) at
several problems-per-dispatch widths per family, on whatever device is
visible.  Decides `FAMILY_DISPATCH` (pdec/control/synthesis.py and
bench.py).  Compile times are reported separately so the persistent-cache
amortization argument is checkable (VERDICT r3 next-steps #2).

    python benchmarks/lane_scaling.py heat 256 512 1024
    python benchmarks/lane_scaling.py wave 256 512
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
    kind = sys.argv[1]
    widths = [int(w) for w in sys.argv[2:]] or [256, 512]

    from bench import build_batch
    from pdec.control.synthesis import SynthesisConfig, synthesize_batch

    config = SynthesisConfig.for_family(kind)
    n_max = max(widths)
    systems, cl, pr, max_steps = build_batch(kind, n_max)
    synth = jax.jit(synthesize_batch, static_argnames=("max_steps", "config"))

    for w in widths:
        sy = jax.tree.map(lambda x: x[:w], systems)
        c, p = cl[:w], pr[:w]
        t0 = time.perf_counter()
        res = synth(sy, c, p, jax.random.PRNGKey(0),
                    max_steps=max_steps, config=config)
        _ = np.asarray(res.robustness)
        compile_s = time.perf_counter() - t0
        times = []
        for i in range(3):
            k = jax.random.PRNGKey(i + 1)
            t0 = time.perf_counter()
            res = synth(sy, c, p, k, max_steps=max_steps, config=config)
            _ = np.asarray(res.robustness)
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"{kind} width={w:5d}: {w / best:8.1f} solves/s  "
              f"best={best:.3f}s times={[round(t, 3) for t in times]} "
              f"first_call={compile_s:.1f}s", flush=True)


if __name__ == "__main__":
    main()
