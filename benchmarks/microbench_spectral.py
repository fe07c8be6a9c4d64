#!/usr/bin/env python
"""A/B the chunk-boundary trajectory strategies inside the synthesis hot
loop shape: grad-of-smooth-robustness at the anneal stride and hard
robustness at stride 1 (the incumbent check), at full lane count
(problems x starts), per family.

    python benchmarks/microbench_spectral.py [n_problems] [n_starts]

Decides `pdec.physics.spectral.TRAJECTORY_MODE` (see docs/PERF.md).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from pdec.physics.problem import trajectory_times
from pdec.physics.spectral import spectral_tables, spectral_trajectory_strided
from pdec.stl.semantics import robustness, smooth_robustness

FAMILY_STEPS = {"heat": 320, "wave": 896}
CHUNK = 16


def build(kind, n_problems):
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import build_batch

    return build_batch(kind, n_problems)


def run(kind, n_problems=256, n_starts=7, iters=30):
    systems, cl, pr, max_steps = build(kind, n_problems)
    n_chunks = max_steps // CHUNK
    key = jax.random.PRNGKey(0)
    theta = jax.random.normal(key, (n_problems, n_starts, n_chunks)) * 0.5

    results = {}
    for mode in ("scan", "ascan", "toeplitz"):
        def one_problem(sys_i, cl_i, pr_i, th_i, stride, hard):
            tb = spectral_tables(sys_i.spectral, CHUNK, stride, n_chunks)
            ts = trajectory_times(sys_i.dt, sys_i.n_steps, max_steps)
            ts_s = ts[::stride]

            def score(t1):
                traj = spectral_trajectory_strided(
                    sys_i.spectral, sys_i.u_scale * jnp.tanh(t1), sys_i.g0,
                    sys_i.n_out, CHUNK, stride, tables=tb, mode=mode)
                if hard:
                    return robustness(traj, ts, sys_i.xs, cl_i, pr_i)
                return smooth_robustness(
                    traj, ts_s, sys_i.xs, cl_i, pr_i, 0.05)

            if hard:
                return jax.vmap(score)(th_i)
            return jax.vmap(jax.grad(score))(th_i)

        for label, stride, hard in (("grad_s4", 4, False),
                                    ("hard_s1", 1, True)):
            fn = jax.jit(jax.vmap(
                lambda s, c, p, t: one_problem(s, c, p, t, stride, hard),
                in_axes=(0, 0, 0, 0)))
            out = fn(systems, cl, pr, theta)
            _ = np.asarray(jax.tree.leaves(out)[0])  # barrier
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(systems, cl, pr, theta)
            _ = np.asarray(jax.tree.leaves(out)[0])
            dt = (time.perf_counter() - t0) / iters
            results[(mode, label)] = dt
            print(f"{kind} {mode:9s} {label}: {dt*1e3:8.2f} ms/eval "
                  f"({n_problems}x{n_starts} lanes)", flush=True)
    return results


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    ns = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    for kind in ("wave", "heat"):
        run(kind, n, ns)
