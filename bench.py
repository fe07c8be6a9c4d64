#!/usr/bin/env python
"""Headline benchmark: STL-constrained control solves/sec on TPU.

Baseline being replaced: the reference solves ONE problem per Gurobi MILP
call on CPU with a 300 s timeout budget and a process pool at 50% of cores
(reference ``simulate_gt.py:62-69``).  North star (BASELINE.md): >=10,000
solves/sec on a v5e-8.  This benchmark runs on whatever chips are visible
(one chip under the driver) and scales the per-chip number in
``vs_baseline`` against a per-chip share of the target (10k / 8 chips).

A "solve" = one full control synthesis: multi-start, temperature-annealed
gradient ascent on smooth robustness over the FEM rollout, returning the
best hard robustness (the MILP-equivalent unit of work).

BOTH PDE families are measured (BASELINE.json configs 1-2 name wave
explicitly): heat (320-step horizon bucket) and wave (896-step bucket,
second-order dynamics) each get half the batch; the headline value is the
combined throughput.  With >1 visible chip the batch is sharded over the
device mesh (per-chip AND aggregate numbers go to stderr).

Prints ONE json line:
  {"metric": ..., "value": N, "unit": "solves/s", "vs_baseline": R}
"""

import json
import os
import random
import sys
import time

# reuse compiled executables across invocations (first compile of the
# synthesis graph over the device tunnel costs ~15 min)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

# env-var config is unreliable under the axon plugin; set explicitly
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def _wait_for_device(budget_s: float = 600.0, poll_s: float = 30.0):
    """The device tunnel drops transiently (measured: multi-hour outage
    mid-round-3); a bench run that lands in such a window should wait a
    bounded time instead of recording a spurious failure.  Probed in a
    SUBPROCESS: a failed in-process backend init is cached by JAX for the
    process lifetime, so only a fresh interpreter can re-test."""
    import subprocess

    t0 = time.time()
    while True:
        try:
            # a failed TPU-plugin init can silently FALL BACK to the CPU
            # backend with returncode 0, so the probe must assert a
            # non-cpu platform is actually present
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import sys, jax; sys.exit(0 if any("
                 "d.platform != 'cpu' for d in jax.devices()) else 1)"],
                capture_output=True, timeout=60,
            )
            ok = probe.returncode == 0
        except subprocess.TimeoutExpired:  # hung tunnel handshake
            ok = False
        if ok:
            return
        if time.time() - t0 > budget_s:
            return  # let the real init raise the genuine error
        print(f"bench: device unavailable; retrying for "
              f"{budget_s - (time.time() - t0):.0f}s more",
              file=sys.stderr, flush=True)
        time.sleep(poll_s)


_wait_for_device()

# horizon buckets: heat t_final <= 15 s at dt 0.05 -> 300 steps; wave
# t_final <= 2.2 s at dt 0.0025 -> 880 steps; both padded to a chunk
# multiple (pdec.data.generator ranges)
FAMILY_STEPS = {"heat": 320, "wave": 896}

# max problems per synthesis dispatch PER CHIP.  Both families use
# 256-problem dispatches: wave at 1024 problems wants 23 GB HBM (> the
# 16 GB v5e chip), and the 1024-problem heat executable costs >40 min of
# XLA compile through the device tunnel (measured round 3) for, at best,
# a modest utilization gain — a benchmark that can spend its whole budget
# compiling is not a benchmark.  The 256-problem graphs compile in ~2 min
# and persist in .jax_cache.
FAMILY_DISPATCH = {"heat": 256, "wave": 256}


def build_batch(kind: str, n_problems: int, seed: int = 0):
    from pdec.data.generator import GeneratorConfig, sample_problem
    from pdec.physics.problem import problem_from_program, stack_systems
    from pdec.stl.ast import compile_spec, stack_specs

    max_steps = FAMILY_STEPS[kind]
    rng = random.Random(seed)
    systems, specs = [], []
    while len(systems) < n_problems:
        nc = rng.choice([1, 2, 3])
        ex = sample_problem(rng, GeneratorConfig(kind=kind, n_clauses=nc))
        n_steps = int(round(ex.program.t_final / ex.program.dt))
        if n_steps > max_steps:
            continue
        systems.append(problem_from_program(ex.program, max_steps=max_steps))
        # corpus formulas have <= 3 clauses; tight padding halves the
        # clause-evaluation work in the synthesis hot loop
        specs.append(compile_spec(ex.formula, max_clauses=4, max_prog=8))
    stacked = stack_systems(systems)
    cl, pr = stack_specs(specs)
    return stacked, jnp.asarray(cl), jnp.asarray(pr), max_steps


def shard_batch(tree, n_chips: int):
    """Shard every batch-leading array leaf over a 1-D device mesh; the
    per-problem vmap is embarrassingly parallel, so XLA partitions the
    whole synthesis with zero cross-chip collectives."""
    if n_chips <= 1:
        return tree
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()), ("b",))

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, NamedSharding(mesh, P("b")))
        return x

    return jax.tree.map(put, tree)


def time_family(kind: str, n_problems: int, config, n_chips: int):
    from pdec.control.synthesis import synthesize_batch

    systems, cl, pr, max_steps = build_batch(kind, n_problems)
    # dispatch-size cap keeps the synthesis graph's HLO temps inside HBM;
    # a family bigger than the cap is timed across several dispatches
    cap = min(FAMILY_DISPATCH[kind] * n_chips, n_problems)
    slices = [
        jax.tree.map(lambda x: x[s:s + cap], (systems, cl, pr))
        for s in range(0, n_problems, cap)
    ]
    slices = [shard_batch(tree, n_chips) for tree in slices]
    key = jax.random.PRNGKey(0)
    synth = jax.jit(synthesize_batch, static_argnames=("max_steps", "config"))

    # Warmup / compile.  np.asarray forces a device->host transfer, which is
    # a reliable completion barrier on every platform (block_until_ready has
    # been observed lying under tunneled/experimental PJRT plugins).
    sy, c, p = slices[0]
    res = synth(sy, c, p, key, max_steps=max_steps, config=config)
    _ = np.asarray(res.robustness)

    times = []
    feas = []
    for i in range(3):
        k = jax.random.PRNGKey(i + 1)
        t0 = time.perf_counter()
        feas = []
        for sy, c, p in slices:
            res = synth(sy, c, p, k, max_steps=max_steps, config=config)
            feas.append(np.asarray(res.robustness) > 0)
        times.append(time.perf_counter() - t0)
    feasible = float(np.mean(np.concatenate(feas)))
    return min(times), times, feasible


def main():
    from pdec.control.synthesis import SynthesisConfig

    n_problems = int(sys.argv[1]) if len(sys.argv) > 1 else 2048

    n_chips = max(jax.device_count(), 1)
    per_family = max(n_problems // 2 // max(n_chips, 1) * n_chips, n_chips)

    stats = {}
    for kind in ("heat", "wave"):
        # the SHIPPED per-family defaults (pinned by tests/test_optimality.py)
        config = SynthesisConfig.for_family(kind)
        best, times, feasible = time_family(kind, per_family, config, n_chips)
        stats[kind] = {
            "n": per_family, "best_s": best, "times": times,
            "solves_per_sec": per_family / best, "feasible_rate": feasible,
        }

    total_n = sum(s["n"] for s in stats.values())
    total_t = sum(s["best_s"] for s in stats.values())
    solves_per_sec = total_n / total_t
    per_chip = solves_per_sec / n_chips
    per_chip_target = 10_000.0 / 8.0  # north star is quoted for v5e-8
    vs_baseline = per_chip / per_chip_target

    print(
        json.dumps(
            {
                "metric": "stl_control_solves_per_sec",
                "value": round(solves_per_sec, 2),
                "unit": "solves/s",
                "vs_baseline": round(vs_baseline, 4),
                # per-family rates: wave's 896-step second-order horizon
                # is ~2.6x heat's cost per solve, so the combined 50/50
                # number is not comparable to a heat-only figure
                "heat_solves_per_sec": round(stats["heat"]["solves_per_sec"], 2),
                "wave_solves_per_sec": round(stats["wave"]["solves_per_sec"], 2),
            }
        )
    )
    # Diagnostics on stderr (driver parses stdout).
    for kind, s in stats.items():
        print(
            f"# {kind}: n={s['n']} best={s['best_s']:.3f}s "
            f"{s['solves_per_sec']:.1f} solves/s "
            f"times={[round(t, 3) for t in s['times']]} "
            f"feasible_rate={s['feasible_rate']:.3f}",
            file=sys.stderr,
        )
    print(
        f"# chips={n_chips} aggregate={solves_per_sec:.1f} solves/s "
        f"per_chip={per_chip:.1f} solves/s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
