"""Prefix-cache prefill gain on the live chip (PERF.md section 5).

Few-shot eval prompts share the example-bank preamble across every row of
a cell; `ShardedEngine` prefills the shared prefix once and broadcasts
the KV (`pdec/infer/sharded.py`). The round-3 measurement was
CPU-indicative only — this bench produces the TPU number: batch of
prompts sharing `SHARED` tokens with short unique tails, `max_new=1` so
prefill dominates, cache on vs off.

    python benchmarks/bench_prefix_cache.py [preset] [batch] [shared]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
_CACHE = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import pdec.models.config as configs
from pdec.infer.engine import GenerationConfig
from pdec.infer.sharded import ShardedEngine
from pdec.models.transformer import init_params
from pdec.parallel.mesh import MeshConfig, make_mesh

PRESET = sys.argv[1] if len(sys.argv) > 1 else "MID"
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 64
SHARED = int(sys.argv[3]) if len(sys.argv) > 3 else 448

cfg = getattr(configs, PRESET)
params = init_params(jax.random.PRNGKey(0), cfg)
mesh = make_mesh(MeshConfig(data=1, fsdp=1, tp=jax.device_count()))


class PrefixTok:
    """Deterministic stub: every prompt = SHARED common tokens + a unique
    12-token tail derived from the text (prefill timing needs shapes and
    sharing structure, not real text)."""

    eos_token_id = -1

    def encode(self, t):
        tail = [2 + (ord(c) + i) % 97 for i, c in enumerate(t[-12:])]
        return [1] * SHARED + tail

    def decode(self, ids):
        return "x" * len(ids)


prompts = [f"prompt-{i:04d}-{i * 7919 % 10007}" for i in range(BATCH)]
gen = GenerationConfig(max_new_tokens=1, temperature=0.0)

print(f"preset={PRESET} batch={BATCH} shared={SHARED} "
      f"devices={jax.device_count()}", flush=True)
for cache in (False, True):
    eng = ShardedEngine(params, cfg, PrefixTok(), mesh, prefix_cache=cache)
    eng.generate(prompts, gen)  # compile + warm
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        eng.generate(prompts, gen)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"prefix_cache={cache}: {dt:8.1f} ms/prefill batch", flush=True)
