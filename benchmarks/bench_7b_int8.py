"""7B-config int8 decode throughput on one real chip.

The reference's serving tier is vLLM with optional ``load_in_8bits``
(``eval/utils.py:215-282``, ``run_testing.sh:26-41``) on its 7B
MathCoder2-DeepSeekMath base.  This measures the rebuild's analogue:
DEEPSEEK_7B (30L / d4096 / vocab 102400) with weight-only int8
(`pdec.models.quantize` layout), decoded by the on-device chunked
`ShardedDecoder`.  bf16 7B (14 GB) does not fit a 16 GB v5e chip next to
a KV cache; int8 (~7 GB) does — the deployment config for single-chip
serving.

Weights are constructed DIRECTLY as int8 on device (random content;
throughput does not depend on values) — materializing bf16 first would
OOM the chip, and shipping 7 GB through the host tunnel (~20 MB/s) costs
minutes for nothing.

    python benchmarks/bench_7b_int8.py [preset] [max_new] [batches...]
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
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the env var alone is not honored once the axon plugin registers
    jax.config.update("jax_platforms", "cpu")

import pdec.models.config as configs
from benchmarks.int8_util import build_int8_params
from pdec.models.quantize import param_bytes
from pdec.infer.sharded import ShardedDecoder
from pdec.parallel.mesh import MeshConfig, make_mesh

PRESET = sys.argv[1] if len(sys.argv) > 1 else "DEEPSEEK_7B"
MAX_NEW = int(sys.argv[2]) if len(sys.argv) > 2 else 128
BATCHES = [int(b) for b in sys.argv[3:]] or [8, 32]

cfg = getattr(configs, PRESET)

params = build_int8_params(jax.random.PRNGKey(1), cfg)
gb = param_bytes(params) / 2**30
print(f"{PRESET} int8 params on device: {gb:.2f} GiB "
      f"(devices={jax.device_count()})", flush=True)

mesh = make_mesh(MeshConfig(data=1, fsdp=1, tp=jax.device_count()))
PROMPT = 32

for batch in BATCHES:
    dec = ShardedDecoder(params, cfg, mesh, max_len=PROMPT + MAX_NEW,
                         chunk=32)
    prompt = jnp.ones((batch, PROMPT), jnp.int32)
    valid = jnp.ones((batch, PROMPT), bool)
    ids, n = dec.generate_ids(prompt, valid, MAX_NEW, eos_id=-1)  # compile
    np.asarray(n)  # completion barrier (block_until_ready lies on axon)
    t0 = time.perf_counter()
    ids, n = dec.generate_ids(prompt, valid, MAX_NEW, eos_id=-1)
    n = int(np.asarray(n).max())
    dt = time.perf_counter() - t0
    print(f"batch {batch:4d}: {batch * n / dt:8.0f} tok/s "
          f"({n} steps in {dt:.2f}s)", flush=True)
