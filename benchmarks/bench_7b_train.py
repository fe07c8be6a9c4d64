"""7B LoRA train-step throughput on one real chip (int8 frozen base).

The reference trains LoRA adapters (r=64, alpha=256) on its 7B
MathCoder2-DeepSeekMath base across 4xA100-80GB with DeepSpeed ZeRO-3
(``train/scripts/train.sh:85-99``, ``train/config/deepspeed.json:31-42``).
One 16 GiB v5e chip cannot hold the bf16 base (14 GiB) plus activations
and optimizer state — that is the measured HBM wall:

    bf16 base          14.0 GiB
    LoRA r=64 grads+AdamW  ~0.9 GiB (fp32 m+v+grad on 112M adapter params)
    activations (remat, b=1, T=1024)  ~0.9 GiB + logits 0.4 GiB
    total              > 16 GiB  -> OOM before the first step

The deployment answer is the same one the serving tier uses
(`bench_7b_int8.py`): a weight-only int8 frozen base (6.8 GiB) with the
bf16 LoRA delta trained on top — the transformer forward dequantizes
int8 leaves on use (`pdec/models/transformer.py::_maybe_lora`), gradients
flow only to the adapter (`make_sft_step(train_lora=True)`), so the base
never needs a grad or optimizer slot.  QLoRA's recipe, TPU-shaped.

    python benchmarks/bench_7b_train.py [preset] [seq] [steps] [accum]
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
    jax.config.update("jax_platforms", "cpu")

import pdec.models.config as configs
from benchmarks.int8_util import build_int8_params
from pdec.models.lora import init_lora
from pdec.models.quantize import param_bytes
from pdec.train.optim import TrainConfig
from pdec.train.sft import make_sft_step

PRESET = sys.argv[1] if len(sys.argv) > 1 else "DEEPSEEK_7B"
SEQ = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 4
ACCUM = int(sys.argv[4]) if len(sys.argv) > 4 else 1

cfg = getattr(configs, PRESET)

params = build_int8_params(jax.random.PRNGKey(1), cfg)
print(f"{PRESET} int8 base on device: {param_bytes(params) / 2**30:.2f} GiB "
      f"(devices={jax.device_count()})", flush=True)

lora = init_lora(jax.random.PRNGKey(2), cfg, rank=64, alpha=256.0)
n_lora = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(lora))
print(f"LoRA r=64 adapter: {n_lora / 1e6:.1f}M trainable params", flush=True)

train_cfg = TrainConfig(grad_accum=ACCUM)
init_fn, step_fn = make_sft_step(cfg, train_cfg, train_lora=True)
opt_state = init_fn(params, lora)
# donate params too (argnum 0): step_fn passes the frozen base through to
# its outputs, and without input-output aliasing XLA materializes a fresh
# 6.8 GiB copy of the int8 base per call — by the second dispatch three
# copies are transiently alive and the 16 GiB chip OOMs.  The production
# loop donates the whole carry for the same reason (train/loop.py:131).
step = jax.jit(step_fn, donate_argnums=(0, 1, 2))

rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (ACCUM, 1, SEQ)), jnp.int32)
labels = ids.at[:, :, : SEQ // 4].set(-100)  # prompt-masked prefix
batch = {"input_ids": ids, "labels": labels}

params, lora, opt_state, metrics = step(params, lora, opt_state, batch)
np.asarray(metrics["loss"])  # completion barrier (compile step)

t0 = time.perf_counter()
for _ in range(STEPS):
    params, lora, opt_state, metrics = step(params, lora, opt_state, batch)
loss = float(np.asarray(metrics["loss"]))
dt = (time.perf_counter() - t0) / STEPS
tok = ACCUM * SEQ
print(f"seq {SEQ} accum {ACCUM}: {dt:.2f} s/step, {tok / dt:7.0f} tok/s, "
      f"loss {loss:.3f}", flush=True)
