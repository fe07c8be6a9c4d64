"""LM-stack benchmark: train-step and decode throughput on the live device.

Secondary benchmark (the headline is bench.py's solves/sec): measures the
SFT step in tokens/s with MFU, and the inference engine's decode rate.
Run with a preset name:

    python benchmarks/bench_lm.py SMALL
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import jax
import jax.numpy as jnp
import numpy as np

import pdec.models.config as configs
from pdec.models.transformer import init_params
from pdec.runtime.profiling import train_step_cost
from pdec.train.optim import TrainConfig
from pdec.train.sft import make_sft_step


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "SMALL"
    cfg = getattr(configs, preset)
    micro_b = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    seq = int(sys.argv[3]) if len(sys.argv) > 3 else min(cfg.max_seq, 1024)
    accum = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    params = init_params(jax.random.PRNGKey(0), cfg)
    tcfg = TrainConfig(total_steps=100, grad_accum=accum)
    init_fn, step_fn = make_sft_step(cfg, tcfg, train_lora=False)
    opt_state = init_fn(params, None)
    tokens = jnp.ones((accum, micro_b, seq), jnp.int32)
    batch = {"input_ids": tokens, "labels": tokens}
    step = jax.jit(step_fn)

    params, _, opt_state, m = step(params, None, opt_state, batch)
    _ = float(np.asarray(m["loss"]))  # compile + barrier
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        params, _, opt_state, m = step(params, None, opt_state, batch)
        _ = float(np.asarray(m["loss"]))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    toks = accum * micro_b * seq
    cost = train_step_cost(cfg, toks)
    flops = cost["step_flops"]
    # v5e peak ~197 TFLOP/s bf16
    mfu = flops / dt / 197e12
    print(
        f"train[{preset}] {toks/dt:,.0f} tok/s | {dt*1000:.1f} ms/step | "
        f"params {cost['params']/1e6:.1f}M | MFU {mfu*100:.1f}%", flush=True,
    )


if __name__ == "__main__":
    main()
