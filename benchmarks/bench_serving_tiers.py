"""Protocol-shaped serving-tier comparison: sharded vs continuous vs paged.

VERDICT r4 weak #5: `pdec/infer/{continuous,paged}.py` are correctness-
tested but never serve the protocol; settle the serving-tier story with a
measured comparison on the SAME cell and model, at mixed prompt lengths
(half 0-shot, half 2-shot `nl_to_python` prompts from heat_nc1 — the mix
where slot-reuse scheduling should matter most: sequences finish at
different times, so a static batch strands capacity while the queue
waits).

    python benchmarks/bench_serving_tiers.py [root=runs/real] [preset=BASE] [n=128]

Writes one markdown table to stdout and a JSON artifact next to PERF.md
(docs/serving_tiers.json).  Second pass per engine is reported (first pass
pays XLA compile).
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
_CACHE = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

ROOT = sys.argv[1] if len(sys.argv) > 1 else "runs/real"
PRESET = sys.argv[2] if len(sys.argv) > 2 else "BASE"
N = int(sys.argv[3]) if len(sys.argv) > 3 else 128
MAX_NEW = int(os.environ.get("MAX_NEW", 256))
MAX_LEN = int(os.environ.get("MAX_LEN", 1024))

import pdec.models.config as model_configs
from pdec.cpp.tokenizer import NativeBPETokenizer
from pdec.data.prompts import FewShotBank
from pdec.infer.continuous import ContinuousEngine
from pdec.infer.engine import GenerationConfig
from pdec.infer.paged import PagedEngine
from pdec.infer.sharded import ShardedEngine
from pdec.parallel.mesh import MeshConfig, make_mesh
from pdec.runtime.checkpoint import CheckpointManager


def load_coder():
    tok = NativeBPETokenizer.load(os.path.join(ROOT, "tokenizer.json"))
    cfg = dataclasses.replace(
        getattr(model_configs, PRESET), vocab_size=tok.vocab_size)
    ckpt = CheckpointManager(os.path.join(ROOT, "coder"))
    latest = ckpt.find_latest()
    if latest is None:
        raise SystemExit(f"no coder checkpoint under {ROOT}")
    params = ckpt.restore_weights(latest)["params"]
    print(f"coder: {latest}", flush=True)
    return params, cfg, tok


def build_prompts():
    items = [json.loads(l) for l in open("datasets/test/heat_nc1_512/test.jsonl")][:N]
    # the exact bank the sweep's to_python_no_STL arm serves (train-style
    # prompts: the from-scratch coder saw this format in training)
    b0 = FewShotBank("nl_to_python", num_shots=0, dataset="combined")
    b2 = FewShotBank("nl_to_python", num_shots=2, dataset="combined")
    return [
        (b2 if i % 2 else b0).format_prompt(nl=it["nl"])
        for i, it in enumerate(items)
    ]


def run(name, engine, prompts, gen):
    out = None
    for rep in range(2):
        t0 = time.perf_counter()
        out = engine.generate(list(prompts), gen)
        dt = time.perf_counter() - t0
    ntok = sum(len(g.token_ids) for g in out)
    stops = sum(1 for g in out if g.finish_reason in ("stop", "eos"))
    return {"engine": name, "wall_s": round(dt, 2),
            "tok": ntok, "tok_s": round(ntok / dt, 1),
            "stop_frac": round(stops / len(out), 3)}


def main():
    params, cfg, tok = load_coder()
    prompts = build_prompts()
    lens = sorted(len(tok.encode(p)) for p in prompts)
    print(f"n={len(prompts)} prompt tokens p10/p50/p90 = "
          f"{lens[len(lens)//10]}/{lens[len(lens)//2]}/{lens[-len(lens)//10]}",
          flush=True)
    gen = GenerationConfig(max_new_tokens=MAX_NEW, temperature=0.2,
                           stop=("\n### Instruction:", "### Instruction:"),
                           seed=0)
    mesh = make_mesh(MeshConfig())
    rows = []
    tiers = [
        ("sharded (default)",
         lambda: ShardedEngine(params, cfg, tok, mesh, max_len=MAX_LEN)),
        ("continuous n_slots=16",
         lambda: ContinuousEngine(params, cfg, tok, n_slots=16,
                                  max_len=MAX_LEN)),
        ("paged n_slots=16",
         lambda: PagedEngine(params, cfg, tok, n_slots=16,
                             max_len=MAX_LEN)),
    ]
    for name, mk in tiers:
        try:
            rows.append(run(name, mk(), prompts, gen))
        except Exception as e:
            rows.append({"engine": name, "error": str(e)[:200]})
        print(rows[-1], flush=True)

    print("\n| engine | wall s | gen tok | tok/s | stop frac |")
    print("|---|---|---|---|---|")
    for r in rows:
        if "error" in r:
            print(f"| {r['engine']} | FAILED: {r['error'][:60]} | | | |")
        else:
            print(f"| {r['engine']} | {r['wall_s']} | {r['tok']} "
                  f"| {r['tok_s']} | {r['stop_frac']} |")
    out = {"preset": PRESET, "root": ROOT, "n": N, "max_new": MAX_NEW,
           "rows": rows}
    with open("docs/serving_tiers.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote docs/serving_tiers.json")


if __name__ == "__main__":
    main()
