"""pdec — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of PDE-Controller.

PDE-Controller (reference: delta-lab-ai/pde-controller) is a three-model LLM
pipeline (translator / coder / controller) for autoformalizing and solving
STL-constrained control problems over 1-D PDEs (heat and wave equations).

This package re-designs every layer of that system TPU-first:

- ``pdec.physics``  — 1-D FEM semi-discretization of heat/wave rods as
  jit-compiled LTI systems rolled out with ``lax.scan`` (replaces the
  external Python-2 Femformal backend, reference
  ``test/PDEcontrol/evaluation/eval/eval_robustness_wrapper.py:5``).
- ``pdec.stl``      — SSTL ASTs, parsers (LaTeX dialect + femformal ``cspec``
  dialect + the femformal-python program dialect) and hard/smooth robustness
  semantics as pure jittable functions (replaces the Gurobi MILP encoding).
- ``pdec.control``  — gradient-based control synthesis on smooth robustness,
  multi-start batched with ``vmap`` (replaces the Gurobi MILP solver).
- ``pdec.models``   — decoder-only LM (Llama-family) in JAX with Pallas
  attention and LoRA (replaces HF/torch + flash-attn-2).
- ``pdec.train``    — pjit SFT + DPO training loops with FSDP-style sharding
  (replaces torchrun + DeepSpeed ZeRO-3 + NCCL).
- ``pdec.infer``    — batched generation engine with KV cache (replaces vLLM).
- ``pdec.data``     — prompt construction, tokenization, packing, balancing
  (reference ``train/scripts/utils/loader.py``).
- ``pdec.eval``     — answer extraction + metric engine (robustness, IoU,
  edit distance, perplexity) (reference
  ``test/PDEcontrol/evaluation/eval/eval_script.py``).
- ``pdec.pipeline`` — the 3-role orchestration, sweeps, in-training
  validation (reference ``run_testing.sh``, ``train/validate.py``).
- ``pdec.runtime``  — config tree, logging, checkpointing, mesh setup.
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache for EVERY pdec entry point (first
# compile of the synthesis graph over the device tunnel costs ~15 min;
# without this only bench.py reused executables across processes).  The
# env var must be staged before the first backend initialization; the
# explicit config.update follows at import-jax time because env-var
# config has been observed unreliable under the axon PJRT plugin.
import os as _os

_cache = _os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "..",
                  ".jax_cache"),
)
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def _configure_jax_cache():
    try:
        import jax

        # NEVER enable the persistent cache for CPU runs: XLA:CPU AOT
        # executables bake in the compile host's ISA features, and this
        # VM migrates between host generations across sessions —
        # deserializing an entry written on a different host segfaults
        # inside compilation_cache.get_executable_and_time (reproduced on
        # three full test-suite runs, round 5; the crash site is a
        # poisoned .jax_cache entry hit by tests/test_train.py's sharded
        # pjit).  TPU executables are serialized by the device backend
        # and are host-independent, so the cache stays on there — it is
        # what makes tunnel recompiles tolerable.
        plats = (_os.environ.get("JAX_PLATFORMS") or "").lower()
        if "cpu" in plats.replace(";", ",").split(","):
            return
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - jax absent or too old
        pass


_configure_jax_cache()
