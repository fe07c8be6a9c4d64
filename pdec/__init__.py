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
