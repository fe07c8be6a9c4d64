"""Decoder-only language models in pure JAX.

Replaces the reference's HF/torch model stack (MathCoder2-DeepSeekMath-7B
loaded bf16 with flash-attn-2, ``train/train_finetune.py:140-144``) with a
TPU-first implementation:

- Llama-family architecture (RMSNorm, RoPE, GQA, SwiGLU) covering the
  DeepSeekMath-7B base used by all three roles (translator/coder/controller),
- parameters as a plain pytree with a declared sharding rule per leaf
  (FSDP/TP via pjit — `pdec.parallel`),
- attention via a Pallas flash kernel on TPU with a reference jnp fallback
  (`pdec.ops.attention`),
- LoRA as a factored side-tree composed at projection time — the DPO
  two-adapter trick (reference ``train/train_dpo.py:146-156``) becomes
  "same base params, with/without the LoRA delta" (`pdec.models.lora`),
- HF safetensors checkpoint import for parity evaluation
  (`pdec.models.hf_import`).
"""

from pdec.models.config import ModelConfig, DEEPSEEK_7B, TINY, SMALL
from pdec.models.transformer import (
    init_params,
    forward,
    loss_fn,
    init_kv_cache,
    param_shardings,
)
from pdec.models.quantize import (
    dequantize_params,
    quantize_params,
)
from pdec.models.lora import (
    init_lora,
    lora_shardings,
    merge_lora,
)

__all__ = [
    "quantize_params",
    "dequantize_params",
    "ModelConfig",
    "DEEPSEEK_7B",
    "TINY",
    "SMALL",
    "init_params",
    "forward",
    "loss_fn",
    "init_kv_cache",
    "param_shardings",
    "init_lora",
    "lora_shardings",
    "merge_lora",
]
