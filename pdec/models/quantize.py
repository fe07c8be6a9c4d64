"""Weight-only int8 quantization for inference.

Parity with the reference's 8-bit loaders (``eval/utils.py:215-282``
``load_in_8bits``/gptq switches, ``run_testing.sh:26-41``): the big
projection matrices are stored as int8 with a per-output-channel scale and
dequantized on use.  On TPU the dequant multiply fuses into the consuming
matmul's operand read (XLA), so the win is the one that matters at serving
time: HBM footprint and weight-load bandwidth halve vs bf16 (4x vs f32).

Layout: each quantized leaf becomes ``{"q": int8[..., d, f],
"scale": f32[..., 1, f]}`` (channel = output feature, the standard
weight-only AWQ/RTN granularity).  Norm vectors stay in full precision;
the embedding stays unquantized by default (it is a gather, not a matmul,
and its rows see token-frequency-skewed error).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def quantize_tensor(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Symmetric round-to-nearest int8 over the last (output) axis."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # per out-channel
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale}


def dequantize_tensor(qw: Dict[str, jnp.ndarray], dtype=jnp.bfloat16):
    return (qw["q"].astype(jnp.float32) * qw["scale"]).astype(dtype)


def is_quantized(leaf: Any) -> bool:
    return isinstance(leaf, dict) and set(leaf) == {"q", "scale"}


def quantize_params(params: Dict, quantize_lm_head: bool = True) -> Dict:
    """Quantize the projection matrices of a transformer param tree."""
    out = {k: v for k, v in params.items()}
    out["layers"] = {
        k: (quantize_tensor(v) if k in QUANT_KEYS else v)
        for k, v in params["layers"].items()
    }
    if quantize_lm_head and "lm_head" in params:
        out["lm_head"] = quantize_tensor(params["lm_head"])
    return out


def dequantize_params(params: Dict, dtype=jnp.bfloat16) -> Dict:
    def walk(node):
        if is_quantized(node):
            return dequantize_tensor(node, dtype)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)


def param_bytes(params: Dict) -> int:
    return sum(leaf.size * leaf.dtype.itemsize
               for leaf in jax.tree.leaves(params))
