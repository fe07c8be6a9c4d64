"""LoRA as a factored side pytree.

Mirrors the reference adapter setup (peft LoraConfig r=64 alpha=256
dropout 0.1 on all linear projections, ``train/scripts/train.sh:97-99``),
but as a pure param tree composed at projection time
(`pdec.models.transformer._maybe_lora`).

The DPO two-adapter trick (one base model, trainable 'policy' adapter +
frozen 'reference' adapter, reference ``train/train_dpo.py:146-156``)
becomes: policy logits = forward(base, lora=policy_lora), reference logits
= forward(base, lora=stop_grad(ref_lora)) — no second 7B copy.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from pdec.models.config import ModelConfig

DEFAULT_TARGETS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")

_SHAPES = {
    "wq": lambda c: (c.d_model, c.n_heads * c.head_dim),
    "wk": lambda c: (c.d_model, c.n_kv_heads * c.head_dim),
    "wv": lambda c: (c.d_model, c.n_kv_heads * c.head_dim),
    "wo": lambda c: (c.n_heads * c.head_dim, c.d_model),
    "w_gate": lambda c: (c.d_model, c.d_ff),
    "w_up": lambda c: (c.d_model, c.d_ff),
    "w_down": lambda c: (c.d_ff, c.d_model),
}


def init_lora(
    key,
    cfg: ModelConfig,
    rank: int = 64,
    alpha: float = 256.0,
    targets: Sequence[str] = DEFAULT_TARGETS,
) -> Dict[str, Any]:
    """A/B factors per target projection, stacked over layers.

    A ~ N(0, 1/rank), B = 0 (standard init: the delta starts at zero).
    """
    dt = jnp.dtype(cfg.dtype)
    keys = jax.random.split(key, len(targets))
    layers = {}
    for k, name in zip(keys, targets):
        d_in, d_out = _SHAPES[name](cfg)
        layers[name] = {
            "a": (jax.random.normal(k, (cfg.n_layers, d_in, rank)) / rank**0.5
                  ).astype(dt),
            "b": jnp.zeros((cfg.n_layers, rank, d_out), dt),
        }
    return {"layers": layers, "_scale": jnp.asarray(alpha / rank, dt)}


def lora_shardings(lora_tree) -> Dict[str, Any]:
    """LoRA factors are tiny; shard the large dim over fsdp, replicate rank."""

    def spec(path_leaf):
        return P(None, "fsdp", None)

    layers = {
        name: {"a": P(None, "fsdp", None), "b": P(None, None, "fsdp")}
        for name in lora_tree["layers"]
    }
    return {"layers": layers, "_scale": P()}


def merge_lora(params, lora) -> Dict[str, Any]:
    """Fold the LoRA delta into the base weights (reference
    ``merge_model.py``: peft ``merge_and_unload``)."""
    merged = dict(params)
    merged_layers = dict(params["layers"])
    scale = lora["_scale"]
    for name, fac in lora["layers"].items():
        delta = jnp.einsum("ldr,lrf->ldf", fac["a"], fac["b"]) * scale
        merged_layers[name] = params["layers"][name] + delta.astype(
            params["layers"][name].dtype
        )
    merged["layers"] = merged_layers
    return merged
