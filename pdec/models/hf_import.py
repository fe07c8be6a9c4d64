"""HF checkpoint import: Llama/DeepSeek safetensors -> pdec param tree.

The reference's three roles are fine-tunes of MathCoder2-DeepSeekMath-7B
published on HF (reference ``README.md:24-29``, loaded via
``AutoModelForCausalLM``, ``train/train_finetune.py:140-144``).  This
module maps a ``LlamaForCausalLM`` state dict into the layer-stacked pdec
tree so those checkpoints run on TPU for metric-parity evaluation.

Also exports the reverse mapping (pdec -> HF state dict) so merged
adapters can be shipped back in the reference's format
(``merge_model.py`` equivalent).
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np

from pdec.models.config import ModelConfig


def config_from_hf(hf_config: Dict) -> ModelConfig:
    return ModelConfig(
        vocab_size=hf_config["vocab_size"],
        d_model=hf_config["hidden_size"],
        n_layers=hf_config["num_hidden_layers"],
        n_heads=hf_config["num_attention_heads"],
        n_kv_heads=hf_config.get(
            "num_key_value_heads", hf_config["num_attention_heads"]
        ),
        d_ff=hf_config["intermediate_size"],
        max_seq=hf_config.get("max_position_embeddings", 4096),
        rope_theta=hf_config.get("rope_theta", 10000.0),
        rms_eps=hf_config.get("rms_norm_eps", 1e-6),
        tie_embeddings=hf_config.get("tie_word_embeddings", False),
    )


_LAYER_MAP = {
    # pdec name -> (hf suffix, transpose?)
    "ln_attn": ("input_layernorm.weight", False),
    "ln_mlp": ("post_attention_layernorm.weight", False),
    "wq": ("self_attn.q_proj.weight", True),
    "wk": ("self_attn.k_proj.weight", True),
    "wv": ("self_attn.v_proj.weight", True),
    "wo": ("self_attn.o_proj.weight", True),
    "w_gate": ("mlp.gate_proj.weight", True),
    "w_up": ("mlp.up_proj.weight", True),
    "w_down": ("mlp.down_proj.weight", True),
}


def params_from_state_dict(state: Dict[str, np.ndarray], cfg: ModelConfig,
                           dtype=None):
    """HF ``LlamaForCausalLM`` tensors -> pdec layer-stacked tree.

    HF linear weights are [out, in]; pdec uses [in, out] (einsum btd,df).
    """
    import jax.numpy as jnp

    dt = jnp.dtype(dtype or cfg.dtype)

    def get(name):
        return np.asarray(state[name])

    layers = {}
    for pname, (suffix, transpose) in _LAYER_MAP.items():
        stacked = []
        for l in range(cfg.n_layers):
            w = get(f"model.layers.{l}.{suffix}")
            stacked.append(w.T if transpose else w)
        layers[pname] = jnp.asarray(np.stack(stacked), dtype=dt)

    params = {
        "embed": jnp.asarray(get("model.embed_tokens.weight"), dtype=dt),
        "layers": layers,
        "ln_final": jnp.asarray(get("model.norm.weight"), dtype=dt),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = jnp.asarray(get("lm_head.weight").T, dtype=dt)
    return params


def state_dict_from_params(params, cfg: ModelConfig) -> Dict[str, np.ndarray]:
    """pdec tree -> HF state dict (for shipping merged checkpoints)."""
    state: Dict[str, np.ndarray] = {
        "model.embed_tokens.weight": np.asarray(params["embed"]),
        "model.norm.weight": np.asarray(params["ln_final"]),
    }
    if "lm_head" in params:
        state["lm_head.weight"] = np.asarray(params["lm_head"]).T
    for pname, (suffix, transpose) in _LAYER_MAP.items():
        arr = np.asarray(params["layers"][pname])
        for l in range(cfg.n_layers):
            w = arr[l]
            state[f"model.layers.{l}.{suffix}"] = w.T if transpose else w
    return state


def load_hf_checkpoint(path: str, dtype=None):
    """Load (config, params) from an HF checkpoint directory."""
    with open(os.path.join(path, "config.json")) as f:
        cfg = config_from_hf(json.load(f))

    state: Dict[str, np.ndarray] = {}
    from safetensors import safe_open

    shards = [
        fn for fn in os.listdir(path)
        if fn.endswith(".safetensors")
    ]
    if not shards:
        raise FileNotFoundError(f"no safetensors shards in {path}")
    for shard in sorted(shards):
        with safe_open(os.path.join(path, shard), framework="numpy") as f:
            for key in f.keys():
                state[key] = f.get_tensor(key)
    return cfg, params_from_state_dict(state, cfg, dtype=dtype)
