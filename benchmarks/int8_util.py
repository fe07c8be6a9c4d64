"""Shared helper: build a random int8 param tree directly on device.

7B-scale benches (decode `bench_7b_int8.py`, train `bench_7b_train.py`)
need a DEEPSEEK_7B-shaped parameter tree in the `pdec.models.quantize`
layout without ever materializing bf16 weights: bf16 7B is 14 GiB and
does not fit a 16 GiB v5e chip, and shipping real weights through the
host tunnel (~20 MB/s) costs minutes when throughput does not depend on
values.
"""
import jax
import jax.numpy as jnp
import numpy as np

from pdec.models.quantize import QUANT_KEYS
from pdec.models.transformer import init_params


def build_int8_params(key, cfg):
    """Random int8 param tree with the exact quantize_params layout,
    created leaf-by-leaf on device (never materializes bf16 7B)."""
    shapes = jax.eval_shape(
        lambda k: init_params(k, cfg), jax.random.PRNGKey(0))

    def mk(path_keys, sd):
        name = path_keys[-1]
        k = jax.random.fold_in(key, hash("/".join(path_keys)) % (2**31))
        if name in QUANT_KEYS or name == "lm_head":
            q = jax.random.randint(k, sd.shape, -127, 128, dtype=jnp.int8)
            scale = jnp.full(sd.shape[:-2] + (1, sd.shape[-1]),
                             0.02 / np.sqrt(sd.shape[-2]), jnp.float32)
            return {"q": q, "scale": scale}
        return (jax.random.normal(k, sd.shape, jnp.float32) * 0.02).astype(
            sd.dtype)

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return mk(path, node)

    return walk(shapes, ())
