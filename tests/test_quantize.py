"""Int8 weight-only quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from pdec.infer.engine import GenerationConfig, InferenceEngine
from pdec.models.config import TINY
from pdec.models.quantize import (
    dequantize_params,
    dequantize_tensor,
    param_bytes,
    quantize_params,
    quantize_tensor,
)
from pdec.models.transformer import forward, init_params

from test_infer import ByteTokenizer


def test_quantize_round_trip_error_bounded():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 128)) * 0.02
    qw = quantize_tensor(w)
    assert qw["q"].dtype == jnp.int8
    back = dequantize_tensor(qw, jnp.float32)
    err = np.max(np.abs(np.asarray(back - w)))
    amax = float(jnp.max(jnp.abs(w)))
    assert err <= amax / 127.0 + 1e-7  # half-step RTN bound per channel


def test_param_bytes_shrink():
    params = init_params(jax.random.PRNGKey(0), TINY)
    q = quantize_params(params)
    # TINY is f32: projections shrink 4x (+small scale overhead)
    assert param_bytes(q) < 0.55 * param_bytes(params)


def test_forward_with_quantized_weights_close():
    params = init_params(jax.random.PRNGKey(0), TINY)
    q = quantize_params(params)
    tokens = jnp.arange(24)[None, :] % TINY.vocab_size
    ref, _ = forward(params, tokens, TINY)
    got, _ = forward(q, tokens, TINY)
    # int8 RTN on random-normal weights: logits agree to a few percent of
    # the logit scale
    scale = float(jnp.std(ref))
    err = float(jnp.max(jnp.abs(got - ref)))
    assert err < 0.2 * scale + 0.05, (err, scale)


def test_dequantize_inverts_structure():
    params = init_params(jax.random.PRNGKey(0), TINY)
    q = quantize_params(params)
    deq = dequantize_params(q, jnp.float32)
    assert jax.tree.structure(deq) == jax.tree.structure(params)


def test_engine_generates_with_quantized_model():
    params = init_params(jax.random.PRNGKey(0), TINY)
    q = quantize_params(params)
    eng = InferenceEngine(q, TINY, ByteTokenizer(), max_len=64)
    out = eng.generate(
        ["hello"], GenerationConfig(max_new_tokens=8, temperature=0.0,
                                    stop=())
    )[0]
    assert len(out.token_ids) >= 1
