"""In-training validation harness test (C4 equivalent)."""

import random

import jax
import pytest

from pdec.control.synthesis import SynthesisConfig
from pdec.data.generator import GeneratorConfig, render_example, sample_problem
from pdec.models.config import TINY
from pdec.models.lora import init_lora
from pdec.models.transformer import init_params
from pdec.pipeline.validate import make_validate_fn

from tests.test_infer import ByteTokenizer


def test_validate_fn_merges_and_evaluates():
    rng = random.Random(3)
    rows = [
        render_example(sample_problem(rng, GeneratorConfig("heat", 1)))
        for _ in range(2)
    ]
    params = init_params(jax.random.PRNGKey(0), TINY)
    lora = init_lora(jax.random.PRNGKey(1), TINY, rank=4, alpha=8)
    validate_fn = make_validate_fn(
        TINY, ByteTokenizer(), {"valid_heat": rows},
        synthesis=SynthesisConfig(n_iters=4, n_starts=2, polish_iters=0),
        num_examples=2, shots=(0,), max_new_tokens=8,
    )
    metrics = validate_fn({"params": params, "lora": lora}, step=100)
    assert metrics, "no validation metrics returned"
    # keys follow the reference's validation_* naming pattern
    assert any(k.startswith("valid_heat_shots=0/") for k in metrics)
    assert all(isinstance(v, float) for v in metrics.values())


def test_validate_fn_timeout_path():
    validate_fn = make_validate_fn(
        TINY, ByteTokenizer(), {"d": [{"nl": "x", "python": "y"}]},
        num_examples=1, shots=(0,), max_new_tokens=8, timeout_s=0,
    )
    params = init_params(jax.random.PRNGKey(0), TINY)
    metrics = validate_fn({"params": params, "lora": None}, step=1)
    assert metrics.get("validation_timeout") == 1.0
