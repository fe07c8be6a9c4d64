"""Continuous batching: slot reuse must not change greedy generations."""

import jax
import pytest

from pdec.infer.continuous import ContinuousEngine
from pdec.infer.engine import GenerationConfig, InferenceEngine
from pdec.models.config import TINY
from pdec.models.transformer import init_params

from tests.test_infer import ByteTokenizer


@pytest.fixture(scope="module")
def engines():
    params = init_params(jax.random.PRNGKey(0), TINY)
    tok = ByteTokenizer()
    static = InferenceEngine(params, TINY, tok, max_len=128)
    cont = ContinuousEngine(params, TINY, tok, n_slots=2, max_len=96)
    return static, cont


def test_continuous_matches_static_greedy(engines):
    static, cont = engines
    prompts = [
        "alpha problem", "a second rather longer prompt here",
        "third", "fourth prompt text", "fifth one",
    ]
    gen = GenerationConfig(max_new_tokens=8, temperature=0.0, stop=())
    batch = static.generate(prompts, gen)
    streamed = cont.generate(prompts, gen)  # 5 requests through 2 slots
    assert len(streamed) == len(prompts)
    for b, s in zip(batch, streamed):
        assert s is not None
        assert b.token_ids == s.token_ids, (b.token_ids, s.token_ids)


def test_continuous_handles_more_requests_than_slots(engines):
    _, cont = engines
    prompts = [f"prompt number {i}" for i in range(7)]
    gen = GenerationConfig(max_new_tokens=4, temperature=0.0, stop=())
    out = cont.generate(prompts, gen)
    assert all(g is not None and len(g.token_ids) <= 4 for g in out)
