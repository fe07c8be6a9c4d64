"""Aux subsystem tests: self-training pass, trackers, profiling, scoring."""

import json
import os

import jax
import numpy as np
import pytest

from pdec.infer.engine import InferenceEngine
from pdec.infer.scoring import next_token_distribution, score_completions
from pdec.models.config import TINY
from pdec.models.transformer import init_params
from pdec.pipeline.self_training import predict_train_sstl
from pdec.runtime.profiling import StepTimer, synthesis_cost, train_step_cost
from pdec.runtime.trackers import make_metric_sink, read_metrics

from tests.test_infer import ByteTokenizer


@pytest.fixture(scope="module")
def setup():
    params = init_params(jax.random.PRNGKey(0), TINY)
    tok = ByteTokenizer()
    engine = InferenceEngine(params, TINY, tok, max_len=256)
    return params, tok, engine


def test_self_training_pass(setup):
    _, _, engine = setup
    rows = [{"nl": "problem a", "python": "x"}, {"nl": "problem b", "python": "y"}]
    out = predict_train_sstl(engine, rows, shots=0, max_new_tokens=4)
    assert len(out) == 2
    assert all("train_predicted_sstl" in r for r in out)
    assert all("python" in r for r in out)  # original keys preserved


def test_metric_sink(tmp_path):
    sink = make_metric_sink(str(tmp_path), use_wandb=False)
    sink(1, {"loss": 2.0})
    sink(2, {"loss": 1.5, "lr": 1e-4})
    rows = read_metrics(str(tmp_path))
    assert len(rows) == 2
    assert rows[1]["loss"] == 1.5
    assert rows[0]["step"] == 1


def test_step_timer():
    timer = StepTimer()
    with timer.section("work"):
        sum(range(1000))
    with timer.section("work"):
        sum(range(1000))
    s = timer.summary()
    assert s["work"]["count"] == 2
    assert s["work"]["total_s"] > 0


def test_cost_models():
    c = train_step_cost(TINY, batch_tokens=1024)
    assert c["params"] > 0 and c["step_flops"] > c["params"]
    s = synthesis_cost(2048, 31, 320, 6, 40)
    assert s["total_flops"] > 1e11


def test_score_completions(setup):
    params, tok, _ = setup
    out = score_completions(
        params, TINY, tok, ["hello "] * 2, ["world", "different text"]
    )
    assert len(out) == 2
    assert out[0]["n_tokens"] == len(tok.encode("hello world")) - len(
        tok.encode("hello ")
    )
    assert all(np.isfinite(o["sum_logprob"]) for o in out)
    # scoring is consistent: same pair scores identically
    again = score_completions(params, TINY, tok, ["hello "], ["world"])
    assert again[0]["sum_logprob"] == pytest.approx(
        out[0]["sum_logprob"], abs=1e-3
    )


def test_next_token_distribution(setup):
    params, tok, _ = setup
    dist = next_token_distribution(params, TINY, tok, ["ab", "a much longer prompt"])
    assert dist.shape == (2, TINY.vocab_size)
    np.testing.assert_allclose(np.exp(dist).sum(axis=1), 1.0, rtol=1e-3)
