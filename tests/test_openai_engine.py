"""OpenAIEngine tests against a mock transport (zero-egress environment)."""

import urllib.error

import pytest

from pdec.infer.engine import GenerationConfig
from pdec.infer.openai_engine import OpenAIEngine


def _resp(text, finish="stop", logprobs=None):
    choice = {"message": {"content": text}, "finish_reason": finish}
    if logprobs is not None:
        choice["logprobs"] = {
            "content": [{"logprob": v} for v in logprobs]
        }
    return {"choices": [choice]}


def test_generate_batch_preserves_order():
    def transport(payload):
        prompt = payload["messages"][-1]["content"]
        return _resp(f"echo:{prompt}")

    eng = OpenAIEngine(transport=transport, n_threads=4)
    out = eng.generate([f"p{i}" for i in range(10)],
                       GenerationConfig(stop=()))
    assert [o.text for o in out] == [f"echo:p{i}" for i in range(10)]
    assert all(o.finish_reason == "stop" for o in out)


def test_payload_carries_generation_config():
    seen = {}

    def transport(payload):
        seen.update(payload)
        return _resp("ok")

    eng = OpenAIEngine(model="gpt-4o", transport=transport)
    gen = GenerationConfig(max_new_tokens=77, temperature=0.3,
                           stop=("### Instruction:",), seed=5)
    eng.generate(["hello"], gen)
    assert seen["model"] == "gpt-4o"
    assert seen["max_tokens"] == 77
    assert seen["temperature"] == 0.3
    assert seen["stop"] == ["### Instruction:"]
    assert seen["messages"][-1] == {"role": "user", "content": "hello"}


def test_stop_string_trimmed_client_side():
    def transport(payload):
        return _resp("answer\n### Instruction: trailing", finish="length")

    eng = OpenAIEngine(transport=transport)
    out = eng.generate(
        ["x"], GenerationConfig(stop=("### Instruction:",))
    )[0]
    assert out.text == "answer\n"
    assert out.finish_reason == "stop"


def test_retries_on_429_then_succeeds():
    calls = {"n": 0}
    sleeps = []

    def transport(payload):
        calls["n"] += 1
        if calls["n"] < 3:
            raise urllib.error.HTTPError("u", 429, "rate", {}, None)
        return _resp("finally")

    eng = OpenAIEngine(transport=transport, sleep=sleeps.append,
                       backoff_s=1.0)
    out = eng.generate(["x"], GenerationConfig(stop=()))[0]
    assert out.text == "finally"
    assert calls["n"] == 3
    assert sleeps == [1.0, 2.0]  # exponential backoff


def test_non_retryable_http_error_degrades_to_empty():
    def transport(payload):
        raise urllib.error.HTTPError("u", 401, "auth", {}, None)

    eng = OpenAIEngine(transport=transport, sleep=lambda _: None)
    with pytest.warns(UserWarning):
        out = eng.generate(["x"], GenerationConfig(stop=()))[0]
    assert out.text == ""
    assert out.finish_reason == "error"


def test_exhausted_retries_degrade_to_empty():
    def transport(payload):
        raise urllib.error.URLError("down")

    eng = OpenAIEngine(transport=transport, sleep=lambda _: None,
                       max_retries=2)
    with pytest.warns(UserWarning):
        out = eng.generate(["x"], GenerationConfig(stop=()))[0]
    assert out.finish_reason == "error"


def test_logprobs_surface_for_perplexity():
    def transport(payload):
        assert payload["logprobs"] is True
        return _resp("tok tok", logprobs=[-0.5, -1.5])

    eng = OpenAIEngine(transport=transport)
    out = eng.generate(["x"], GenerationConfig(stop=(), logprobs=True))[0]
    assert out.logprobs == [-0.5, -1.5]


def test_works_as_eval_driver_engine():
    """An EvalDriver role can be served by the API engine end-to-end."""
    from pdec.pipeline.evaluate import EvalDriver

    sstl = (r"G_[[1.0, 4.0]] (\forall x \in [10, 60] "
            r" (u(x) - (290.0) > 0))")

    def transport(payload):
        return _resp(sstl + "\n```")

    eng = OpenAIEngine(transport=transport)
    driver = EvalDriver({"translator": eng}, eval_robustness=False,
                        eval_perplexity=False)
    items = [{"nl": "Consider a heat rod...", "sstl": sstl, "python": ""}]
    res = driver.run(items, eval_method="to_STL", shots=0)
    assert res.metrics["n_samples"] == 1
    assert res.metrics["iou"] == pytest.approx(1.0)
