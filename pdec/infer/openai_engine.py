"""OpenAI-compatible chat backend for the eval harness.

The reference eval driver can point any role at the OpenAI API instead of a
local model (``run_testing.sh:26-41`` OpenAI switch; client with retries at
``eval/utils.py:318-352``) — used to A/B GPT baselines against the trained
checkpoints.  This engine exposes the same ``generate(prompts, gen)``
surface as the local engines, so an `EvalDriver` role can be served by the
API by construction:

    engines = {"coder": OpenAIEngine(model="gpt-4o"), "translator": local}

Transport is injectable (``transport=callable(payload)->response``): tests
run against a mock, and air-gapped deployments can plug a gateway.  The
default transport uses urllib against ``base_url`` with exponential-backoff
retries on 429/5xx (reference retries at ``eval/utils.py:330-340``).
"""

from __future__ import annotations

import json
import os
import time
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, List, Optional, Sequence

from pdec.infer.engine import Generation, GenerationConfig


class OpenAIError(RuntimeError):
    pass


def _default_transport(base_url: str, api_key: Optional[str], timeout: float):
    def send(payload: Dict) -> Dict:
        req = urllib.request.Request(
            base_url.rstrip("/") + "/chat/completions",
            data=json.dumps(payload).encode("utf-8"),
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Bearer {api_key or ''}",
            },
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return json.loads(resp.read().decode("utf-8"))

    return send


class OpenAIEngine:
    """Drop-in `EvalDriver` engine backed by a chat-completions API."""

    def __init__(
        self,
        model: str = "gpt-4o-mini",
        api_key: Optional[str] = None,
        base_url: str = "https://api.openai.com/v1",
        transport: Optional[Callable[[Dict], Dict]] = None,
        max_retries: int = 5,
        backoff_s: float = 1.0,
        timeout_s: float = 120.0,
        n_threads: int = 8,
        system_prompt: Optional[str] = None,
        sleep: Callable[[float], None] = time.sleep,
    ):
        api_key = api_key or os.environ.get("OPENAI_API_KEY")
        self.model = model
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.n_threads = n_threads
        self.system_prompt = system_prompt
        self._sleep = sleep
        self._transport = transport or _default_transport(
            base_url, api_key, timeout_s
        )

    def _one(self, prompt: str, gen: GenerationConfig, seed: int) -> Generation:
        messages = []
        if self.system_prompt:
            messages.append({"role": "system", "content": self.system_prompt})
        messages.append({"role": "user", "content": prompt})
        payload = {
            "model": self.model,
            "messages": messages,
            "max_tokens": gen.max_new_tokens,
            "temperature": gen.temperature,
            "seed": seed,
        }
        if gen.stop:
            payload["stop"] = list(gen.stop)[:4]  # API limit
        if gen.logprobs:
            payload["logprobs"] = True

        delay = self.backoff_s
        last_err: Optional[Exception] = None
        for _ in range(self.max_retries):
            try:
                resp = self._transport(payload)
                choice = resp["choices"][0]
                text = choice["message"]["content"] or ""
                finish = {"stop": "stop", "length": "length"}.get(
                    choice.get("finish_reason", "stop"), "stop"
                )
                lps = None
                lp_content = (choice.get("logprobs") or {}).get("content")
                if lp_content:
                    lps = [t["logprob"] for t in lp_content]
                # trim at stop strings (APIs differ on inclusive stops)
                for s in gen.stop:
                    if s in text:
                        text = text.split(s)[0]
                        finish = "stop"
                return Generation(
                    text=text, token_ids=[], logprobs=lps,
                    finish_reason=finish,
                )
            except (urllib.error.HTTPError, urllib.error.URLError,
                    OSError, KeyError, OpenAIError, TimeoutError) as e:
                retryable = True
                if isinstance(e, urllib.error.HTTPError):
                    retryable = e.code == 429 or e.code >= 500
                last_err = e
                if not retryable:
                    break
                self._sleep(delay)
                delay *= 2
        # reference behavior: a failed generation degrades to an empty
        # completion with a warning, not an abort (eval/utils.py:106-112)
        import warnings

        warnings.warn(f"openai generation failed: {last_err!r}")
        return Generation(text="", token_ids=[], logprobs=None,
                          finish_reason="error")

    def generate(self, prompts: Sequence[str],
                 gen: GenerationConfig = GenerationConfig()) -> List[Generation]:
        with ThreadPoolExecutor(max_workers=self.n_threads) as pool:
            futs = [
                pool.submit(self._one, p, gen, gen.seed + i)
                for i, p in enumerate(prompts)
            ]
            return [f.result() for f in futs]
