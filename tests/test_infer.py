"""Inference engine tests with a toy tokenizer and the TINY model."""

import jax
import numpy as np
import pytest

from pdec.infer.engine import Generation, GenerationConfig, InferenceEngine
from pdec.models.config import TINY
from pdec.models.transformer import init_params


class ByteTokenizer:
    """Toy byte-level tokenizer (ids = bytes, eos = 0)."""

    eos_token_id = 0

    def encode(self, text):
        return [b % 256 for b in text.encode("utf-8")]

    def decode(self, ids):
        return bytes(int(i) % 256 for i in ids if i != 0).decode(
            "utf-8", errors="ignore"
        )


@pytest.fixture(scope="module")
def engine():
    params = init_params(jax.random.PRNGKey(0), TINY)
    return InferenceEngine(params, TINY, ByteTokenizer(), max_len=128)


def test_greedy_generation_deterministic(engine):
    gen = GenerationConfig(max_new_tokens=8, temperature=0.0)
    out1 = engine.generate(["hello world"], gen)
    out2 = engine.generate(["hello world"], gen)
    assert isinstance(out1[0], Generation)
    assert out1[0].token_ids == out2[0].token_ids
    assert len(out1[0].token_ids) <= 8
    assert len(out1[0].logprobs) == len(out1[0].token_ids)


def test_batch_generation_matches_single(engine):
    """Right-padding must not change a sequence's generation."""
    gen = GenerationConfig(max_new_tokens=8, temperature=0.0)
    prompts = ["short", "a considerably longer prompt than the first"]
    batch = engine.generate(prompts, gen)
    singles = [engine.generate([p], gen)[0] for p in prompts]
    for b, s in zip(batch, singles):
        assert b.token_ids == s.token_ids


def test_sampling_respects_seed(engine):
    gen1 = GenerationConfig(max_new_tokens=8, temperature=1.0, seed=1)
    gen2 = GenerationConfig(max_new_tokens=8, temperature=1.0, seed=1)
    gen3 = GenerationConfig(max_new_tokens=8, temperature=1.0, seed=2)
    a = engine.generate(["abc"], gen1)[0]
    b = engine.generate(["abc"], gen2)[0]
    c = engine.generate(["abc"], gen3)[0]
    assert a.token_ids == b.token_ids
    # different seed will almost surely diverge within 8 tokens
    assert a.token_ids != c.token_ids


def test_max_tokens_respected(engine):
    gen = GenerationConfig(max_new_tokens=4, temperature=0.0, stop=())
    out = engine.generate(["xyz"], gen)[0]
    assert len(out.token_ids) <= 4


def test_chunked_generate_matches_unchunked(engine):
    """Lists beyond max_batch are served in chunks with identical output
    (the KV-cache HBM ceiling must not change results)."""
    gen = GenerationConfig(max_new_tokens=6, temperature=0.0)
    prompts = [f"prompt number {i}" for i in range(7)]
    ref = engine.generate(prompts, gen)
    chunked = InferenceEngine(
        engine.params, engine.cfg, engine.tokenizer,
        max_len=128, max_batch=3,
    )
    out = chunked.generate(prompts, gen)
    assert [o.token_ids for o in out] == [o.token_ids for o in ref]


class _StubBytesTok:
    """Stop-trim fixture: per-token byte strings with a stop string whose
    BPE re-encoding would NOT align with the generated token stream."""

    eos_token_id = 0

    def __init__(self, table):
        self.table = table  # id -> bytes

    def decode_bytes(self, ids):
        return b"".join(self.table[i] for i in ids)

    def decode(self, ids):
        return self.decode_bytes(ids).decode("utf-8", errors="ignore")

    def encode(self, text):  # deliberately boundary-shifting (non-prefix-stable)
        raise AssertionError("finalize must not re-encode trimmed text")


def test_finalize_stop_mid_merge_byte_path():
    """A stop string starting inside a merged token: kept logprobs must
    count tokens wholly before the stop, via stream positions (never by
    re-encoding, which the stub forbids)."""
    from pdec.infer.engine import finalize_generation

    table = {1: b"result", 2: b" #", 3: b"##", 4: b" Instruction:", 5: b" junk"}
    ids = [1, 2, 3, 4, 5]
    lps = np.array([-0.1, -0.2, -0.3, -0.4, -0.5])
    gen = GenerationConfig(stop=("### Instruction:",))
    out = finalize_generation(_StubBytesTok(table), ids, lps, 0, gen)
    assert out.finish_reason == "stop"
    assert out.text == "result "
    # token 2 (b" #") straddles the boundary -> only token 1 is kept
    assert out.logprobs == [-0.1]


def test_finalize_stop_str_path_binary_search():
    """HF-style tokenizer (no decode_bytes): kept count found by binary
    search over the monotone decoded length."""
    from pdec.infer.engine import finalize_generation

    class _StrTok:
        eos_token_id = 0

        def decode(self, ids):
            table = {1: "result", 2: " #", 3: "##", 4: " Instruction:", 5: "x"}
            return "".join(table[i] for i in ids)

    ids = [1, 2, 3, 4, 5]
    lps = np.array([-0.1, -0.2, -0.3, -0.4, -0.5])
    gen = GenerationConfig(stop=("### Instruction:",))
    out = finalize_generation(_StrTok(), ids, lps, 0, gen)
    assert out.finish_reason == "stop"
    assert out.text == "result "
    assert out.logprobs == [-0.1]


def test_finalize_earliest_stop_wins():
    from pdec.infer.engine import finalize_generation

    table = {1: b"aaSTOPbb", 2: b"HALTcc"}
    lps = np.array([-0.1, -0.2])
    gen = GenerationConfig(stop=("HALT", "STOP"))
    out = finalize_generation(_StubBytesTok(table), [1, 2], lps, 0, gen)
    assert out.text == "aa"
    assert out.logprobs == []  # token 1 itself straddles the stop


def test_chunked_sampling_chunks_do_not_replay(engine):
    """With temperature>0 each chunk derives a distinct seed: chunk 2 must
    not replay chunk 1's key sequence (ADVICE r2)."""
    from pdec.infer.engine import chunk_seed

    assert chunk_seed(7, 0) == 7
    seeds = {chunk_seed(7, i) for i in range(16)}
    assert len(seeds) == 16
    gen = GenerationConfig(max_new_tokens=8, temperature=1.0, seed=3)
    chunked = InferenceEngine(
        engine.params, engine.cfg, engine.tokenizer, max_len=128, max_batch=1,
    )
    out = chunked.generate(["abc", "abc"], gen)
    # same prompt served in two chunks: replayed keys would force identical
    # samples; distinct per-chunk seeds make that astronomically unlikely
    assert out[0].token_ids != out[1].token_ids
