"""Paged-KV engine tests: kernel parity, block reuse, capacity, preemption."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdec.infer.engine import GenerationConfig, InferenceEngine
from pdec.infer.paged import BlockAllocator, PagedEngine
from pdec.ops.paged_attention import (
    paged_attention_kernel,
    paged_attention_reference,
)
from pdec.models.config import TINY
from pdec.models.transformer import init_params

from test_infer import ByteTokenizer


def test_paged_kernel_matches_reference_interpret():
    key = jax.random.PRNGKey(0)
    S, Hq, Hkv, D, NB, BLK, MAXP = 4, 8, 2, 64, 16, 16, 5
    q = jax.random.normal(key, (S, Hq, D), jnp.float32)
    pk = jax.random.normal(jax.random.PRNGKey(1), (NB, Hkv, BLK, D))
    pv = jax.random.normal(jax.random.PRNGKey(2), (NB, Hkv, BLK, D))
    bt = jax.random.randint(jax.random.PRNGKey(3), (S, MAXP), 0, NB)
    lengths = jnp.asarray([5, 16, 33, 80])
    ref = paged_attention_reference(q, pk, pv, bt, lengths)
    got = paged_attention_kernel(q, pk, pv, bt, lengths, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_block_allocator_reserves_scratch():
    alloc = BlockAllocator(8)
    assert alloc.n_free == 7  # block 0 reserved
    pages = alloc.alloc(7)
    assert 0 not in pages
    assert alloc.alloc(1) is None
    alloc.release(pages[:3])
    assert alloc.n_free == 3


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), TINY)


def test_paged_matches_dense_engine_greedy(params):
    """More requests than slots, mixed lengths: slot AND block reuse, same
    greedy tokens as the contiguous-cache engine."""
    tok = ByteTokenizer()
    gen = GenerationConfig(max_new_tokens=12, temperature=0.0, stop=())
    prompts = [
        "short",
        "a much longer prompt that spans several blocks of the paged pool",
        "mid-size prompt here",
        "x",
        "another request to force slot turnover",
    ]
    base = InferenceEngine(params, TINY, tok, max_len=128)
    eng = PagedEngine(params, TINY, tok, n_slots=2, block_size=8,
                      max_len=128)
    got = eng.generate(prompts, gen)
    want = base.generate(prompts, gen)
    for g, w, p in zip(got, want, prompts):
        assert g.token_ids == w.token_ids, p
        np.testing.assert_allclose(g.logprobs, w.logprobs, atol=1e-4)


def test_paged_stop_strings(params):
    tok = ByteTokenizer()
    base = InferenceEngine(params, TINY, tok, max_len=128)
    probe = base.generate(
        ["hello"], GenerationConfig(max_new_tokens=16, temperature=0.0,
                                    stop=())
    )[0].text
    if len(probe) < 5:
        pytest.skip("continuation too short")
    stop = probe[2:5]
    gen = GenerationConfig(max_new_tokens=16, temperature=0.0, stop=(stop,))
    eng = PagedEngine(params, TINY, tok, n_slots=2, block_size=8, max_len=128)
    out = eng.generate(["hello"], gen)[0]
    ref = base.generate(["hello"], gen)[0]
    assert out.text == ref.text and out.finish_reason == "stop"


def test_paged_capacity_win_mixed_lengths(params):
    """Peak block usage tracks actual tokens, far below the dense
    n_slots * max_len equivalent."""
    tok = ByteTokenizer()
    gen = GenerationConfig(max_new_tokens=8, temperature=0.0, stop=())
    prompts = ["ab", "cdef", "ghijkl", "mn"]
    eng = PagedEngine(params, TINY, tok, n_slots=4, block_size=8,
                      max_len=256)
    res = eng.generate(prompts, gen)
    assert all(r is not None for r in res)
    dense_blocks = eng.n_slots * eng.max_pages
    # prompts are < 8 tokens, so 2 pages/slot cover prompt + 8 new tokens
    assert eng.peak_blocks_used <= 2 * len(prompts)
    assert eng.peak_blocks_used < dense_blocks / 8


def test_paged_preemption_on_pool_exhaustion(params):
    """A pool too small for all concurrent sequences finishes the longest
    one early instead of crashing; every request still gets a result."""
    tok = ByteTokenizer()
    gen = GenerationConfig(max_new_tokens=40, temperature=0.0, stop=())
    prompts = ["abcdefgh" * 3, "ijklmnop" * 3, "qrstuvwx" * 3]
    # 3 slots x (3 prompt pages + 40/8 decode pages) would want ~24 pages;
    # give it 14 usable
    eng = PagedEngine(params, TINY, tok, n_slots=3, block_size=8,
                      n_blocks=15, max_len=256)
    res = eng.generate(prompts, gen)
    assert all(r is not None for r in res)
    assert all(len(r.token_ids) >= 1 for r in res)
    # at least one preempted or everything fitted (lengths <= 40 each)
    assert max(len(r.token_ids) for r in res) <= 40


def test_paged_prompt_too_large_raises(params):
    tok = ByteTokenizer()
    eng = PagedEngine(params, TINY, tok, n_slots=1, block_size=8,
                      n_blocks=3, max_len=128)
    with pytest.raises(RuntimeError):
        eng.generate(["x" * 100],
                     GenerationConfig(max_new_tokens=4, stop=()))
