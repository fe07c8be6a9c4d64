"""Speculative decoding tests: exact greedy equivalence, exact
rejection-sampling distribution, ragged emission bookkeeping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdec.infer.engine import GenerationConfig
from pdec.infer.sharded import ShardedEngine
from pdec.infer.speculative import (
    SpeculativeDecoder,
    SpeculativeEngine,
    speculative_accept,
)
from pdec.models.config import TINY
from pdec.models.transformer import init_params
from pdec.parallel.mesh import MeshConfig, make_mesh, shard_params
from pdec.models.transformer import param_shardings

from test_infer import ByteTokenizer


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(data=2, fsdp=2, tp=2))


@pytest.fixture(scope="module")
def models(mesh):
    shard = lambda p: shard_params(p, param_shardings(TINY), mesh)
    target = shard(init_params(jax.random.PRNGKey(0), TINY))
    draft = shard(init_params(jax.random.PRNGKey(7), TINY))
    return target, draft


def test_rejection_sampling_matches_target_distribution():
    """Leviathan acceptance: emitted-token distribution == target dist,
    verified by brute force over a tiny vocabulary (k=1)."""
    v = 4
    p_t = jnp.asarray([[0.5, 0.3, 0.15, 0.05]])
    p_d = jnp.asarray([[0.1, 0.6, 0.25, 0.05]])
    n = 200_000

    def one(key):
        kd, ka = jax.random.split(key)
        d = jax.random.categorical(kd, jnp.log(p_d))  # [1]
        a, corr = speculative_accept(
            ka, p_t[:, None, :].repeat(2, 1), p_d[:, None, :], d[:, None]
        )
        return jnp.where(a[0] >= 1, d[0], corr[0])

    toks = jax.vmap(one)(jax.random.split(jax.random.PRNGKey(0), n))
    emp = np.bincount(np.asarray(toks), minlength=v) / n
    tv = 0.5 * np.abs(emp - np.asarray(p_t[0])).sum()
    assert tv < 0.01, f"total variation {tv:.4f} vs target dist"


def test_greedy_speculative_equals_plain_greedy(mesh, models):
    """temperature=0: draft-verify output must be bitwise the plain greedy
    decode, for an arbitrary (here: unrelated random) draft model."""
    target, draft = models
    tok = ByteTokenizer()
    gen = GenerationConfig(max_new_tokens=14, temperature=0.0, stop=())
    prompts = ["hello world", "abcdefgh", "a longer prompt string here"]

    plain = ShardedEngine(target, TINY, tok, mesh, max_len=128, chunk=4,
                          prefix_cache=False)
    spec = SpeculativeEngine(target, TINY, draft, TINY, tok, mesh, k=3,
                             max_len=128)
    want = plain.generate(prompts, gen)
    got = spec.generate(prompts, gen)
    for g, w in zip(got, want):
        assert g.token_ids == w.token_ids
        assert g.text == w.text
        np.testing.assert_allclose(g.logprobs, w.logprobs, atol=1e-4)


def test_self_draft_accepts_everything(mesh, models):
    """draft == target at temperature 0 accepts every proposal; output
    still equals plain greedy."""
    target, _ = models
    tok = ByteTokenizer()
    gen = GenerationConfig(max_new_tokens=12, temperature=0.0, stop=())
    plain = ShardedEngine(target, TINY, tok, mesh, max_len=128, chunk=4,
                          prefix_cache=False)
    spec = SpeculativeEngine(target, TINY, target, TINY, tok, mesh, k=4,
                             max_len=128)
    prompts = ["speculate!", "zzzz"]
    want = plain.generate(prompts, gen)
    got = spec.generate(prompts, gen)
    for g, w in zip(got, want):
        assert g.token_ids == w.token_ids


def test_sampled_speculative_runs_and_bounds(mesh, models):
    """temperature>0 path: valid ids, counts bounded by max_new_tokens,
    eos/stop semantics via finalize (smoke — distribution covered by the
    brute-force acceptance test)."""
    target, draft = models
    tok = ByteTokenizer()
    gen = GenerationConfig(max_new_tokens=9, temperature=0.8, stop=())
    spec = SpeculativeEngine(target, TINY, draft, TINY, tok, mesh, k=3,
                             max_len=128)
    out = spec.generate(["abc", "defg"], gen)
    for g in out:
        assert 1 <= len(g.token_ids) <= 9
        assert all(0 <= t < TINY.vocab_size for t in g.token_ids)
        assert len(g.logprobs) == len(g.token_ids)


def test_top_p_under_sampling_rejected(mesh, models):
    target, draft = models
    spec = SpeculativeEngine(target, TINY, draft, TINY, ByteTokenizer(),
                             mesh, k=3, max_len=128)
    with pytest.raises(ValueError):
        spec.generate(
            ["x"], GenerationConfig(max_new_tokens=4, temperature=0.5,
                                    top_p=0.9)
        )


def test_oom_fallback_halves_batch(mesh, models, monkeypatch):
    """An HBM RESOURCE_EXHAUSTED during a batch must transparently re-serve
    the request in halves (dropping cached decoders), not fail the eval
    cell — and the output must equal the unsplit greedy decode."""
    import pdec.infer.speculative as sp

    target, draft = models
    tok = ByteTokenizer()
    gen = GenerationConfig(max_new_tokens=10, temperature=0.0, stop=())
    prompts = ["hello world", "abcdefgh", "a longer prompt string here",
               "fourth row"]

    spec = SpeculativeEngine(target, TINY, draft, TINY, tok, mesh, k=3,
                             max_len=128)
    want = spec.generate(prompts, gen)

    spec2 = SpeculativeEngine(target, TINY, draft, TINY, tok, mesh, k=3,
                              max_len=128)
    real = SpeculativeEngine._generate_batch
    calls = {"n": 0}

    def flaky(self, ps, g):
        calls["n"] += 1
        if len(ps) > 1 and calls["n"] == 1:
            raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")
        return real(self, ps, g)

    monkeypatch.setattr(SpeculativeEngine, "_generate_batch", flaky)
    got = spec2.generate(prompts, gen)
    assert calls["n"] == 3  # 1 failed full batch + 2 halves
    assert [g.token_ids for g in got] == [w.token_ids for w in want]

    # non-OOM errors and single-row OOMs still propagate
    def always(self, ps, g):
        raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")

    monkeypatch.setattr(SpeculativeEngine, "_generate_batch", always)
    with pytest.raises(RuntimeError):
        spec2.generate(["only row"], gen)
