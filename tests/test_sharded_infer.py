"""Sharded inference engine tests on the virtual 8-device CPU mesh.

Covers VERDICT.md "Missing #1": the reference serves its 7B models through
vLLM (``infer_pdecontrol.sh:25-38``); our equivalent must shard one model
over the whole (data, fsdp, tp) mesh and keep the decode loop on device.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdec.infer.engine import GenerationConfig, InferenceEngine
from pdec.infer.sharded import ShardedDecoder, ShardedEngine, cache_shardings
from pdec.models.config import TINY, DEEPSEEK_7B, ModelConfig
from pdec.models.transformer import init_params, param_shardings
from pdec.parallel.mesh import MeshConfig, make_mesh, shard_params

from test_infer import ByteTokenizer


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(data=2, fsdp=2, tp=2))


@pytest.fixture(scope="module")
def tiny_setup(mesh):
    params = init_params(jax.random.PRNGKey(0), TINY)
    sharded = shard_params(params, param_shardings(TINY), mesh)
    return params, sharded


def test_sharded_greedy_matches_unsharded(mesh, tiny_setup):
    params, sharded = tiny_setup
    tok = ByteTokenizer()
    gen = GenerationConfig(max_new_tokens=12, temperature=0.0, stop=())
    prompts = ["hello world", "abc", "a rather longer prompt string here"]

    base = InferenceEngine(params, TINY, tok, max_len=128)
    eng = ShardedEngine(sharded, TINY, tok, mesh, max_len=128, chunk=4)
    got = eng.generate(prompts, gen)
    want = base.generate(prompts, gen)
    for g, w in zip(got, want):
        assert g.token_ids == w.token_ids
        assert g.finish_reason == w.finish_reason
        np.testing.assert_allclose(g.logprobs, w.logprobs, atol=1e-4)


def test_sharded_stop_string(mesh, tiny_setup):
    """Host-side stop-string check fires between chunks and truncates."""
    _, sharded = tiny_setup
    tok = ByteTokenizer()
    base = InferenceEngine(
        init_params(jax.random.PRNGKey(0), TINY), TINY, tok, max_len=128
    )
    eng = ShardedEngine(sharded, TINY, tok, mesh, max_len=128, chunk=4)
    # pick a stop string that actually occurs in the greedy continuation
    probe = base.generate(
        ["hello"], GenerationConfig(max_new_tokens=16, temperature=0.0, stop=())
    )[0].text
    if len(probe) < 4:
        pytest.skip("greedy continuation too short to form a stop probe")
    stop = probe[2:5]
    gen = GenerationConfig(max_new_tokens=16, temperature=0.0, stop=(stop,))
    out = eng.generate(["hello"], gen)[0]
    ref = base.generate(["hello"], gen)[0]
    assert out.text == ref.text
    assert out.finish_reason == ref.finish_reason == "stop"


def test_decoder_respects_finished_masking(mesh, tiny_setup):
    """Rows that hit EOS stop producing tokens (zeros after the hit)."""
    _, sharded = tiny_setup
    dec = ShardedDecoder(sharded, TINY, mesh, max_len=64, chunk=4)
    prompt = jnp.ones((8, 8), jnp.int32)
    valid = jnp.ones((8, 8), bool)
    # greedy argmax of a random TINY model: find the first emitted token and
    # declare it the EOS — every row then finishes after one token
    ids, _ = dec.generate_ids(prompt, valid, 8, eos_id=-1)
    eos = int(ids[0, 0])
    ids2, _ = dec.generate_ids(prompt, valid, 8, eos_id=eos)
    assert (ids2[:, 0] == eos).all()
    assert (ids2[:, 1:] == 0).all()


def test_7b_config_sharded_decode_compiles(mesh):
    """AOT-lower + compile the prefill and decode-chunk executables at the
    full DeepSeekMath-7B dimensions over the 8-device mesh (VERDICT next
    #3: '7B-config decode compiles and runs on the virtual 8-device mesh').
    Parameters are abstract (ShapeDtypeStruct) so no 14 GB materialization.
    """
    cfg = DEEPSEEK_7B
    # build the jitted fns without materializing real params
    dec2 = ShardedDecoder(params=None, cfg=cfg, mesh=mesh, max_len=256, chunk=8)

    from jax.sharding import NamedSharding

    d, hd = cfg.d_model, cfg.head_dim
    l, v, f = cfg.n_layers, cfg.vocab_size, cfg.d_ff
    nh, nkv = cfg.n_heads, cfg.n_kv_heads
    dt = jnp.bfloat16
    shapes = {
        "embed": (v, d),
        "layers": {
            "ln_attn": (l, d),
            "ln_mlp": (l, d),
            "wq": (l, d, nh * hd),
            "wk": (l, d, nkv * hd),
            "wv": (l, d, nkv * hd),
            "wo": (l, nh * hd, d),
            "w_gate": (l, d, f),
            "w_up": (l, d, f),
            "w_down": (l, f, d),
        },
        "ln_final": (d,),
        "lm_head": (d, v),
    }
    params = jax.tree.map(
        lambda shape, spec: jax.ShapeDtypeStruct(
            shape, dt, sharding=NamedSharding(mesh, spec)
        ),
        shapes, param_shardings(cfg),
        is_leaf=lambda x: isinstance(x, tuple),
    )
    b, t = 8, 128
    tokens = jax.ShapeDtypeStruct((b, t), jnp.int32)
    valid = jax.ShapeDtypeStruct((b, t), jnp.bool_)
    lowered = dec2._prefill.lower(params, None, tokens, valid, max_len=256)
    compiled = lowered.compile()
    assert compiled is not None

    cshard = cache_shardings(mesh)
    cache = {
        "k": jax.ShapeDtypeStruct((l, b, 256, nkv, hd), dt,
                                  sharding=cshard["k"]),
        "v": jax.ShapeDtypeStruct((l, b, 256, nkv, hd), dt,
                                  sharding=cshard["v"]),
        "length": jax.ShapeDtypeStruct((b,), jnp.int32,
                                       sharding=cshard["length"]),
    }
    prev = jax.ShapeDtypeStruct((b,), jnp.int32)
    fin = jax.ShapeDtypeStruct((b,), jnp.bool_)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    lowered = dec2._decode_chunk.lower(
        params, None, cache, prev, fin, key,
        n_steps=8, temperature=0.0, top_p=1.0, eos_id=2,
    )
    compiled = lowered.compile()
    # the compiled decode must communicate (tp collectives), not replicate
    hlo = compiled.as_text()
    assert "all-reduce" in hlo or "reduce-scatter" in hlo or "all-gather" in hlo


def test_sharded_max_batch_chunking(mesh, tiny_setup):
    """Prompt lists beyond max_batch are served in chunks with identical
    greedy outputs (the eval sweeps hand 512 prompts at once; the KV pool
    must stay bounded)."""
    params, sharded = tiny_setup
    tok = ByteTokenizer()
    gen = GenerationConfig(max_new_tokens=8, temperature=0.0, stop=())
    prompts = [f"hello world {i}" for i in range(10)]

    one = ShardedEngine(params, TINY, tok,
                        make_mesh(MeshConfig(1, 1, 1), jax.devices()[:1]),
                        max_len=64, max_batch=4)
    base = InferenceEngine(params, TINY, tok, max_len=64, max_batch=4)
    a = one.generate(prompts, gen)
    b = base.generate(prompts, gen)
    assert [x.token_ids for x in a] == [y.token_ids for y in b]


def test_prefix_cache_exactness(mesh, tiny_setup, monkeypatch):
    """Automatic prefix caching (shared few-shot preamble prefilled once,
    KV broadcast to the batch) must not change greedy outputs vs the
    uncached path — and must actually engage for long shared prefixes."""
    _, sharded = tiny_setup
    tok = ByteTokenizer()
    gen = GenerationConfig(max_new_tokens=10, temperature=0.0, stop=())
    preamble = ("### Instruction: do the thing per the examples above. " * 3)
    prompts = [preamble + tail for tail in
               ("first input", "a second, longer input string", "third x")]

    seen = {}
    orig = ShardedDecoder.generate_ids

    def spy(self, *a, **kw):
        seen["prefix"] = kw.get("shared_prefix_len", 0)
        return orig(self, *a, **kw)

    monkeypatch.setattr(ShardedDecoder, "generate_ids", spy)
    cached = ShardedEngine(sharded, TINY, tok, mesh, max_len=256, chunk=4)
    got = cached.generate(prompts, gen)
    assert seen["prefix"] >= 64, "prefix cache did not engage"

    uncached = ShardedEngine(sharded, TINY, tok, mesh, max_len=256, chunk=4,
                             prefix_cache=False)
    want = uncached.generate(prompts, gen)
    for g, w in zip(got, want):
        assert g.token_ids == w.token_ids
        np.testing.assert_allclose(g.logprobs, w.logprobs, atol=1e-4)
        assert g.text == w.text


def test_oom_fallback_halves_batch(mesh, tiny_setup, monkeypatch):
    """RESOURCE_EXHAUSTED during a batch transparently re-serves it in
    halves (same contract as the speculative engine), with outputs equal
    to the unsplit greedy decode; non-OOM errors still propagate."""
    _, sharded = tiny_setup
    tok = ByteTokenizer()
    gen = GenerationConfig(max_new_tokens=8, temperature=0.0, stop=())
    prompts = ["hello world", "abcdefgh", "something longer here", "zz"]

    eng = ShardedEngine(sharded, TINY, tok, mesh, max_len=64,
                        prefix_cache=False)
    want = eng.generate(prompts, gen)

    eng2 = ShardedEngine(sharded, TINY, tok, mesh, max_len=64,
                         prefix_cache=False)
    real = ShardedEngine._generate_batch
    calls = {"n": 0}

    def flaky(self, ps, g):
        calls["n"] += 1
        if len(ps) > 1 and calls["n"] == 1:
            raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")
        return real(self, ps, g)

    monkeypatch.setattr(ShardedEngine, "_generate_batch", flaky)
    got = eng2.generate(prompts, gen)
    assert calls["n"] == 3
    assert [g.token_ids for g in got] == [w.token_ids for w in want]

    def always(self, ps, g):
        raise ValueError("not an oom")

    monkeypatch.setattr(ShardedEngine, "_generate_batch", always)
    with pytest.raises(ValueError):
        eng2.generate(prompts, gen)

    # XLA:TPU compile-time permanent OOM (long-prompt cells exceed the HBM
    # live-range peak at lowering, before any allocation happens) must
    # self-heal identically to runtime RESOURCE_EXHAUSTED
    eng3 = ShardedEngine(sharded, TINY, tok, mesh, max_len=64,
                         prefix_cache=False)
    calls["n"] = 0

    def compile_oom(self, ps, g):
        calls["n"] += 1
        if len(ps) > 1 and calls["n"] == 1:
            raise RuntimeError(
                "INTERNAL: HTTP 500: tpu_compile_helper: XLA:TPU compile "
                "permanent error. Ran out of memory in memory space hbm. "
                "Used 25.35G of 15.75G hbm.")
        return real(self, ps, g)

    monkeypatch.setattr(ShardedEngine, "_generate_batch", compile_oom)
    got3 = eng3.generate(prompts, gen)
    assert calls["n"] == 3
    assert [g.token_ids for g in got3] == [w.token_ids for w in want]

    # the device tunnel's REMOTE compile path swallows the OOM text: the
    # Python-visible exception is only an opaque remote_compile HTTP 500
    # (the 'Ran out of memory' line goes to the tunnel terminal's log).
    # Measured on the matched wave_nc1 2-shot cell; must self-heal too.
    eng4 = ShardedEngine(sharded, TINY, tok, mesh, max_len=64,
                         prefix_cache=False)
    calls["n"] = 0

    def tunnel_500(self, ps, g):
        calls["n"] += 1
        if len(ps) > 1 and calls["n"] == 1:
            raise RuntimeError(
                "INTERNAL: http://127.0.0.1:8113/remote_compile: HTTP "
                "500: tpu_compile_helper subprocess exit code 1")
        return real(self, ps, g)

    monkeypatch.setattr(ShardedEngine, "_generate_batch", tunnel_500)
    got4 = eng4.generate(prompts, gen)
    assert calls["n"] == 3
    assert [g.token_ids for g in got4] == [w.token_ids for w in want]
