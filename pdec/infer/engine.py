"""Prefill + decode generation engine.

Batched, jitted, shape-bucketed.  One compiled prefill per (batch_bucket,
len_bucket) and one compiled decode step per batch_bucket; eval sweeps
(512 examples x formats x shots, reference ``test_pdecontrol.sh:55-99``)
reuse the same executables throughout.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pdec.models.config import ModelConfig
from pdec.models.transformer import forward, init_kv_cache


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int = 512
    temperature: float = 0.0  # 0 => greedy
    top_p: float = 1.0
    stop: tuple = ("\n### Instruction:", "### Instruction:")
    seed: int = 0
    logprobs: bool = True


@dataclasses.dataclass
class Generation:
    text: str
    token_ids: List[int]
    logprobs: Optional[List[float]]
    finish_reason: str  # 'stop' | 'eos' | 'length'


def _bucket(n: int, buckets=(1, 2, 4, 8, 16, 32, 64, 128, 256)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return ((n + 255) // 256) * 256


def _len_bucket(n: int, step: int = 256) -> int:
    return max(step, ((n + step - 1) // step) * step)


def _sample(logits, key, temperature, top_p):
    logits = logits.astype(jnp.float32)
    greedy = jnp.argmax(logits, axis=-1)
    if temperature == 0.0:
        return greedy, jax.nn.log_softmax(logits, axis=-1)
    scaled = logits / jnp.maximum(temperature, 1e-6)
    if top_p < 1.0:
        sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum(cum < top_p, axis=-1)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], axis=-1)
        scaled = jnp.where(scaled < cutoff, -1e30, scaled)
    sampled = jax.random.categorical(key, scaled, axis=-1)
    return sampled, jax.nn.log_softmax(logits, axis=-1)


def prepare_prompt_batch(tokenizer, prompts, gen, row_mult: int,
                         max_len: int):
    """Shared prompt-batch scaffold for the batched engines.

    Encodes, truncates to the padded prompt bucket (keeping each row's
    TAIL, ``e[-t_pad:]``), right-pads into [bsz, t_pad] id/valid arrays
    with ``bsz`` rounded up to ``row_mult`` (padding rows get one valid
    slot), and buckets the total sequence length.  Both `ShardedEngine`
    and `SpeculativeEngine` call this — their greedy-equivalence
    guarantee depends on the prompt-side conventions staying identical.

    Returns (tokens, valid, clipped, total_len, bsz).
    """
    import numpy as _np

    encoded = [tokenizer.encode(p) for p in prompts]
    n = len(encoded)
    bsz = ((max(n, 1) + row_mult - 1) // row_mult) * row_mult
    max_prompt = max(len(e) for e in encoded)
    t_pad = min(_len_bucket(max_prompt), max_len)
    total_len = min(
        _len_bucket(t_pad + gen.max_new_tokens),
        max_len + gen.max_new_tokens,
    )
    tokens = _np.zeros((bsz, t_pad), _np.int32)
    valid = _np.zeros((bsz, t_pad), bool)
    clipped = []
    for i, e in enumerate(encoded):
        e = e[-t_pad:]
        clipped.append(e)
        tokens[i, : len(e)] = e
        valid[i, : len(e)] = True
    for i in range(n, bsz):
        valid[i, :1] = True
    return tokens, valid, clipped, total_len, bsz


def finalize_generation(tokenizer, ids, lps, eos_id,
                        gen: GenerationConfig) -> Generation:
    """Trim at eos/stop and truncate logprobs to the kept tokens.

    The kept-token count is derived from the generated token stream's own
    byte positions — NOT by re-encoding the trimmed text: BPE is not
    prefix-stable, so ``encode(trim(decode(ids)))`` need not align with
    ``ids`` (the same boundary-merge trap as the round-2 tokenization bug;
    mirrors the reference's ``extract_logits_without_stop_words``,
    ``eval/utils.py:293-315``, which drops stop-word token logprobs).
    """
    ids = list(ids)
    finish = "length"
    if eos_id in ids:
        cut = ids.index(eos_id)
        ids, lps = ids[:cut], lps[:cut]
        finish = "eos"

    if hasattr(tokenizer, "decode_bytes"):
        raw = tokenizer.decode_bytes(ids)
        boundary = None
        for s in gen.stop:
            pos = raw.find(s.encode("utf-8"))
            if pos >= 0 and (boundary is None or pos < boundary):
                boundary = pos
        if boundary is not None:
            finish = "stop"
            text = raw[:boundary].decode("utf-8", errors="ignore")
            # tokens whose bytes fall entirely before the stop boundary
            acc = kept = 0
            for t in ids:
                n = len(tokenizer.decode_bytes([t]))
                if acc + n > boundary:
                    break
                acc += n
                kept += 1
            lps = lps[:kept]
        else:
            text = raw.decode("utf-8", errors="ignore")
    else:
        text = tokenizer.decode(ids)
        boundary = None
        for s in gen.stop:
            pos = text.find(s)
            if pos >= 0 and (boundary is None or pos < boundary):
                boundary = pos
        if boundary is not None:
            finish = "stop"
            text = text[:boundary]
            # decoded length is monotone in token count: binary-search the
            # largest prefix that fits before the stop boundary
            lo, hi = 0, len(ids)
            while lo < hi:
                k = (lo + hi + 1) // 2
                if len(tokenizer.decode(ids[:k])) <= boundary:
                    lo = k
                else:
                    hi = k - 1
            lps = lps[:lo]
    return Generation(
        text=text,
        token_ids=ids,
        logprobs=[float(v) for v in np.asarray(lps).tolist()],
        finish_reason=finish,
    )


def chunk_seed(seed: int, chunk_index: int) -> int:
    """Distinct deterministic seed per served chunk (chunk 0 keeps the
    caller's seed so chunked == unchunked holds for single-chunk calls;
    with temperature>0, later chunks must not replay chunk 0's keys)."""
    if chunk_index == 0:
        return seed
    return (seed + 0x9E3779B1 * chunk_index) % (2**31)


class InferenceEngine:
    """Holds (params, config, tokenizer) and serves batched generation."""

    def __init__(self, params, model_cfg: ModelConfig, tokenizer,
                 lora=None, max_len: Optional[int] = None,
                 max_batch: int = 256):
        self.params = params
        self.cfg = model_cfg
        self.tokenizer = tokenizer
        self.lora = lora
        self.max_len = max_len or model_cfg.max_seq
        # HBM ceiling: the KV cache is O(batch x total_len); dispatches
        # beyond max_batch are served in chunks instead of one allocation
        self.max_batch = max_batch

        cfg = model_cfg

        @functools.partial(jax.jit, static_argnames=("max_len",))
        def prefill(params, lora, tokens, valid, max_len):
            cache = init_kv_cache(cfg, tokens.shape[0], max_len)
            # LM-head projection only at each sequence's last valid
            # position (gather_positions): avoids the [B, T, V] logits
            last = jnp.maximum(jnp.sum(valid, axis=1) - 1, 0)
            logits, cache = forward(
                params, tokens, cfg, kv_cache=cache, attn_mask=valid,
                lora=lora, gather_positions=last,
            )
            last_logits = logits[:, 0]
            # correct per-seq cache length (masked writes counted)
            cache = dict(cache)
            cache["length"] = jnp.sum(valid, axis=1).astype(jnp.int32)
            return last_logits, cache

        @functools.partial(jax.jit, static_argnames=("temperature", "top_p"))
        def decode_step(params, lora, cache, prev_token, key, temperature, top_p):
            logits, cache = forward(
                params, prev_token[:, None], cfg, kv_cache=cache, lora=lora
            )
            tok, logprobs = _sample(logits[:, 0], key, temperature, top_p)
            lp = jnp.take_along_axis(logprobs, tok[:, None], axis=-1)[:, 0]
            return cache, tok, lp

        self._prefill = prefill
        self._decode_step = decode_step

    def generate(
        self, prompts: Sequence[str], gen: GenerationConfig = GenerationConfig()
    ) -> List[Generation]:
        if len(prompts) > self.max_batch:
            out: List[Generation] = []
            for ci, i in enumerate(range(0, len(prompts), self.max_batch)):
                sub = dataclasses.replace(
                    gen, seed=chunk_seed(gen.seed, ci)
                )
                out.extend(
                    self.generate(prompts[i : i + self.max_batch], sub)
                )
            return out
        tok = self.tokenizer
        encoded = [tok.encode(p) for p in prompts]
        n = len(encoded)
        bsz = _bucket(n)
        max_prompt = max(len(e) for e in encoded)
        t_pad = min(_len_bucket(max_prompt), self.max_len)
        total_len = min(
            _len_bucket(t_pad + gen.max_new_tokens), self.max_len + gen.max_new_tokens
        )

        tokens = np.zeros((bsz, t_pad), np.int32)
        valid = np.zeros((bsz, t_pad), bool)
        for i, e in enumerate(encoded):
            e = e[-t_pad:]
            tokens[i, : len(e)] = e
            valid[i, : len(e)] = True
        # padding rows (bucket slack) get a dummy token to keep shapes sane
        for i in range(n, bsz):
            valid[i, :1] = True

        last_logits, cache = self._prefill(
            self.params, self.lora, jnp.asarray(tokens), jnp.asarray(valid),
            max_len=total_len,
        )

        key = jax.random.PRNGKey(gen.seed)
        k0, key = jax.random.split(key)
        first_tok, logprobs0 = _sample(
            last_logits, k0, gen.temperature, gen.top_p
        )
        first_lp = jnp.take_along_axis(
            logprobs0, first_tok[:, None], axis=-1
        )[:, 0]

        eos_id = tok.eos_token_id
        out_tokens = [np.asarray(first_tok)]
        out_lps = [np.asarray(first_lp)]
        prev = first_tok
        finished = np.asarray(first_tok) == eos_id

        # incremental detokenizers: the periodic stop check decodes only
        # the tokens generated since the previous check (pdec.cpp.tokenizer
        # StreamDecoder), not the whole generation every time
        from pdec.cpp.tokenizer import StreamDecoder

        streams = [StreamDecoder(tok) for _ in range(n)]
        done = np.zeros((bsz,), bool)
        done[n:] = True
        fed = 0

        def check_stops(step_count) -> bool:
            nonlocal fed
            arr = np.stack(out_tokens, axis=1)
            for i in range(n):
                if done[i]:
                    continue
                ids = arr[i, fed:step_count]
                if eos_id in ids.tolist():
                    done[i] = True
                    continue
                streams[i].feed(ids)
                if streams[i].stopped(gen.stop):
                    done[i] = True
            fed = step_count
            return bool(done.all())

        check_every = 16
        for step in range(1, gen.max_new_tokens):
            key, k = jax.random.split(key)
            cache, prev, lp = self._decode_step(
                self.params, self.lora, cache, prev, k,
                gen.temperature, gen.top_p,
            )
            out_tokens.append(np.asarray(prev))
            out_lps.append(np.asarray(lp))
            if step % check_every == 0 or step == gen.max_new_tokens - 1:
                if check_stops(step + 1):
                    break

        arr = np.stack(out_tokens, axis=1)  # [bsz, steps]
        lps = np.stack(out_lps, axis=1)
        return [
            finalize_generation(
                self.tokenizer, arr[i].tolist(), lps[i], eos_id, gen
            )
            for i in range(n)
        ]
