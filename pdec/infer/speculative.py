"""Speculative decoding: draft-propose, target-verify, exact acceptance.

vLLM-parity serving feature (the reference's serving tier is vLLM,
``requirements.txt:170``; vLLM ships speculative decoding as its
latency lever for small-batch serving).  A small DRAFT model proposes
``k`` tokens autoregressively; the TARGET model scores all ``k`` in ONE
forward pass; the longest accepted prefix is emitted plus one
correction/bonus token, so each target dispatch yields 1..k+1 tokens:

- ``temperature == 0``: accept while the target's argmax equals the
  draft token — output is BITWISE IDENTICAL to plain greedy decoding
  (asserted in tests), the speedup is pure.
- ``temperature > 0``: Leviathan et al. rejection sampling — accept
  draft token ``d`` with prob ``min(1, p_t(d)/p_d(d))``; on rejection
  sample the correction from ``normalize((p_t - p_d)+)``.  The emitted
  sequence is distributed EXACTLY as target-only sampling (the
  acceptance math is unit-tested against brute-force total variation).
  ``top_p < 1`` is not supported under speculation (nucleus truncation
  breaks the residual-distribution identity) — callers fall back to the
  plain decoder.

Cache bookkeeping: the verify pass appends K/V for all ``k+1`` positions;
rejected tails are rolled back by resetting ``cache["length"]`` — sound
because `pdec.models.transformer.forward` writes cache slots with
REPLACE semantics, so stale entries are overwritten when real tokens
land there.  Draft and target caches advance in lockstep (one extra
draft forward writes the k-th draft's K/V for the bonus-acceptance
case).

Both models must share one tokenizer/vocabulary.  Sharding follows
`pdec.infer.sharded` (rows over (data, fsdp), kv-heads over tp).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from pdec.infer.engine import Generation, GenerationConfig
from pdec.infer.sharded import (
    _is_hbm_oom,
    batch_rows_sharding,
    cache_shardings,
)
from pdec.models.config import ModelConfig
from pdec.models.transformer import forward, init_kv_cache


def speculative_accept(key, p_t, p_d, drafts, greedy_pred=None):
    """Pure acceptance math (Leviathan rejection sampling), batched.

    p_t: [B, k+1, V] target probabilities (temperature-scaled);
    p_d: [B, k, V] draft probabilities; drafts: [B, k] proposed ids.
    greedy_pred: [B, k+1] target argmax — when given, greedy acceptance
    is used instead of rejection sampling (temperature == 0).

    Returns (a [B] accepted-prefix length, correction_token [B]).
    """
    b, k = drafts.shape
    if greedy_pred is not None:
        match = greedy_pred[:, :k] == drafts
        acc = jnp.cumprod(match.astype(jnp.int32), axis=1)
        a = jnp.sum(acc, axis=1)
        corr = jnp.take_along_axis(greedy_pred, a[:, None], axis=1)[:, 0]
        return a, corr

    k_u, k_c = jax.random.split(key)
    pt_d = jnp.take_along_axis(p_t[:, :k], drafts[..., None], -1)[..., 0]
    pd_d = jnp.take_along_axis(p_d, drafts[..., None], -1)[..., 0]
    u = jax.random.uniform(k_u, drafts.shape)
    accept = u * pd_d <= pt_d  # u <= p_t/p_d without the division
    acc = jnp.cumprod(accept.astype(jnp.int32), axis=1)
    a = jnp.sum(acc, axis=1)
    # correction: residual (p_t - p_d)+ at the rejection position; after a
    # full acceptance (a == k) there is no draft dist -> residual = p_t[k]
    p_d_pad = jnp.concatenate([p_d, jnp.zeros_like(p_d[:, :1])], axis=1)
    p_t_a = jnp.take_along_axis(p_t, a[:, None, None], axis=1)[:, 0]
    p_d_a = jnp.take_along_axis(p_d_pad, a[:, None, None], axis=1)[:, 0]
    resid = jnp.maximum(p_t_a - p_d_a, 0.0)
    resid = resid / jnp.maximum(resid.sum(-1, keepdims=True), 1e-30)
    corr = jax.random.categorical(k_c, jnp.log(resid + 1e-30))
    return a, corr


class SpeculativeDecoder:
    """Draft+target decode over token-id arrays (mesh-sharded)."""

    def __init__(self, params, cfg: ModelConfig, draft_params,
                 draft_cfg: ModelConfig, mesh: Mesh, k: int = 4,
                 max_len: int = 4096, lora=None):
        if cfg.vocab_size != draft_cfg.vocab_size:
            raise ValueError(
                "speculative decoding requires a shared vocabulary "
                f"(target {cfg.vocab_size} vs draft {draft_cfg.vocab_size})"
            )
        self.params = params
        self.cfg = cfg
        self.draft_params = draft_params
        self.draft_cfg = draft_cfg
        self.mesh = mesh
        self.k = k
        self.max_len = max_len
        self.lora = lora
        self.batch_mult = mesh.shape["data"] * mesh.shape["fsdp"]

        rows = batch_rows_sharding(mesh)
        cshard = cache_shardings(mesh)

        def make_prefill(model_cfg):
            @functools.partial(
                jax.jit, static_argnames=("max_len",),
                out_shardings=(rows, cshard),
            )
            def prefill(ps, lora_, tokens, valid, max_len):
                cache = init_kv_cache(model_cfg, tokens.shape[0], max_len)
                last = jnp.maximum(jnp.sum(valid, axis=1) - 1, 0)
                logits, cache = forward(
                    ps, tokens, model_cfg, kv_cache=cache, attn_mask=valid,
                    lora=lora_, gather_positions=last,
                )
                cache = dict(cache)
                cache["length"] = jnp.sum(valid, axis=1).astype(jnp.int32)
                return logits[:, 0], cache

            return prefill

        self._prefill_t = make_prefill(cfg)
        self._prefill_d = make_prefill(draft_cfg)

        tcfg, dcfg = cfg, draft_cfg

        @functools.partial(
            jax.jit,
            static_argnames=("k", "temperature", "eos_id"),
            donate_argnums=(2, 3),
        )
        def spec_step(ps, dps, cache, dcache, prev, finished, key, lora_,
                      k, temperature, eos_id):
            keys = jax.random.split(key, k + 1)
            t_len0 = cache["length"]
            d_len0 = dcache["length"]

            # ---- draft proposes k tokens (its cache appends each) ----
            def draft_body(carry, kj):
                dc, pv = carry
                logits, dc = forward(dps, pv[:, None], dcfg, kv_cache=dc)
                logits = logits[:, 0].astype(jnp.float32)
                if temperature == 0.0:
                    tok = jnp.argmax(logits, -1)
                    probs = jnp.zeros_like(logits)  # unused in greedy
                else:
                    scaled = logits / temperature
                    tok = jax.random.categorical(kj, scaled)
                    probs = jax.nn.softmax(scaled)
                return (dc, tok), (tok, probs)

            (dcache, last_d), (drafts, dprobs) = jax.lax.scan(
                draft_body, (dcache, prev), keys[:k]
            )
            drafts = drafts.T  # [B, k]
            dprobs = jnp.moveaxis(dprobs, 0, 1)  # [B, k, V]
            # write the k-th draft's K/V (bonus-acceptance needs it)
            _, dcache = forward(dps, last_d[:, None], dcfg, kv_cache=dcache)

            # ---- target verifies [prev, d_1..d_k] in one pass ----
            tokens_in = jnp.concatenate([prev[:, None], drafts], axis=1)
            logits_t, cache = forward(
                ps, tokens_in, tcfg, kv_cache=cache, lora=lora_
            )
            logits_t = logits_t.astype(jnp.float32)

            if temperature == 0.0:
                pred = jnp.argmax(logits_t, -1)
                a, corr = speculative_accept(
                    keys[k], None, None, drafts, greedy_pred=pred
                )
            else:
                p_t = jax.nn.softmax(logits_t / temperature)
                a, corr = speculative_accept(keys[k], p_t, dprobs, drafts)

            # ---- emitted tokens: [d_1..d_a, corr] ----
            pos = jnp.arange(k + 1)[None, :]
            drafts_pad = jnp.concatenate(
                [drafts, jnp.zeros_like(drafts[:, :1])], axis=1
            )
            tokens_out = jnp.where(pos < a[:, None], drafts_pad, 0)
            tokens_out = jnp.where(pos == a[:, None], corr[:, None],
                                   tokens_out)
            n_emit = a + 1
            # recorded logprobs: log_softmax of UNSCALED target logits
            # (the `_sample` convention, engine.py)
            lps = jax.nn.log_softmax(logits_t, -1)
            lp_out = jnp.take_along_axis(
                lps, tokens_out[..., None], -1
            )[..., 0]

            # EOS clamps the emission at its position (inclusive)
            is_eos = (tokens_out == eos_id) & (pos < n_emit[:, None])
            eos_any = is_eos.any(axis=1)
            first_eos = jnp.argmax(is_eos, axis=1)
            n_emit = jnp.where(eos_any, first_eos + 1, n_emit)
            # finished rows emit nothing; their caches rewind fully
            n_emit = jnp.where(finished, 0, n_emit)
            last_idx = jnp.maximum(n_emit - 1, 0)
            new_prev = jnp.where(
                n_emit > 0,
                jnp.take_along_axis(tokens_out, last_idx[:, None], 1)[:, 0],
                prev,
            )
            finished = finished | eos_any

            # ---- cache rewind: keep prev + the accepted drafts ----
            cache = dict(cache)
            cache["length"] = t_len0 + n_emit
            dcache = dict(dcache)
            dcache["length"] = d_len0 + n_emit
            return (cache, dcache, new_prev, finished, tokens_out, n_emit,
                    lp_out)

        self._spec_step = spec_step

    def generate_ids(self, prompt_ids, prompt_valid, max_new_tokens: int,
                     eos_id: int, temperature: float = 0.0, seed: int = 0,
                     stop_check=None) -> Tuple[List[List[int]],
                                               List[List[float]]]:
        """Returns per-row (ids, logprobs) lists (RAGGED — rows advance at
        different speculative rates).  ``stop_check(row, new_ids) -> bool``
        is called per row with each row's newly emitted ids; returning
        True marks the row finished (host-side stop strings)."""
        b = prompt_ids.shape[0]
        if b % self.batch_mult:
            raise ValueError(f"batch {b} not a multiple of {self.batch_mult}")
        rows = batch_rows_sharding(self.mesh)
        tokens = jax.device_put(jnp.asarray(prompt_ids), rows)
        valid = jax.device_put(jnp.asarray(prompt_valid), rows)

        last_logits, cache = self._prefill_t(
            self.params, self.lora, tokens, valid, max_len=self.max_len
        )
        _, dcache = self._prefill_d(
            self.draft_params, None, tokens, valid, max_len=self.max_len
        )
        key = jax.random.PRNGKey(seed)
        key, k0 = jax.random.split(key)
        from pdec.infer.engine import _sample

        first, logprobs0 = _sample(last_logits, k0, temperature, 1.0)
        first_lp = jnp.take_along_axis(
            logprobs0, first[:, None], axis=-1
        )[:, 0]

        out_ids: List[List[int]] = [[t] for t in np.asarray(first).tolist()]
        out_lps: List[List[float]] = [
            [v] for v in np.asarray(first_lp).tolist()
        ]
        fin_h = np.asarray(first == eos_id).copy()
        if stop_check is not None:
            for i in range(b):
                if not fin_h[i] and stop_check(i, out_ids[i]):
                    fin_h[i] = True
        prev = first
        finished = jax.device_put(jnp.asarray(fin_h), rows)

        while not fin_h.all() and min(
            len(x) for i, x in enumerate(out_ids) if not fin_h[i]
        ) < max_new_tokens:
            key, k = jax.random.split(key)
            (cache, dcache, prev, finished, toks, n_emit, lps) = (
                self._spec_step(
                    self.params, self.draft_params, cache, dcache, prev,
                    finished, k, self.lora, k=self.k,
                    temperature=temperature, eos_id=eos_id,
                )
            )
            toks_h = np.asarray(toks)
            n_h = np.asarray(n_emit)
            lps_h = np.asarray(lps)
            extra = np.zeros((b,), bool)
            for i in range(b):
                take = min(int(n_h[i]), max_new_tokens - len(out_ids[i]))
                if take <= 0:
                    continue
                new = toks_h[i, :take].tolist()
                out_ids[i].extend(new)
                out_lps[i].extend(lps_h[i, :take].tolist())
                if stop_check is not None and not fin_h[i]:
                    if stop_check(i, new):
                        extra[i] = True
                if len(out_ids[i]) >= max_new_tokens:
                    extra[i] = True
            fin_h = np.asarray(finished) | extra
            if extra.any():
                finished = jax.device_put(jnp.asarray(fin_h), rows)
        return out_ids, out_lps


class SpeculativeEngine:
    """Text-level engine mirroring `ShardedEngine.generate`, backed by
    draft-verify speculative decoding.  Falls back to requiring
    ``top_p == 1`` (nucleus truncation breaks exact acceptance)."""

    def __init__(self, params, model_cfg: ModelConfig, draft_params,
                 draft_cfg: ModelConfig, tokenizer, mesh: Mesh, k: int = 4,
                 lora=None, max_len: Optional[int] = None,
                 max_batch: int = 256):
        self.tokenizer = tokenizer
        self.cfg = model_cfg
        self.draft_cfg = draft_cfg
        self.max_len = max_len or model_cfg.max_seq
        self.mesh = mesh
        self.k = k
        self._params = params
        self._draft_params = draft_params
        self._lora = lora
        self._dec_cache = {}
        self.max_batch = max_batch

    def _decoder(self, total_len: int) -> SpeculativeDecoder:
        if total_len not in self._dec_cache:
            self._dec_cache[total_len] = SpeculativeDecoder(
                self._params, self.cfg, self._draft_params, self.draft_cfg,
                self.mesh, k=self.k, max_len=total_len, lora=self._lora,
            )
        return self._dec_cache[total_len]

    def generate(self, prompts: Sequence[str],
                 gen: GenerationConfig = GenerationConfig()
                 ) -> List[Generation]:
        if gen.top_p < 1.0 and gen.temperature > 0.0:
            raise ValueError(
                "speculative decoding requires top_p == 1 (use "
                "ShardedEngine for nucleus sampling)"
            )
        if len(prompts) > self.max_batch:
            import dataclasses

            from pdec.infer.engine import chunk_seed

            out: List[Generation] = []
            for ci, i in enumerate(range(0, len(prompts), self.max_batch)):
                sub = dataclasses.replace(gen, seed=chunk_seed(gen.seed, ci))
                out.extend(self.generate(prompts[i:i + self.max_batch], sub))
            return out
        try:
            return self._generate_batch(prompts, gen)
        except Exception as e:  # device OOM is data-dependent (prompt len)
            if len(prompts) == 1 or not _is_hbm_oom(e):
                raise
            # HBM exhausted at this (batch, total_len): draft + target KV
            # for a long-prompt MID cell can overflow a 16 GiB chip at the
            # default max_batch. Drop cached decoders (their buffers) and
            # serve the request in two halves — recursion finds the
            # largest batch that fits instead of failing the eval cell.
            self._dec_cache.clear()
            import dataclasses

            from pdec.infer.engine import chunk_seed

            h = (len(prompts) + 1) // 2
            out = []
            for ci, part in enumerate((prompts[:h], prompts[h:])):
                sub = dataclasses.replace(gen, seed=chunk_seed(gen.seed, ci))
                out.extend(self.generate(list(part), sub))
            return out

    def _generate_batch(self, prompts: Sequence[str],
                        gen: GenerationConfig) -> List[Generation]:
        tok = self.tokenizer
        eos_id = tok.eos_token_id
        n = len(prompts)
        mult = self.mesh.shape["data"] * self.mesh.shape["fsdp"]
        from pdec.infer.engine import prepare_prompt_batch

        tokens, valid, _clipped, total_len, bsz = prepare_prompt_batch(
            tok, prompts, gen, mult, self.max_len
        )

        from pdec.cpp.tokenizer import StreamDecoder

        streams = [StreamDecoder(tok) for _ in range(n)]

        def stop_check(i, new_ids):
            if i >= n:
                return True  # padding rows never need more tokens
            streams[i].feed(new_ids)
            return streams[i].stopped(gen.stop)

        dec = self._decoder(total_len)
        ids, lps = dec.generate_ids(
            tokens, valid, gen.max_new_tokens, eos_id,
            temperature=gen.temperature, seed=gen.seed,
            stop_check=stop_check,
        )
        from pdec.infer.engine import finalize_generation

        return [
            finalize_generation(tok, ids[i], lps[i], eos_id, gen)
            for i in range(n)
        ]
