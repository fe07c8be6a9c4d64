"""Continuous batching: slot-reuse scheduling over a shared KV pool.

The reference leans on vLLM for throughput (``--use_vllm`` everywhere);
vLLM's core trick is that sequences finish at different times, so a static
batch strands capacity.  This engine keeps a fixed pool of ``n_slots``
cache slots and, whenever a sequence finishes (eos / stop / length), immediately
prefills the next queued request into the freed slot while the other slots
keep decoding — no global re-batching, no recompile (all shapes static).

Prefill runs per-request on a [1, T] view and is scattered into the pool
at the slot index; decode steps the whole pool with finished slots masked.
Paged (block-granular) KV allocation is the planned next step
(docs/PARITY.md roadmap); slot-granular reuse already removes the
straggler-convoy effect that dominates eval sweeps with mixed lengths.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pdec.infer.engine import Generation, GenerationConfig, _sample
from pdec.models.config import ModelConfig
from pdec.models.transformer import forward, init_kv_cache


class ContinuousEngine:
    def __init__(self, params, model_cfg: ModelConfig, tokenizer,
                 n_slots: int = 8, max_len: int = 2048, lora=None):
        self.params = params
        self.cfg = model_cfg
        self.tokenizer = tokenizer
        self.n_slots = n_slots
        self.max_len = max_len
        self.lora = lora
        cfg = model_cfg

        @jax.jit
        def prefill_one(params, lora, tokens):  # [1, T] padded, valid mask
            ids, valid = tokens
            cache = init_kv_cache(cfg, 1, ids.shape[1])
            last = jnp.maximum(jnp.sum(valid, axis=1) - 1, 0)
            logits, cache = forward(
                params, ids, cfg, kv_cache=cache, attn_mask=valid,
                lora=lora, gather_positions=last,
            )
            last_logits = logits[:, 0]
            return last_logits[0], cache["k"], cache["v"], jnp.sum(valid)

        @jax.jit
        def install_slot(pool_k, pool_v, lengths, slot, k, v, length, t_src):
            # copy the prefilled [L, t_src, ...] prefix into the pool slot
            pool_k = jax.lax.dynamic_update_slice(
                pool_k, k[:, None], (0, slot, 0, 0, 0)
            )
            pool_v = jax.lax.dynamic_update_slice(
                pool_v, v[:, None], (0, slot, 0, 0, 0)
            )
            lengths = lengths.at[slot].set(length)
            return pool_k, pool_v, lengths

        @functools.partial(jax.jit, static_argnames=("temperature", "top_p"))
        def decode_step(params, lora, cache, prev_tok, key, temperature, top_p):
            logits, cache = forward(
                params, prev_tok[:, None], cfg, kv_cache=cache, lora=lora
            )
            tok, logprobs = _sample(logits[:, 0], key, temperature, top_p)
            lp = jnp.take_along_axis(logprobs, tok[:, None], axis=-1)[:, 0]
            return cache, tok, lp

        self._prefill_one = prefill_one
        self._install = install_slot
        self._decode = decode_step

    def generate(self, prompts: Sequence[str],
                 gen: GenerationConfig = GenerationConfig()) -> List[Generation]:
        tok = self.tokenizer
        eos = tok.eos_token_id
        queue = list(range(len(prompts)))
        results: List[Optional[Generation]] = [None] * len(prompts)

        pool = init_kv_cache(self.cfg, self.n_slots, self.max_len)
        pool_k, pool_v = pool["k"], pool["v"]
        lengths = jnp.zeros((self.n_slots,), jnp.int32)
        slot_req = [-1] * self.n_slots  # request index per slot
        slot_tokens: List[List[int]] = [[] for _ in range(self.n_slots)]
        slot_lps: List[List[float]] = [[] for _ in range(self.n_slots)]
        from pdec.cpp.tokenizer import StreamDecoder

        slot_streams = [StreamDecoder(tok) for _ in range(self.n_slots)]
        slot_fed = [0] * self.n_slots
        prev_tok = np.zeros((self.n_slots,), np.int32)
        key = jax.random.PRNGKey(gen.seed)

        prefill_pad = 256

        def admit(slot):
            nonlocal pool_k, pool_v, lengths, key
            req = queue.pop(0)
            ids = tok.encode(prompts[req])[-(self.max_len - gen.max_new_tokens):]
            t_pad = min(
                ((len(ids) + prefill_pad - 1) // prefill_pad) * prefill_pad,
                self.max_len,
            )
            arr = np.zeros((1, t_pad), np.int32)
            valid = np.zeros((1, t_pad), bool)
            arr[0, : len(ids)] = ids
            valid[0, : len(ids)] = True
            last_logits, k, v, length = self._prefill_one(
                self.params, self.lora, (jnp.asarray(arr), jnp.asarray(valid))
            )
            # pad the prefilled cache out to max_len before installing
            pad_t = self.max_len - k.shape[2]
            k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_t), (0, 0), (0, 0)))
            v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_t), (0, 0), (0, 0)))
            pool_k, pool_v, lengths = self._install(
                pool_k, pool_v, lengths, slot, k[:, 0], v[:, 0], length, t_pad
            )
            key, k1 = jax.random.split(key)
            first, logprobs = _sample(
                last_logits[None, :], k1, gen.temperature, gen.top_p
            )
            lp = float(
                jnp.take_along_axis(logprobs, first[:, None], axis=-1)[0, 0]
            )
            slot_req[slot] = req
            slot_tokens[slot] = [int(first[0])]
            slot_lps[slot] = [lp]
            prev_tok[slot] = int(first[0])
            slot_streams[slot] = StreamDecoder(tok)
            slot_fed[slot] = 0

        def finish(slot, reason):
            req = slot_req[slot]
            ids = slot_tokens[slot]
            lps = slot_lps[slot]
            if eos in ids:
                cut = ids.index(eos)
                ids, lps = ids[:cut], lps[:cut]
                reason = "eos"
            text = tok.decode(ids)
            for s in gen.stop:
                if s in text:
                    text = text.split(s)[0]
                    reason = "stop"
            results[req] = Generation(
                text=text, token_ids=ids, logprobs=lps, finish_reason=reason
            )
            slot_req[slot] = -1
            slot_tokens[slot] = []
            slot_lps[slot] = []

        def slot_done(slot) -> Optional[str]:
            ids = slot_tokens[slot]
            if not ids:
                return None
            if ids[-1] == eos:
                return "eos"
            if len(ids) >= gen.max_new_tokens:
                return "length"
            if len(ids) % 8 == 0:
                # incremental stop check: decode only tokens added since the
                # last check (pdec.cpp.tokenizer.StreamDecoder)
                sd = slot_streams[slot]
                sd.feed(ids[slot_fed[slot]:])
                slot_fed[slot] = len(ids)
                if sd.stopped(gen.stop):
                    return "stop"
            return None

        # steady-state loop
        while queue or any(r >= 0 for r in slot_req):
            # retire finished, admit queued
            for slot in range(self.n_slots):
                if slot_req[slot] >= 0:
                    reason = slot_done(slot)
                    if reason:
                        finish(slot, reason)
                if slot_req[slot] < 0 and queue:
                    admit(slot)
            if not any(r >= 0 for r in slot_req):
                break
            # one decode step over the pool
            key, k1 = jax.random.split(key)
            cache = {"k": pool_k, "v": pool_v, "length": lengths}
            cache, toks, lps = self._decode(
                self.params, self.lora, cache, jnp.asarray(prev_tok), k1,
                gen.temperature, gen.top_p,
            )
            pool_k, pool_v, lengths = cache["k"], cache["v"], cache["length"]
            toks_h = np.asarray(toks)
            lps_h = np.asarray(lps)
            for slot in range(self.n_slots):
                if slot_req[slot] >= 0:
                    slot_tokens[slot].append(int(toks_h[slot]))
                    slot_lps[slot].append(float(lps_h[slot]))
                    prev_tok[slot] = int(toks_h[slot])
        return results  # type: ignore[return-value]
