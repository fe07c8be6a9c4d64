"""Completion scoring + next-token prediction (reference
``eval/utils.py:125-211``: ``score_completions`` / ``get_next_word_predictions``).

Used for perplexity-under-the-model of *given* texts (as opposed to
generation-time logprobs) and for constrained next-word choices.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pdec.models.transformer import forward


def _pad_batch(seqs: Sequence[Sequence[int]], pad_id: int):
    t_max = max(len(s) for s in seqs)
    ids = np.full((len(seqs), t_max), pad_id, np.int32)
    valid = np.zeros((len(seqs), t_max), bool)
    for i, s in enumerate(seqs):
        ids[i, : len(s)] = s
        valid[i, : len(s)] = True
    return jnp.asarray(ids), jnp.asarray(valid)


def score_completions(
    params, cfg, tokenizer, prompts: Sequence[str],
    completions: Sequence[str], lora=None,
) -> List[Dict]:
    """Per-pair total/mean logprob of ``completion`` given ``prompt``."""
    assert len(prompts) == len(completions)
    seqs, prompt_lens = [], []
    for p, c in zip(prompts, completions):
        pt = tokenizer.encode(p)
        full = tokenizer.encode(p + c)
        seqs.append(full)
        prompt_lens.append(len(pt))
    pad_id = getattr(tokenizer, "pad_token_id", None) or 0
    ids, valid = _pad_batch(seqs, pad_id)

    logits, _ = forward(params, ids[:, :-1], cfg, attn_mask=valid[:, :-1],
                        lora=lora)
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    targets = ids[:, 1:]
    tok_lp = jnp.take_along_axis(logprobs, targets[..., None], axis=-1)[..., 0]
    tok_lp = np.asarray(tok_lp)

    out = []
    for i, (full, plen) in enumerate(zip(seqs, prompt_lens)):
        span = tok_lp[i, max(plen - 1, 0) : len(full) - 1]
        out.append(
            {
                "sum_logprob": float(span.sum()),
                "mean_logprob": float(span.mean()) if len(span) else 0.0,
                "n_tokens": int(len(span)),
                "logprobs": [float(v) for v in span],
            }
        )
    return out


def next_token_distribution(params, cfg, tokenizer, prompts: Sequence[str],
                            lora=None):
    """Next-token logprob distribution at the end of each prompt."""
    seqs = [tokenizer.encode(p) for p in prompts]
    pad_id = getattr(tokenizer, "pad_token_id", None) or 0
    ids, valid = _pad_batch(seqs, pad_id)
    logits, _ = forward(params, ids, cfg, attn_mask=valid, lora=lora)
    last = jnp.asarray([len(s) - 1 for s in seqs])
    final = jnp.take_along_axis(logits, last[:, None, None], axis=1)[:, 0]
    return np.asarray(jax.nn.log_softmax(final.astype(jnp.float32), axis=-1))
