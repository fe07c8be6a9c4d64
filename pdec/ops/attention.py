"""Attention: Pallas flash kernel on TPU, jnp reference elsewhere.

Replaces flash-attn-2 (reference pins ``config._attn_implementation =
"flash_attention_2"``, ``train/train_finetune.py:141``).  The public entry
`attention` handles GQA (n_q_heads a multiple of n_kv_heads), causal
masking, per-sequence validity masks, and the decode path (query attends to
a cache prefix of per-sequence length).

The Pallas kernel tiles (q_block x kv_block) with the standard
online-softmax recurrence; the jnp fallback is the executable reference
spec used for correctness tests on CPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _repeat_kv(k, n_rep: int):
    if n_rep == 1:
        return k
    b, s, h, d = k.shape
    return jnp.repeat(k, n_rep, axis=2)


def attention_reference(
    q: jnp.ndarray,  # [B, Tq, Hq, D]
    k: jnp.ndarray,  # [B, Tk, Hkv, D]
    v: jnp.ndarray,  # [B, Tk, Hkv, D]
    causal: bool = False,
    q_positions: Optional[jnp.ndarray] = None,  # [B, Tq] absolute positions
    kv_valid_len: Optional[jnp.ndarray] = None,  # [B] valid cache length
    q_valid: Optional[jnp.ndarray] = None,  # [B, Tq] query validity
) -> jnp.ndarray:
    b, tq, hq, d = q.shape
    hkv = k.shape[2]
    k = _repeat_kv(k, hq // hkv)
    v = _repeat_kv(v, hq // hkv)

    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale

    mask = jnp.ones((b, 1, tq, k.shape[1]), bool)
    kv_idx = jnp.arange(k.shape[1])
    if causal:
        q_idx = (
            q_positions if q_positions is not None
            else jnp.broadcast_to(jnp.arange(tq)[None, :], (b, tq))
        )
        mask = mask & (kv_idx[None, None, None, :] <= q_idx[:, None, :, None])
    if kv_valid_len is not None:
        # decode path: attend to cache[0:len] (current tokens are already
        # written into the cache at positions < len)
        mask = mask & (kv_idx[None, None, None, :] < kv_valid_len[:, None, None, None])
        if q_positions is not None:
            mask = mask & (
                kv_idx[None, None, None, :] <= q_positions[:, None, :, None]
            )
    if q_valid is not None:
        # self-attention padding: invalid tokens are masked out as keys
        # (padded queries produce garbage rows that the loss masks anyway)
        mask = mask & q_valid[:, None, None, :]
    logits = jnp.where(mask, logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _flash_kernel_available() -> bool:
    return jax.default_backend() == "tpu"


def attention(
    q, k, v,
    causal: bool = False,
    q_positions=None,
    kv_valid_len=None,
    q_valid=None,
):
    """Dispatch to the Pallas flash kernel on TPU (self-attention prefill
    path), reference implementation otherwise."""
    if (
        _flash_kernel_available()
        and causal
        and kv_valid_len is None
        and q_valid is None
        and q.shape[1] == k.shape[1]
        and q.shape[1] % 128 == 0
        and q.shape[-1] in (64, 128, 256)
    ):
        from pdec.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, causal=True)
    return attention_reference(
        q, k, v, causal=causal, q_positions=q_positions,
        kv_valid_len=kv_valid_len, q_valid=q_valid,
    )
