"""Paged decode attention: block-granular KV cache (the PagedAttention idea).

vLLM's core mechanism (reference serves all eval through vLLM,
``requirements.txt:170``): instead of one contiguous ``max_len`` KV strip
per sequence, keys/values live in a shared pool of fixed-size *blocks* and
each sequence owns an ordered list of block ids (its block table).  Memory
is allocated in ``block_size``-token quanta, so mixed-length batches stop
stranding ``max_len`` HBM per slot.

TPU-native design: the decode-step attention is a Pallas kernel over grid
``(slot, kv_head, page)`` whose k/v BlockSpec *index maps* read the block
table through scalar prefetch (`pltpu.PrefetchScalarGridSpec`) — the DMA
engine chases the page indirection, no gather materializes.  Online-softmax
accumulators live in VMEM scratch across the page axis (same recurrence as
`pdec.ops.flash_attention`).

`paged_attention_reference` is the executable jnp spec used on CPU and in
tests; the kernel is validated against it in interpret mode in-suite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def paged_attention_reference(
    q: jnp.ndarray,            # [S, Hq, D] one decode token per slot
    pool_k: jnp.ndarray,       # [n_blocks, Hkv, B, D]
    pool_v: jnp.ndarray,       # [n_blocks, Hkv, B, D]
    block_tables: jnp.ndarray,  # [S, maxP] pool ids (unused entries: any valid id)
    lengths: jnp.ndarray,      # [S] valid tokens per slot (incl. current)
) -> jnp.ndarray:
    """Dense reference: gather pages, mask, softmax.

    Pool layout is [n_blocks, Hkv, B, D] — kv-heads BEFORE tokens — so the
    Pallas kernel's k/v blocks are (1, 1, B, D): XLA:TPU requires each
    block's last two dims to be (8, 128)-divisible or equal to the array
    dims, and a trailing per-head axis of size 1 violates that whenever
    Hkv > 1 (measured on-chip; CPU interpret mode never checks)."""
    s, hq, d = q.shape
    nb, hkv, blk, _ = pool_k.shape
    maxp = block_tables.shape[1]
    k = pool_k[block_tables]  # [S, maxP, Hkv, B, D]
    v = pool_v[block_tables]
    k = jnp.swapaxes(k, 2, 3).reshape(s, maxp * blk, hkv, d)
    v = jnp.swapaxes(v, 2, 3).reshape(s, maxp * blk, hkv, d)
    group = hq // hkv
    k = jnp.repeat(k, group, axis=2)
    v = jnp.repeat(v, group, axis=2)
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    logits = jnp.einsum("shd,skhd->shk", q, k).astype(jnp.float32) * scale
    pos = jnp.arange(maxp * blk)
    mask = pos[None, None, :] < lengths[:, None, None]
    logits = jnp.where(mask, logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("shk,skhd->shd", probs, v)


def _paged_kernel(
    # scalar prefetch operands
    block_tables_ref,          # [S, maxP] int32
    lengths_ref,               # [S] int32
    # array operands (blocked)
    q_ref,                     # [1, 1, G, D]
    k_ref,                     # [1, 1, B, D]
    v_ref,                     # [1, 1, B, D]
    o_ref,                     # [1, 1, G, D]
    # scratch
    m_ref, l_ref, acc_ref,
    *,
    block_size: int,
    scale: float,
):
    s = pl.program_id(0)
    page = pl.program_id(2)
    n_pages = pl.num_programs(2)
    length = lengths_ref[s]

    @pl.when(page == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # pages past the sequence length contribute nothing
    @pl.when(page * block_size < length)
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32) * scale          # [G, D]
        k = k_ref[0, 0].astype(jnp.float32)                  # [B, D]
        v = v_ref[0, 0].astype(jnp.float32)                  # [B, D]
        logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # [G, B]
        pos = page * block_size + jax.lax.broadcasted_iota(
            jnp.int32, logits.shape, 1
        )
        logits = jnp.where(pos < length, logits, _NEG_INF)

        m_prev = m_ref[...]                                  # [G, 1]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)                          # [G, B]
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jnp.dot(
            p, v, preferred_element_type=jnp.float32
        )
        m_ref[...] = m_new

    @pl.when(page == n_pages - 1)
    def _finalize():
        denom = jnp.maximum(l_ref[...], 1e-30)
        o_ref[0, 0] = (acc_ref[...] / denom).astype(o_ref.dtype)


def paged_attention_kernel(
    q, pool_k, pool_v, block_tables, lengths, *, interpret: bool = False
):
    """Pallas paged decode attention (see module docstring for layout)."""
    s, hq, d = q.shape
    nb, hkv, blk, _ = pool_k.shape
    group = hq // hkv
    maxp = block_tables.shape[1]
    qg = q.reshape(s, hkv, group, d)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s, hkv, maxp),
        in_specs=[
            pl.BlockSpec((1, 1, group, d), lambda s_, h, p, bt, ln: (s_, h, 0, 0)),
            pl.BlockSpec((1, 1, blk, d), lambda s_, h, p, bt, ln: (bt[s_, p], h, 0, 0)),
            pl.BlockSpec((1, 1, blk, d), lambda s_, h, p, bt, ln: (bt[s_, p], h, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, group, d), lambda s_, h, p, bt, ln: (s_, h, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((group, 1), jnp.float32),
            pltpu.VMEM((group, 1), jnp.float32),
            pltpu.VMEM((group, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _paged_kernel, block_size=blk, scale=1.0 / (d**0.5)
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(qg.shape, q.dtype),
        interpret=interpret,
    )(block_tables.astype(jnp.int32), lengths.astype(jnp.int32),
      qg, pool_k, pool_v)
    return out.reshape(s, hq, d)


def paged_attention(q, pool_k, pool_v, block_tables, lengths):
    """Dispatch: Pallas kernel on TPU, jnp reference elsewhere."""
    if jax.default_backend() == "tpu":
        return paged_attention_kernel(q, pool_k, pool_v, block_tables, lengths)
    return paged_attention_reference(q, pool_k, pool_v, block_tables, lengths)
