"""Llama-family decoder in pure JAX, layer-stacked for ``lax.scan``.

TPU-first choices:
- all layer parameters are stacked along a leading layer axis and the block
  loop is a ``lax.scan`` — compile time is O(1) in depth and ``jax.remat``
  wraps the scan body for activation rematerialization (the reference's
  ``--gradient_checkpointing``, ``train/scripts/train.sh:95``),
- every matmul carries an explicit sharding-friendly einsum so pjit can
  shard FSDP (params over the ``fsdp`` axis) and tensor-parallel (heads /
  ffn over ``tp``) without graph surgery — `param_shardings` declares the
  rule per leaf,
- attention runs through `pdec.ops.attention` (Pallas flash kernel on TPU,
  jnp reference elsewhere).

Matches the HF ``LlamaForCausalLM`` computation (DeepSeekMath uses the
Llama block: RMSNorm -> QKV+RoPE -> O, RMSNorm -> SwiGLU), so published
checkpoints import losslessly (`pdec.models.hf_import`).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from pdec.models.config import ModelConfig
from pdec.ops.attention import attention

IGNORE_INDEX = -100  # label mask value (reference ``loader.py:17``)

Params = Dict[str, Any]


def _dtype(cfg: ModelConfig):
    return jnp.dtype(cfg.dtype)


def init_params(key, cfg: ModelConfig) -> Params:
    """Random init (scaled normal), layer-stacked."""
    k = jax.random.split(key, 10)
    d, hd = cfg.d_model, cfg.head_dim
    nh, nkv, f, l, v = cfg.n_heads, cfg.n_kv_heads, cfg.d_ff, cfg.n_layers, cfg.vocab_size
    dt = _dtype(cfg)

    def norm(key, shape, scale):
        return (jax.random.normal(key, shape) * scale).astype(dt)

    s = 0.02
    params = {
        "embed": norm(k[0], (v, d), s),
        "layers": {
            "ln_attn": jnp.ones((l, d), dt),
            "ln_mlp": jnp.ones((l, d), dt),
            "wq": norm(k[1], (l, d, nh * hd), s),
            "wk": norm(k[2], (l, d, nkv * hd), s),
            "wv": norm(k[3], (l, d, nkv * hd), s),
            "wo": norm(k[4], (l, nh * hd, d), s),
            "w_gate": norm(k[5], (l, d, f), s),
            "w_up": norm(k[6], (l, d, f), s),
            "w_down": norm(k[7], (l, f, d), s),
        },
        "ln_final": jnp.ones((d,), dt),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = norm(k[8], (d, v), s)
    return params


def param_shardings(cfg: ModelConfig) -> Params:
    """PartitionSpec per leaf over mesh axes ('data', 'fsdp', 'tp').

    FSDP shards the large dimension over 'fsdp'; tensor-parallel shards
    heads / ffn over 'tp' (megatron layout: column-parallel in, row-parallel
    out, so each block needs one psum which pjit inserts automatically).
    """
    return {
        "embed": P("tp", "fsdp"),
        "layers": {
            "ln_attn": P(None, None),
            "ln_mlp": P(None, None),
            "wq": P(None, "fsdp", "tp"),
            "wk": P(None, "fsdp", "tp"),
            "wv": P(None, "fsdp", "tp"),
            "wo": P(None, "tp", "fsdp"),
            "w_gate": P(None, "fsdp", "tp"),
            "w_up": P(None, "fsdp", "tp"),
            "w_down": P(None, "tp", "fsdp"),
        },
        "ln_final": P(None),
        **({} if cfg.tie_embeddings else {"lm_head": P("fsdp", "tp")}),
    }


def rms_norm(x, weight, eps):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    normed = x.astype(jnp.float32) * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def rope(x, positions, theta):
    """Rotary embedding; x: [B, T, H, hd], positions: [B, T]."""
    hd = x.shape[-1]
    freqs = 1.0 / (theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    angles = positions[..., None].astype(jnp.float32) * freqs  # [B, T, hd/2]
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def _maybe_lora(name, x, w, lora, scale_key="scale"):
    """y = x @ w (+ LoRA delta if a factored pair is present).

    ``w`` may be an int8 weight-only quantized leaf (``{"q", "scale"}``,
    `pdec.models.quantize`); the dequant multiply fuses into the matmul's
    operand read under XLA."""
    if isinstance(w, dict):
        w = (w["q"].astype(jnp.float32) * w["scale"]).astype(x.dtype)
    y = jnp.einsum("btd,df->btf", x, w)
    if lora is not None and name in lora:
        a, b = lora[name]["a"], lora[name]["b"]
        y = y + jnp.einsum("btd,dr,rf->btf", x, a, b) * lora["_scale"]
    return y


def init_kv_cache(cfg: ModelConfig, batch: int, max_len: int):
    shape = (cfg.n_layers, batch, max_len, cfg.n_kv_heads, cfg.head_dim)
    return {
        "k": jnp.zeros(shape, _dtype(cfg)),
        "v": jnp.zeros(shape, _dtype(cfg)),
        "length": jnp.zeros((batch,), jnp.int32),
    }


def forward(
    params: Params,
    tokens: jnp.ndarray,  # [B, T]
    cfg: ModelConfig,
    positions: Optional[jnp.ndarray] = None,  # [B, T]
    kv_cache: Optional[Dict] = None,
    attn_mask: Optional[jnp.ndarray] = None,  # [B, T] validity of tokens
    lora: Optional[Params] = None,
    remat: bool = False,
    gather_positions: Optional[jnp.ndarray] = None,  # [B] per-seq index
) -> Tuple[jnp.ndarray, Optional[Dict]]:
    """Returns (logits [B, T, V], updated kv cache or None).

    With ``kv_cache``, ``tokens`` are appended at per-sequence offset
    ``kv_cache['length']`` (decode / chunked prefill).

    ``gather_positions`` selects one position per sequence *before* the LM
    head, returning [B, 1, V] — prefill only needs the last valid logits,
    and materializing the full [B, T, V] tensor there (batch 256 x 1k ctx
    x 8k vocab = 4.3 GB bf16) both wastes HBM and burns MXU FLOPs.
    """
    b, t = tokens.shape
    if positions is None:
        if kv_cache is not None:
            positions = kv_cache["length"][:, None] + jnp.arange(t)[None, :]
        else:
            positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))

    x = params["embed"][tokens]  # [B, T, D]

    nh, nkv, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

    def layer_step(carry, inputs):
        x, layer_idx = carry
        lp, layer_cache = inputs

        def layer_lora(name):
            if lora is None:
                return None
            sub = {name: jax.tree.map(lambda v: v[layer_idx], lora["layers"][name])}
            sub["_scale"] = lora["_scale"]
            return sub

        h = rms_norm(x, lp["ln_attn"], cfg.rms_eps)
        q = _maybe_lora("wq", h, lp["wq"], layer_lora("wq"))
        k = _maybe_lora("wk", h, lp["wk"], layer_lora("wk"))
        v = _maybe_lora("wv", h, lp["wv"], layer_lora("wv"))
        q = q.reshape(b, t, nh, hd)
        k = k.reshape(b, t, nkv, hd)
        v = v.reshape(b, t, nkv, hd)
        q = rope(q, positions, cfg.rope_theta)
        k = rope(k, positions, cfg.rope_theta)

        if layer_cache is not None:
            ck, cv, lengths = layer_cache
            # write current k/v at per-sequence offsets; right-padded
            # invalid tokens (attn_mask == 0) are never written, so their
            # cache slots stay zero until a decode token lands there
            idx = lengths[:, None] + jnp.arange(t)[None, :]  # [B, T]
            onehot = jax.nn.one_hot(idx, ck.shape[1], dtype=ck.dtype)  # [B,T,S]
            if attn_mask is not None:
                onehot = onehot * attn_mask[:, :, None].astype(onehot.dtype)
            # REPLACE semantics (not accumulate): slots being written are
            # zeroed first.  For ordinary prefill/decode every slot is
            # written at most once so this is bitwise-identical to the
            # old add; it additionally makes cache-length REWIND sound —
            # speculative decoding rolls rejected drafts back by resetting
            # ``length``, and the stale slots are safely overwritten when
            # real tokens land there (pdec.infer.speculative).
            wrote = jnp.einsum("bts->bs", onehot)[:, :, None, None]
            ck = ck * (1 - wrote) + jnp.einsum("bts,btkh->bskh", onehot, k)
            cv = cv * (1 - wrote) + jnp.einsum("bts,btkh->bskh", onehot, v)
            attn_out = attention(
                q, ck, cv, q_positions=positions,
                kv_valid_len=lengths + t,
            )
            new_cache = (ck, cv)
        else:
            attn_out = attention(q, k, v, causal=True, q_valid=attn_mask)
            new_cache = None

        attn_out = attn_out.reshape(b, t, nh * hd)
        o = _maybe_lora("wo", attn_out, lp["wo"], layer_lora("wo"))
        x = x + o

        h = rms_norm(x, lp["ln_mlp"], cfg.rms_eps)
        gate = _maybe_lora("w_gate", h, lp["w_gate"], layer_lora("w_gate"))
        up = _maybe_lora("w_up", h, lp["w_up"], layer_lora("w_up"))
        down = _maybe_lora(
            "w_down", jax.nn.silu(gate) * up, lp["w_down"], layer_lora("w_down")
        )
        x = x + down
        return (x, layer_idx + 1), new_cache

    step = jax.remat(layer_step) if remat else layer_step

    if kv_cache is not None:
        layer_caches = (kv_cache["k"], kv_cache["v"], kv_cache["length"])
        (x, _), new_caches = jax.lax.scan(
            lambda c, inp: step(c, (inp[0], (inp[1], inp[2], kv_cache["length"]))),
            (x, jnp.int32(0)),
            (params["layers"], kv_cache["k"], kv_cache["v"]),
        )
        new_cache = {
            "k": new_caches[0],
            "v": new_caches[1],
            "length": kv_cache["length"] + t,
        }
    else:
        (x, _), _ = jax.lax.scan(
            lambda c, lp: step(c, (lp, None)), (x, jnp.int32(0)), params["layers"]
        )
        new_cache = None

    x = rms_norm(x, params["ln_final"], cfg.rms_eps)
    if gather_positions is not None:
        x = jnp.take_along_axis(x, gather_positions[:, None, None], axis=1)
    head = params["embed"].T if cfg.tie_embeddings else params["lm_head"]
    if isinstance(head, dict):  # int8 weight-only (pdec.models.quantize)
        head = (head["q"].astype(jnp.float32) * head["scale"]).astype(x.dtype)
    logits = jnp.einsum("btd,dv->btv", x, head)
    return logits, new_cache


def loss_fn(
    params: Params,
    tokens: jnp.ndarray,  # [B, T]
    labels: jnp.ndarray,  # [B, T] with IGNORE_INDEX masking
    cfg: ModelConfig,
    lora: Optional[Params] = None,
    remat: bool = True,
) -> jnp.ndarray:
    """Next-token cross entropy with prompt masking (reference
    ``process_tokenize_sft`` masks the prompt with -100, ``loader.py:144-172``)."""
    logits, _ = forward(params, tokens[:, :-1], cfg, lora=lora, remat=remat)
    targets = labels[:, 1:]
    mask = targets != IGNORE_INDEX
    safe_targets = jnp.where(mask, targets, 0)
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logprobs, safe_targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)
