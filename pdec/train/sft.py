"""SFT train step: prompt-masked LM loss, grad accumulation, LoRA or full.

The returned step function is pure and jit/pjit-friendly: under a mesh with
sharded params it compiles to the ZeRO-3 pattern (per-layer all-gather on
use, reduce-scatter of grads) without any runtime framework — the role the
reference fills with DeepSpeed (``train/config/deepspeed.json:31-42``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pdec.models.config import ModelConfig
from pdec.models.transformer import loss_fn
from pdec.train.optim import TrainConfig, make_optimizer


def make_sft_step(
    cfg: ModelConfig,
    train_cfg: TrainConfig,
    train_lora: bool = True,
):
    """Build (init_fn, step_fn).

    step_fn(params, lora, opt_state, batch) -> (params/lora, opt_state, metrics)
    batch: dict with ``input_ids``/``labels`` of shape [accum, micro_b, T]
    (the leading axis is scanned for gradient accumulation, reference
    ``--gradient_accumulation_steps 8``).
    """
    optimizer = make_optimizer(train_cfg)

    def trainable(params, lora):
        return lora if train_lora else params

    def init_fn(params, lora):
        return optimizer.init(trainable(params, lora))

    def loss_of(params, lora, micro):
        return loss_fn(
            params, micro["input_ids"], micro["labels"], cfg,
            lora=lora if train_lora or lora is not None else None,
            remat=True,
        )

    def step_fn(params, lora, opt_state, batch):
        def micro_grads(carry, micro):
            acc, loss_acc = carry
            if train_lora:
                loss, g = jax.value_and_grad(
                    lambda lo: loss_of(params, lo, micro)
                )(lora)
            else:
                loss, g = jax.value_and_grad(
                    lambda p: loss_of(p, lora, micro)
                )(params)
            acc = jax.tree.map(jnp.add, acc, g)
            return (acc, loss_acc + loss), None

        target = trainable(params, lora)
        zero = jax.tree.map(jnp.zeros_like, target)
        (grads, loss_sum), _ = jax.lax.scan(
            micro_grads, (zero, jnp.zeros(())), batch
        )
        n_micro = batch["input_ids"].shape[0]
        grads = jax.tree.map(lambda g: g / n_micro, grads)

        updates, opt_state = optimizer.update(grads, opt_state, target)
        new_target = jax.tree.map(
            lambda p, u: (p + u).astype(p.dtype), target, updates
        )
        metrics = {
            "loss": loss_sum / n_micro,
            "grad_norm": jnp.sqrt(
                sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                    for g in jax.tree.leaves(grads))
            ),
        }
        if train_lora:
            return params, new_target, opt_state, metrics
        return new_target, lora, opt_state, metrics

    return init_fn, step_fn
