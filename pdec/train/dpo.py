"""DPO training: sigmoid preference loss + RPO NLL term, two-adapter style.

Reference configuration (``train/train_dpo.py:219-236``): beta = 0.1,
sigmoid loss, rpo_alpha = 1.0, policy = base + trainable adapter,
reference = the same base with a frozen adapter (memory-free reference
model, ``train_dpo.py:146-156``).  Functionally:

    policy logps    = forward(base, lora=policy_lora)
    reference logps = forward(base, lora=ref_lora or None), stop-grad

so the 7B base is shared and only LoRA factors are duplicated.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from pdec.models.config import ModelConfig
from pdec.models.transformer import IGNORE_INDEX, forward
from pdec.train.optim import TrainConfig, make_optimizer


@dataclasses.dataclass(frozen=True)
class DPOConfig:
    beta: float = 0.1
    rpo_alpha: float = 1.0  # NLL regularizer weight on the chosen sequence
    label_smoothing: float = 0.0


def sequence_logprob(params, tokens, labels, cfg, lora=None, remat=True):
    """Sum and mean logprob of the completion tokens (labels != -100)."""
    logits, _ = forward(params, tokens[:, :-1], cfg, lora=lora, remat=remat)
    targets = labels[:, 1:]
    mask = targets != IGNORE_INDEX
    safe = jnp.where(mask, targets, 0)
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tok_lp = jnp.take_along_axis(logprobs, safe[..., None], axis=-1)[..., 0]
    tok_lp = tok_lp * mask
    total = jnp.sum(tok_lp, axis=-1)
    mean = total / jnp.maximum(jnp.sum(mask, axis=-1), 1)
    return total, mean


def dpo_loss(
    params,
    policy_lora,
    ref_lora,
    batch,
    cfg: ModelConfig,
    dpo_cfg: DPOConfig = DPOConfig(),
):
    """batch keys: {chosen,rejected}_{input_ids,labels} each [B, T]."""
    pol_c, pol_c_mean = sequence_logprob(
        params, batch["chosen_input_ids"], batch["chosen_labels"], cfg,
        lora=policy_lora,
    )
    pol_r, _ = sequence_logprob(
        params, batch["rejected_input_ids"], batch["rejected_labels"], cfg,
        lora=policy_lora,
    )
    ref_lora_sg = (
        jax.tree.map(jax.lax.stop_gradient, ref_lora)
        if ref_lora is not None else None
    )
    ref_c, _ = sequence_logprob(
        params, batch["chosen_input_ids"], batch["chosen_labels"], cfg,
        lora=ref_lora_sg,
    )
    ref_r, _ = sequence_logprob(
        params, batch["rejected_input_ids"], batch["rejected_labels"], cfg,
        lora=ref_lora_sg,
    )
    ref_c = jax.lax.stop_gradient(ref_c)
    ref_r = jax.lax.stop_gradient(ref_r)

    logits = (pol_c - pol_r) - (ref_c - ref_r)
    ls = dpo_cfg.label_smoothing
    losses = (
        -jax.nn.log_sigmoid(dpo_cfg.beta * logits) * (1 - ls)
        - jax.nn.log_sigmoid(-dpo_cfg.beta * logits) * ls
    )
    nll = -pol_c_mean  # RPO term (trl rpo_alpha semantics)
    loss = jnp.mean(losses + dpo_cfg.rpo_alpha * nll)

    metrics = {
        "dpo_loss": jnp.mean(losses),
        "nll": jnp.mean(nll),
        "reward_margin": jnp.mean(dpo_cfg.beta * logits),
        "accuracy": jnp.mean((logits > 0).astype(jnp.float32)),
    }
    return loss, metrics


def make_dpo_step(
    cfg: ModelConfig,
    train_cfg: TrainConfig,
    dpo_cfg: DPOConfig = DPOConfig(),
):
    """(init_fn, step_fn); step scans micro-batches [accum, B, T] and
    updates only the policy LoRA."""
    optimizer = make_optimizer(train_cfg)

    def init_fn(policy_lora):
        return optimizer.init(policy_lora)

    def step_fn(params, policy_lora, ref_lora, opt_state, batch):
        def micro(carry, mb):
            acc, loss_acc, met_acc = carry
            (loss, metrics), g = jax.value_and_grad(
                lambda lo: dpo_loss(params, lo, ref_lora, mb, cfg, dpo_cfg),
                has_aux=True,
            )(policy_lora)
            acc = jax.tree.map(jnp.add, acc, g)
            met_acc = jax.tree.map(jnp.add, met_acc, metrics)
            return (acc, loss_acc + loss, met_acc), None

        zero = jax.tree.map(jnp.zeros_like, policy_lora)
        zero_m = {
            "dpo_loss": jnp.zeros(()), "nll": jnp.zeros(()),
            "reward_margin": jnp.zeros(()), "accuracy": jnp.zeros(()),
        }
        (grads, loss_sum, met_sum), _ = jax.lax.scan(
            micro, (zero, jnp.zeros(()), zero_m), batch
        )
        n = batch["chosen_input_ids"].shape[0]
        grads = jax.tree.map(lambda g: g / n, grads)
        updates, opt_state = optimizer.update(grads, opt_state, policy_lora)
        policy_lora = jax.tree.map(
            lambda p, u: (p + u).astype(p.dtype), policy_lora, updates
        )
        metrics = jax.tree.map(lambda v: v / n, met_sum)
        metrics["loss"] = loss_sum / n
        return policy_lora, opt_state, metrics

    return init_fn, step_fn
