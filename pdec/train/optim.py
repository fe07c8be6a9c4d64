"""Optimizer and schedule (reference hyperparameters).

SFT defaults mirror ``train/scripts/train.sh:77-99``: AdamW, lr 4e-5,
cosine decay, 50 warmup steps, weight decay 0.1, bf16 params with fp32
optimizer state (what DeepSpeed ZeRO-3 bf16 mode keeps sharded; here optax
state inherits the parameter sharding automatically under pjit).
"""

from __future__ import annotations

import dataclasses

import optax


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 4e-5
    warmup_steps: int = 50
    total_steps: int = 10_000
    weight_decay: float = 0.1
    b1: float = 0.9
    b2: float = 0.999
    grad_clip: float = 1.0
    grad_accum: int = 8  # reference --gradient_accumulation_steps 8
    min_lr_ratio: float = 0.0


def cosine_schedule(cfg: TrainConfig):
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.learning_rate,
        warmup_steps=cfg.warmup_steps,
        decay_steps=max(cfg.total_steps, cfg.warmup_steps + 1),
        end_value=cfg.learning_rate * cfg.min_lr_ratio,
    )


def make_optimizer(cfg: TrainConfig):
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(
            cosine_schedule(cfg),
            b1=cfg.b1,
            b2=cfg.b2,
            weight_decay=cfg.weight_decay,
        ),
    )
