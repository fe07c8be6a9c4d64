"""Training: pjit SFT + DPO loops with FSDP/TP sharding.

Replaces the reference L1/L2 stack — torchrun + NCCL + DeepSpeed ZeRO-3 +
HF Trainer/trl (``train/train_finetune.py``, ``train/train_dpo.py``) — with
jitted train steps over a (data, fsdp, tp) mesh:

- SFT: LoRA (r=64 alpha=256, ``train/scripts/train.sh:97-99``) or full
  fine-tune; prompt-masked cross entropy; grad accumulation via scan;
  cosine schedule with warmup (lr 4e-5, warmup 50, wd 0.1 — ``train.sh:85``),
- DPO: sigmoid preference loss with beta=0.1 and rpo_alpha=1.0 NLL term
  (``train/train_dpo.py:223-233``), reference logits from the SAME base
  params without the policy LoRA delta (the two-adapter trick,
  ``train_dpo.py:146-156``, for free in the functional formulation),
- checkpoints via orbax with the reference's dual-stream layout
  (rotating ``backups/checkpoint-*`` + persistent ``checkpoint-step-N``,
  ``train/utils/trainer.py:96-118``).
"""

from pdec.train.optim import TrainConfig, make_optimizer, cosine_schedule
from pdec.train.sft import make_sft_step
from pdec.train.dpo import DPOConfig, dpo_loss, make_dpo_step

__all__ = [
    "TrainConfig",
    "make_optimizer",
    "cosine_schedule",
    "make_sft_step",
    "DPOConfig",
    "dpo_loss",
    "make_dpo_step",
]
