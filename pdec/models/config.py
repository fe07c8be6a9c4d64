"""Model configurations.

``DEEPSEEK_7B`` matches the MathCoder2-DeepSeekMath-7B base the reference
fine-tunes for all three roles (``run_training.sh:12``, HF config of
deepseek-math-7b: 30 layers, d_model 4096, 32 heads, ff 11008, vocab
102400, rope theta 10000).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    vocab_size: int
    d_model: int
    n_layers: int
    n_heads: int
    n_kv_heads: int
    d_ff: int
    max_seq: int = 4096
    rope_theta: float = 10000.0
    rms_eps: float = 1e-6
    dtype: str = "bfloat16"
    tie_embeddings: bool = False

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


DEEPSEEK_7B = ModelConfig(
    vocab_size=102400,
    d_model=4096,
    n_layers=30,
    n_heads=32,
    n_kv_heads=32,
    d_ff=11008,
    max_seq=4096,
    rope_theta=10000.0,
)

# Small-but-real config for the single-chip compile check and demos.
SMALL = ModelConfig(
    vocab_size=32000,
    d_model=512,
    n_layers=4,
    n_heads=8,
    n_kv_heads=4,
    d_ff=1408,
    max_seq=1024,
)

# From-scratch demonstration scale (~57M params at vocab 8192): used by
# scripts/real_run.py to train translator/coder on generated corpus data
# with the native BPE tokenizer (vocab_size is replaced by the tokenizer's).
BASE = ModelConfig(
    vocab_size=8192,
    d_model=640,
    n_layers=10,
    n_heads=10,
    n_kv_heads=5,
    d_ff=1792,
    max_seq=1024,
)

# ~0.5B from-scratch scale (0.50B params at vocab 8192): the real-run
# flagship size — large enough that training and serving exercise the
# production memory/throughput paths on a v5e chip, small enough to train
# to convergence on generated data in one session.
MID = ModelConfig(
    vocab_size=8192,
    d_model=1536,
    n_layers=16,
    n_heads=12,
    n_kv_heads=4,
    d_ff=4608,
    max_seq=1024,
)

# Draft model for speculative decoding (pdec.infer.speculative): ~8M
# params at vocab 8192 — ~60x cheaper per token than MID, big enough to
# track the corpus's highly templated text for useful acceptance rates.
# Trained with the TARGET family's tokenizer (the vocab_size here is
# replaced by the tokenizer's at train/load time, like every preset).
DRAFT = ModelConfig(
    vocab_size=8192,
    d_model=256,
    n_layers=4,
    n_heads=4,
    n_kv_heads=4,
    d_ff=704,
    max_seq=1024,
)

# Minimal config for unit tests.
TINY = ModelConfig(
    vocab_size=256,
    d_model=64,
    n_layers=2,
    n_heads=4,
    n_kv_heads=2,
    d_ff=128,
    max_seq=128,
    dtype="float32",
)
