"""Batched inference engine (the vLLM replacement).

The reference serves all evaluation through vLLM on one GPU
(``--use_vllm`` everywhere: ``infer_pdecontrol.sh:28``,
``train/validate.py:42``).  Here generation is a jitted prefill + decode
loop over a pjit-shardable model:

- right-padded prompt prefill with masked KV-cache writes,
- temperature / top-p sampling with per-sequence PRNG streams,
- stop-sequence handling (reference stop words ``### Instruction:``,
  ``few_shot_test.py:40``) with periodic host-side early exit,
- per-token logprob capture for the perplexity metric (reference
  ``extract_logits_without_stop_words``, ``eval/utils.py:293-315``),
- shape bucketing so repeated eval sweeps reuse compiled executables.
"""

from pdec.infer.engine import (
    GenerationConfig,
    Generation,
    InferenceEngine,
)
from pdec.infer.continuous import ContinuousEngine
from pdec.infer.scoring import next_token_distribution, score_completions
from pdec.infer.openai_engine import OpenAIEngine
from pdec.infer.paged import PagedEngine
from pdec.infer.sharded import ShardedDecoder, ShardedEngine

__all__ = [
    "GenerationConfig",
    "Generation",
    "InferenceEngine",
    "ContinuousEngine",
    "OpenAIEngine",
    "PagedEngine",
    "ShardedDecoder",
    "ShardedEngine",
    "score_completions",
    "next_token_distribution",
]
