"""In-training validation harness (reference ``train/validate.py:19-140``).

The reference merges the LoRA adapter to disk, spawns a vLLM engine,
evaluates two validation dirs at 0 and 2 shots under a 900 s thread
timeout, deletes the merged model, and pushes ``validation_*`` metrics to
wandb.  Here the merge is a pure function (`pdec.models.lora.merge_lora`),
the engine is in-process, and the timeout guards the whole evaluation.
"""

from __future__ import annotations

import concurrent.futures
from typing import Dict, List, Optional, Sequence

from pdec.control.synthesis import SynthesisConfig
from pdec.infer.engine import InferenceEngine
from pdec.models.lora import merge_lora
from pdec.pipeline.evaluate import EvalDriver
from pdec.runtime.logging import get_logger

VALIDATION_TIMEOUT_S = 900  # reference validate.py:112-117
VALID_NUM_EXAMPLES = 8  # reference validate.py:130
VALID_SHOTS = (0, 2)  # reference create_eval_args usage
VALID_METHOD = "to_python_no_STL"


def make_validate_fn(
    model_cfg,
    tokenizer,
    validation_items: Dict[str, List[Dict]],  # dataset name -> rows
    synthesis: Optional[SynthesisConfig] = None,
    num_examples: int = VALID_NUM_EXAMPLES,
    shots: Sequence[int] = VALID_SHOTS,
    eval_method: str = VALID_METHOD,
    timeout_s: int = VALIDATION_TIMEOUT_S,
    max_new_tokens: int = 512,
    bank_dir: Optional[str] = None,
):
    """Build a ``validate_fn(state, step) -> metrics`` for `train_loop`."""
    logger = get_logger("pdec.validate")

    def validate_fn(state: Dict, step: int) -> Dict[str, float]:
        params = state["params"]
        if state.get("lora") is not None:
            params = merge_lora(params, state["lora"])  # C5 merge, in-memory
        engine = InferenceEngine(params, model_cfg, tokenizer)
        driver = EvalDriver(
            {"translator": engine, "coder": engine, "controller": engine},
            synthesis=synthesis,
            max_new_tokens=max_new_tokens,
            temperature=0.0,
            bank_dir=bank_dir,
        )

        def run_all() -> Dict[str, float]:
            out: Dict[str, float] = {}
            for name, rows in validation_items.items():
                for s in shots:
                    res = driver.run(
                        rows[:num_examples], eval_method=eval_method,
                        shots=s, seed=0, dataset_name=name,
                    )
                    for k, v in res.metrics.items():
                        if isinstance(v, (int, float)):
                            out[f"{name}_shots={s}/{k}"] = float(v)
            return out

        with concurrent.futures.ThreadPoolExecutor(max_workers=1) as ex:
            future = ex.submit(run_all)
            try:
                return future.result(timeout=timeout_s)
            except concurrent.futures.TimeoutError:
                logger.warning("validation at step %d timed out", step)
                return {"validation_timeout": 1.0}

    return validate_fn
