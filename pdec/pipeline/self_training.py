"""Two-stage self-training data construction (reference
``run_training.sh:40-62`` + the unshipped ``run_1d_pdecontrol_eval_train.py``).

Stage 1 trains a translator (``to_STL``); this module then runs it over the
*training* set to predict SSTL for every row (``train_predicted_sstl``), so
stage 2 can train the coder on the model's own — possibly wrong —
formalizations (``to_python_given_STL``, ``loader.py:245-249``), making it
robust to translator errors at pipeline time.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from pdec.data.prompts import FewShotBank, STOP_WORDS
from pdec.eval.extraction import extract_sstl_answer
from pdec.infer.engine import GenerationConfig


def predict_train_sstl(
    engine,
    rows: Sequence[Dict],
    shots: int = 0,
    prompt_dataset: str = "combined",
    bank_dir: Optional[str] = None,
    temperature: float = 0.0,  # reference uses temp 0 for this pass
    max_new_tokens: int = 512,
    seed: int = 0,
    batch_size: int = 64,
) -> List[Dict]:
    """Augment training rows with ``train_predicted_sstl``."""
    bank = FewShotBank(
        "nl_to_sstl", num_shots=shots, dataset=prompt_dataset,
        bank_dir=bank_dir, shuffle=shots > 0, seed=seed,
    )
    gen = GenerationConfig(
        max_new_tokens=max_new_tokens, temperature=temperature,
        stop=tuple(STOP_WORDS), seed=seed,
    )
    out: List[Dict] = []
    for i in range(0, len(rows), batch_size):
        chunk = rows[i : i + batch_size]
        prompts = [bank.format_prompt(nl=r["nl"]) for r in chunk]
        gens = engine.generate(prompts, gen)
        for r, g in zip(chunk, gens):
            row = dict(r)
            row["train_predicted_sstl"] = extract_sstl_answer(g.text)
            out.append(row)
    return out
