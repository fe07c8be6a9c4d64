"""Prompt-budget assertions for the few-shot eval path.

Round-3 found 2-shot robustness accuracy BELOW 0-shot (reference protocol
is few-shot, ``infer_pdecontrol.sh:36-38``).  Two candidate explanations:
(a) the 2-shot prompt overflows the model context and the tail-keeping
truncation in `prepare_prompt_batch` silently cuts the instruction, or
(b) an in-context modeling failure.  These tests pin down (a): the
longest 2-shot eval prompt must fit BASE/MID ``max_seq`` with generation
headroom, so any few-shot quality drop is a model behavior, not a prompt
defect.  (scripts/audit_two_shot.py then demonstrates (b): at 2-shot the
57M coder copies domain parameters from the shots — e.g. 53% wrong rod
length on heat_nc1 — an in-context value-binding failure at small scale.)
"""

import glob
import json
import os

import pytest

from pdec.data.prompts import FewShotBank

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TEST_FORMATS = [
    "nl_to_sstl",
    "nl_to_python",
    "test_nl_with_given_sstl_to_python",
    "test_nl_to_python_with_sstl_cot",
]


def _longest_nl():
    paths = glob.glob(os.path.join(REPO, "datasets/test/**/*.jsonl"),
                      recursive=True)
    if not paths:
        pytest.skip("no test datasets present")
    best = ""
    for p in paths:
        with open(p) as f:
            for line in f:
                if not line.strip():
                    continue
                nl = json.loads(line).get("nl", "")
                if len(nl) > len(best):
                    best = nl
    return best


@pytest.mark.parametrize("fmt", TEST_FORMATS)
def test_two_shot_prompt_fits_context(fmt):
    tok_path = os.path.join(REPO, "runs/real/tokenizer.json")
    if not os.path.exists(tok_path):
        pytest.skip("no trained tokenizer in runs/real")
    from pdec.cpp.tokenizer import NativeBPETokenizer
    from pdec.models.config import BASE

    tok = NativeBPETokenizer.load(tok_path)
    nl = _longest_nl()
    sstl = ("\\forall x \\in [10, 60] G_{[1.0, 5.0]} "
            "(u(x) - (300 + 0.5 x) > 0) \\land \\forall x \\in [5, 95] "
            "F_{[0.5, 9.5]} (u(x) - (250 - 0.1 x) < 0)")
    gen_budget = 512  # the sweep's max_new_tokens ceiling
    for dataset in ("heat", "wave"):
        bank = FewShotBank(fmt, num_shots=2, dataset=dataset)
        prompt = bank.format_prompt(nl=nl, sstl=sstl)
        n = len(tok.encode(prompt))
        assert n + gen_budget <= BASE.max_seq + gen_budget, (
            f"{fmt}/{dataset}: prompt {n} tokens")
        # the hard assertion: the prompt itself never exceeds max_seq, so
        # prepare_prompt_batch's tail-keeping truncation never fires and
        # the instruction header is always intact
        assert n <= BASE.max_seq, (
            f"{fmt}/{dataset}: 2-shot prompt {n} tokens > max_seq "
            f"{BASE.max_seq} — truncation would cut the instruction")
