"""Data pipeline tests: prompt contract, tokenization masking, packing,
balancing modes."""

import numpy as np
import pytest

from pdec.data.pipeline import (
    IGNORE_INDEX,
    balance_datasets,
    create_prompt,
    create_prompt_dpo,
    pack_sequences,
    pad_rows,
    tokenize_dpo,
    tokenize_sft,
    truncate_rows,
)
from pdec.data.prompts import (
    INSTRUCTIONS,
    FewShotBank,
    STOP_WORDS,
    alpaca,
    format_test_prompt,
    format_train_prompt,
)


class WordTokenizer:
    """Whitespace tokenizer with bos=1, eos=2 for deterministic tests."""

    bos_token_id = 1
    eos_token_id = 2
    _vocab = {}

    def encode(self, text, add_special_tokens=False):
        ids = []
        for w in text.split():
            if w not in self._vocab:
                self._vocab[w] = len(self._vocab) + 10
            ids.append(self._vocab[w])
        return ids


class TestPromptContract:
    def test_alpaca_open_fence_for_generation(self):
        p = alpaca("INSTR", "IN", "", "python")
        assert p.endswith("### Response:\n```python\n")
        assert p.startswith("### Instruction:\nINSTR\n\n### Input:\nIN")

    def test_alpaca_closed_fence_for_few_shot(self):
        p = alpaca("INSTR", "IN", "OUT", "latex")
        assert p.endswith("```latex\nOUT\n```\n\n")

    def test_test_prompt_opens_fence(self):
        p = format_test_prompt("nl_to_python", nl="problem text")
        assert p.endswith("```python\n")
        assert INSTRUCTIONS["nl_to_python"] in p

    def test_cot_prompt_has_no_fence(self):
        p = format_test_prompt("test_nl_to_python_with_sstl_cot", nl="x")
        assert p.endswith("### Response:\n")

    def test_given_sstl_embeds_latex_block(self):
        p = format_test_prompt(
            "test_nl_with_given_sstl_to_python", nl="x", sstl="G_[[0,1]]"
        )
        assert "Spatial Signal Temporal Logic:\n```latex\nG_[[0,1]]\n```" in p

    def test_few_shot_bank(self):
        bank = FewShotBank("nl_to_python", num_shots=2, dataset="heat")
        prompt = bank.format_prompt(nl="the real problem")
        # two closed examples then the open query
        assert prompt.count("### Instruction:") == 3
        assert prompt.endswith("```python\n")
        assert bank.stop_words() == STOP_WORDS

    def test_zero_shot_bank(self):
        bank = FewShotBank("nl_to_python", num_shots=0, dataset="heat")
        prompt = bank.format_prompt(nl="q")
        assert prompt.count("### Instruction:") == 1

    def test_max_shots_enforced(self):
        with pytest.raises(ValueError):
            FewShotBank("nl_to_python", num_shots=4, dataset="heat")


class TestTargetLeakage:
    """The prompt must never contain the training target (a model trained
    on a leaked prompt merely copies and cannot generate at test time)."""

    def test_to_stl_prompt_excludes_answer(self):
        row = {"nl": "a rod problem", "sstl": "G_[[0, 1]] (SECRET)",
               "python": "code"}
        out = create_prompt([row], "to_STL")[0]
        assert "SECRET" not in out["text"]
        assert out["text"].endswith("```latex\n")
        assert out["labels"] == row["sstl"] + "\n```"

    def test_to_python_prompt_excludes_answer(self):
        row = {"nl": "a rod problem", "sstl": "spec", "python": "SECRET_CODE"}
        out = create_prompt([row], "to_python_no_STL")[0]
        assert "SECRET_CODE" not in out["text"]
        assert out["text"].endswith("```python\n")

    def test_gt_stl_prompt_contains_sstl_input_but_not_python(self):
        row = {"nl": "p", "sstl": "THE_SPEC", "python": "THE_CODE"}
        out = create_prompt([row], "to_python_GT_STL")[0]
        assert "THE_SPEC" in out["text"]  # sstl is a legitimate input here
        assert "THE_CODE" not in out["text"]


class TestTokenization:
    def test_sft_masks_prompt(self):
        tok = WordTokenizer()
        rows = create_prompt(
            [{"nl": "problem one", "sstl": "spec", "python": "code body"}],
            "to_python_no_STL",
        )
        tokenized = tokenize_sft(rows, tok)[0]
        ids, labels = tokenized["input_ids"], tokenized["labels"]
        assert ids[0] == tok.bos_token_id and ids[-1] == tok.eos_token_id
        prompt_len = len(tok.encode(rows[0]["text"]))
        assert labels[: prompt_len + 1] == [IGNORE_INDEX] * (prompt_len + 1)
        # completion tokens keep their ids
        assert labels[prompt_len + 1 :] == ids[prompt_len + 1 :]

    def test_dpo_eos_on_completions_only(self):
        tok = WordTokenizer()
        rows = create_prompt_dpo(
            [{"anchor": "an anchor", "w_sstl": "good spec", "l_sstl": "bad spec"}]
        )
        t = tokenize_dpo(rows, tok)[0]
        assert t["chosen_input_ids"][-1] == tok.eos_token_id
        assert t["rejected_input_ids"][-1] == tok.eos_token_id
        assert t["prompt_input_ids"][-1] != tok.eos_token_id


class TestPacking:
    def test_pack_concatenates_and_pads(self):
        rows = [
            {"input_ids": [1, 2, 3], "labels": [1, 2, 3]},
            {"input_ids": [4, 5], "labels": [4, 5]},
            {"input_ids": [6, 7, 8, 9], "labels": [6, 7, 8, 9]},
        ]
        out = pack_sequences(rows, max_len=6, pad_id=0)
        assert out["input_ids"].shape == (2, 6)
        np.testing.assert_array_equal(out["input_ids"][0], [1, 2, 3, 4, 5, 0])
        assert out["labels"][0][-1] == IGNORE_INDEX

    def test_pack_splits_oversized(self):
        rows = [{"input_ids": list(range(10)), "labels": list(range(10))}]
        out = pack_sequences(rows, max_len=4, pad_id=0)
        assert out["input_ids"].shape == (3, 4)
        np.testing.assert_array_equal(out["input_ids"][2], [8, 9, 0, 0])

    def test_truncate_and_pad(self):
        rows = [{"input_ids": list(range(10)), "labels": list(range(10))}]
        t = truncate_rows(rows, 6)
        assert len(t[0]["input_ids"]) == 6
        p = pad_rows(rows, 12, pad_id=0)
        assert p["input_ids"].shape == (1, 12)
        assert p["labels"][0][-1] == IGNORE_INDEX


class TestBalance:
    def test_mode1_keep_everything(self):
        ds = [[1] * 5, [2] * 7]
        out = balance_datasets(ds, [1])
        assert [len(d) for d in out] == [5, 7]

    def test_mode2_total_only(self):
        ds = [[1] * 5, [2] * 7]
        out = balance_datasets(ds, [1], total=3)
        assert [len(d) for d in out] == [3, 3]

    def test_mode3_anchor_smallest(self):
        ds = [[1] * 10, [2] * 4]
        out = balance_datasets(ds, [0.5, 0.5])
        # smallest (4) at 0.5 -> total 8 -> 4 + 4
        assert [len(d) for d in out] == [4, 4]

    def test_mode4_oversample_with_replication(self):
        ds = [[1] * 3, [2] * 100]
        out = balance_datasets(ds, [0.5, 0.5], total=20, seed=0)
        assert [len(d) for d in out] == [10, 10]
        assert all(v == 1 for v in out[0])  # replicated small dataset

    def test_reference_sft_mixture(self):
        # run_training.sh:66 mixture shape
        ds = [list(range(50_000)) for _ in range(6)]
        out = balance_datasets(
            ds, [0.05, 0.22, 0.23, 0.05, 0.22, 0.23], total=128_000, seed=3407
        )
        assert [len(d) for d in out] == [6400, 28160, 29440, 6400, 28160, 29440]

    def test_bad_balance_rejected(self):
        with pytest.raises(ValueError):
            balance_datasets([[1]], [0.5, 0.4])


def test_tokenize_sft_boundary_prefix_stable():
    """The -100 mask must end exactly at the prompt/label boundary even
    when the tokenizer has merges that would span it on concatenated
    text (domain-trained BPE can swallow the open fence + program head
    into one token)."""

    class MergingTok:
        bos_token_id = 1
        eos_token_id = 2

        def encode(self, text, add_special_tokens=True):
            # pathological: encodes "```\nfrom" as ONE id when adjacent
            ids = []
            i = 0
            while i < len(text):
                if text[i:i + 8] == "```\nfrom":
                    ids.append(99)
                    i += 8
                else:
                    ids.append(3 + (ord(text[i]) % 7))
                    i += 1
            return ids

    from pdec.data.pipeline import IGNORE_INDEX, tokenize_sft

    tok = MergingTok()
    row = {"text": "do it:\n```\n", "labels": "from x import y"}
    [r] = tokenize_sft([row], tok)
    k = len(tok.encode(row["text"]))
    # bos + prompt masked; every label position visible
    assert r["labels"][: k + 1] == [IGNORE_INDEX] * (k + 1)
    n_label = len(tok.encode(row["labels"]))
    visible = [l for l in r["labels"] if l != IGNORE_INDEX]
    assert len(visible) >= n_label  # label tokens + eos all supervised
