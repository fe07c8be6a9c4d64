"""Tokenization, packing, truncation and mixture balancing.

Behavior-compatible rebuild of the reference data pipeline (``Processor``
in ``train/scripts/utils/loader.py`` and ``balance_datasets`` in
``train/scripts/group_text.py:34-95``), restructured around plain
list/numpy batches (the hot path is the jitted train step, not here; these
run once per corpus build).

Key semantics preserved:
- SFT tokenization masks the prompt with -100 and repairs bos/eos
  (``loader.py:144-172``),
- packing concatenates samples up to max_len, splitting oversized samples
  into max_len chunks and padding tails (``group_texts``,
  ``loader.py:21-61``),
- DPO triplets get eos on chosen/rejected but not the prompt
  (``process_tokenize_dpo``, ``loader.py:201-224``),
- the four balancing modes, including oversample-with-replication
  (``group_text.py:34-95``); the SFT run uses
  ``--balance 0.05 0.22 0.23 0.05 0.22 0.23 --total 128000``
  (``run_training.sh:66``).
"""

from __future__ import annotations

import random
from typing import Dict, List, Optional, Sequence

import numpy as np

from pdec.data.prompts import format_train_prompt

IGNORE_INDEX = -100


# --------------------------------------------------------------------------
# Prompt construction over example batches (reference ``create_prompt``).
# --------------------------------------------------------------------------

SFT_FORMATS = {
    # prompt_format -> (train format key, sstl source key when the sstl is
    # a prompt INPUT; None when the sstl/python is the training TARGET and
    # the prompt must end at the open fence)
    "to_python_no_STL": ("nl_to_python", None),
    "to_STL": ("nl_to_sstl", None),
    "to_python_GT_STL": ("train_nl_and_sstl_to_python", "sstl"),
    "to_python_given_STL": ("train_nl_with_given_sstl_to_python",
                            "train_predicted_sstl"),
    "to_python_misaligned": ("dpo_test_sstl_to_python", "stl"),
}


def create_prompt(rows: Sequence[Dict], prompt_format: str) -> List[Dict]:
    """rows of {nl, sstl, python, ...} -> [{'text': prompt, 'labels': target}].

    The label carries the closing fence, matching the reference
    (``loader.py:226-258``: ``python.strip() + "\\n```"``).
    """
    if prompt_format not in SFT_FORMATS:
        raise ValueError(f"unknown prompt_format {prompt_format!r}")
    fmt, sstl_key = SFT_FORMATS[prompt_format]
    out = []
    for row in rows:
        sstl = row[sstl_key] if sstl_key else ""
        text = format_train_prompt(fmt, nl=row["nl"], sstl=sstl)
        if prompt_format == "to_STL":
            label = row["sstl"] + "\n```"
        else:
            label = row["python"].strip() + "\n```"
        out.append({"text": text, "labels": label})
    return out


def create_prompt_dpo(rows: Sequence[Dict]) -> List[Dict]:
    """DPO triplets from {anchor, w_sstl, l_sstl} rows
    (``create_prompt_dpo``, ``loader.py:264-280``)."""
    out = []
    for row in rows:
        prompt = format_train_prompt("dpo_train_nl_to_sstl", nl=row["anchor"])
        out.append({
            "prompt": prompt,
            "chosen": row["w_sstl"].strip() + "\n```",
            "rejected": row["l_sstl"].strip() + "\n```",
        })
    return out


# --------------------------------------------------------------------------
# Tokenization (reference ``process_tokenize_sft`` / ``process_tokenize_dpo``).
# --------------------------------------------------------------------------


def _repair_bos_eos(ids: List[int], bos: Optional[int], eos: Optional[int]):
    if bos is not None and (not ids or ids[0] != bos):
        ids = [bos] + ids
    if eos is not None and (not ids or ids[-1] != eos):
        ids = ids + [eos]
    return ids


def tokenize_sft(rows: Sequence[Dict], tokenizer) -> List[Dict]:
    """[{'text', 'labels'}] -> [{'input_ids', 'labels'}] with the prompt
    span masked to -100 (+1 for the bos token, ``loader.py:165-167``).

    Prompt and label are tokenized SEPARATELY and concatenated.  Encoding
    the concatenated string (the reference's approach) lets BPE merge
    across the prompt/label boundary — with a domain-trained tokenizer the
    merges can swallow the open fence AND the start of the program into
    one token, so (a) ``len(encode(prompt))`` no longer locates the
    boundary and the -100 mask eats the first label tokens, and (b) the
    model never trains on the bare-fence context inference actually
    presents.  Separate encoding makes train tokens == inference tokens
    by construction."""
    out = []
    bos = getattr(tokenizer, "bos_token_id", None)
    eos = getattr(tokenizer, "eos_token_id", None)
    for row in rows:
        prompt = tokenizer.encode(row["text"], add_special_tokens=False)
        target = tokenizer.encode(row["labels"], add_special_tokens=False)
        source_len = len(prompt)
        ids = _repair_bos_eos(prompt + target, bos, eos)
        labels = list(ids)
        n_mask = min(source_len + 1, len(labels))
        labels[:n_mask] = [IGNORE_INDEX] * n_mask
        out.append({"input_ids": ids, "labels": labels})
    return out


def tokenize_dpo(rows: Sequence[Dict], tokenizer) -> List[Dict]:
    out = []
    eos = getattr(tokenizer, "eos_token_id", None)
    for row in rows:
        prompt = tokenizer.encode(row["prompt"], add_special_tokens=False)
        chosen = tokenizer.encode(row["chosen"], add_special_tokens=False)
        rejected = tokenizer.encode(row["rejected"], add_special_tokens=False)
        if eos is not None and (not chosen or chosen[-1] != eos):
            chosen = chosen + [eos]
        if eos is not None and (not rejected or rejected[-1] != eos):
            rejected = rejected + [eos]
        out.append({
            "prompt_input_ids": prompt,
            "chosen_input_ids": chosen,
            "rejected_input_ids": rejected,
        })
    return out


# --------------------------------------------------------------------------
# Packing / truncation (reference ``group_texts`` / ``truncate*``).
# --------------------------------------------------------------------------


def pack_sequences(rows: Sequence[Dict], max_len: int, pad_id: int) -> Dict:
    """Greedy sample packing to fixed-length rows (``group_texts``,
    ``loader.py:21-61``): concatenate consecutive samples while they fit,
    split oversized samples into max_len chunks, pad tails (labels padded
    with -100)."""
    final_ids, final_labels = [], []
    cur_ids: List[int] = []
    cur_labels: List[int] = []

    def flush():
        nonlocal cur_ids, cur_labels
        if cur_ids:
            pad = max_len - len(cur_ids)
            final_ids.append(cur_ids + [pad_id] * pad)
            final_labels.append(cur_labels + [IGNORE_INDEX] * pad)
            cur_ids, cur_labels = [], []

    for row in rows:
        ids = row["input_ids"]
        labels = row.get("labels", ids)
        if len(ids) > max_len:
            for i in range(0, len(ids), max_len):
                chunk = ids[i : i + max_len]
                lchunk = labels[i : i + max_len]
                pad = max_len - len(chunk)
                final_ids.append(list(chunk) + [pad_id] * pad)
                final_labels.append(list(lchunk) + [IGNORE_INDEX] * pad)
            continue
        if len(cur_ids) + len(ids) > max_len:
            flush()
        cur_ids.extend(ids)
        cur_labels.extend(labels)
    flush()
    return {
        "input_ids": np.asarray(final_ids, np.int32),
        "labels": np.asarray(final_labels, np.int32),
    }


def truncate_rows(rows: Sequence[Dict], max_len: int) -> List[Dict]:
    """Plain truncation (``truncate``, ``loader.py:74-99``)."""
    out = []
    for row in rows:
        r = dict(row)
        r["input_ids"] = row["input_ids"][:max_len]
        if "labels" in row:
            r["labels"] = row["labels"][:max_len]
        out.append(r)
    return out


def pad_rows(rows: Sequence[Dict], max_len: int, pad_id: int) -> Dict:
    """Truncate + right-pad to max_len (``truncate_and_add_padding``,
    ``loader.py:101-124``)."""
    ids, labels = [], []
    for row in rows:
        r = row["input_ids"][:max_len]
        ids.append(list(r) + [pad_id] * (max_len - len(r)))
        if "labels" in row:
            l = row["labels"][:max_len]
            labels.append(list(l) + [IGNORE_INDEX] * (max_len - len(l)))
    out = {"input_ids": np.asarray(ids, np.int32)}
    if labels:
        out["labels"] = np.asarray(labels, np.int32)
    return out


# --------------------------------------------------------------------------
# Mixture balancing (reference ``balance_datasets``, 4 modes).
# --------------------------------------------------------------------------


def balance_datasets(
    datasets: Sequence[List],
    balance: Sequence[float],
    total: Optional[int] = None,
    seed: Optional[int] = None,
) -> List[List]:
    """The reference's four balancing modes (``group_text.py:34-95``):

    1. total=None, balance=[1]: keep everything,
    2. total=int, balance=[1]: first ``total`` rows of each (pre-shuffled),
    3. total=None, multi-balance: anchor on the smallest dataset,
    4. total=int, multi-balance: proportional sampling with whole-dataset
       replication when a dataset is too small.
    """
    if abs(sum(balance) - 1.0) > 1e-9:
        raise ValueError("The balance values must sum to 1.")
    rng = random.Random(seed)
    balance = list(balance)
    if len(balance) > 1 and len(datasets) != len(balance):
        raise ValueError("datasets and balance must have the same length")

    if total is None:
        if balance == [1]:
            return list(datasets)
        min_i = min(range(len(datasets)), key=lambda i: len(datasets[i]))
        total_size = len(datasets[min_i]) / balance[min_i]
        return [
            list(ds[: int(total_size * p)])
            for ds, p in zip(datasets, balance)
        ]
    if balance == [1]:
        return [list(ds[:total]) for ds in datasets]
    out = []
    for ds, p in zip(datasets, balance):
        n_keep = int(total * p)
        if len(ds) < n_keep:
            repeats = n_keep // len(ds)
            remainder = n_keep % len(ds)
            rows = list(ds) * repeats + rng.sample(list(ds), remainder)
        else:
            rows = rng.sample(list(ds), n_keep)
        out.append(rows)
    return out
