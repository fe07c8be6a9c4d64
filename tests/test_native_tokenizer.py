"""Native (C++) BPE tokenizer: parity vs the HF `tokenizers` trainer on the
real corpus, round-trips, and incremental stop-word decoding."""

import random

import pytest

from pdec.cpp.tokenizer import NativeBPETokenizer, StreamDecoder
from pdec.data.generator import GeneratorConfig, sample_problem
from pdec.data.prompts import format_train_prompt


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(7)
    texts = []
    for _ in range(60):
        kind = rng.choice(["heat", "wave"])
        ex = sample_problem(rng, GeneratorConfig(kind=kind,
                                                 n_clauses=rng.choice([1, 2, 3])))
        texts.append(format_train_prompt(
            "train_nl_and_sstl_to_python", ex.nl, ex.sstl, ex.python
        ) + ex.python)
    return texts


@pytest.fixture(scope="module")
def hf_and_native(corpus):
    from tokenizers import Tokenizer, models, trainers
    from tokenizers import decoders, pre_tokenizers

    hf = Tokenizer(models.BPE())
    hf.pre_tokenizer = pre_tokenizers.ByteLevel(
        add_prefix_space=False, use_regex=False
    )
    hf.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=1024,
        special_tokens=["<pad>", "<s>", "</s>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False,
    )
    hf.train_from_iterator(corpus, trainer)
    native = NativeBPETokenizer.from_hf(hf)
    return hf, native


def test_native_build_succeeded(hf_and_native):
    _, native = hf_and_native
    assert native._handle is not None, "C++ extension failed to build/load"
    assert native.bos_token_id == 1 and native.eos_token_id == 2


def test_encode_parity_vs_hf_on_corpus(hf_and_native, corpus):
    hf, native = hf_and_native
    for text in corpus:
        want = hf.encode(text).ids
        got = native.encode(text, add_special_tokens=False)
        assert got == want, f"encode mismatch on {text[:60]!r}"


def test_decode_round_trip(hf_and_native, corpus):
    _, native = hf_and_native
    for text in corpus[:20]:
        ids = native.encode(text, add_special_tokens=False)
        assert native.decode(ids) == text


def test_python_fallback_matches_native(hf_and_native, corpus):
    _, native = hf_and_native
    for text in corpus[:10]:
        raw = text.encode("utf-8")
        assert native._encode_py(raw) == native.encode(
            text, add_special_tokens=False
        )


def test_unicode_and_specials(hf_and_native):
    _, native = hf_and_native
    text = "ρ(x) = 0.5, ∀x ∈ [10, 60] — héat"
    ids = native.encode(text)
    assert ids[0] == native.bos_token_id
    assert native.decode(ids[1:]) == text


def test_save_load_round_trip(hf_and_native, corpus, tmp_path):
    _, native = hf_and_native
    p = tmp_path / "tok.json"
    native.save(str(p))
    loaded = NativeBPETokenizer.load(str(p))
    text = corpus[0]
    assert loaded.encode(text) == native.encode(text)
    assert loaded.decode(loaded.encode(text, add_special_tokens=False)) == text


def test_train_classmethod(corpus):
    tok = NativeBPETokenizer.train(corpus, vocab_size=512)
    text = corpus[0]
    ids = tok.encode(text, add_special_tokens=False)
    assert tok.decode(ids) == text
    assert tok.vocab_size <= 512


class _ByteTok:
    """Minimal decode_bytes-less tokenizer for the fallback path."""

    def decode(self, ids):
        return "".join(chr(i) for i in ids)


def test_stream_decoder_incremental(hf_and_native):
    _, native = hf_and_native
    text = "### Instruction:\nsome task\n### Response:\nanswer"
    ids = native.encode(text, add_special_tokens=False)
    sd = StreamDecoder(native)
    # feed in uneven chunks; text must match the full decode at each point
    consumed = 0
    for size in (1, 3, 2, 5, 100):
        chunk = ids[consumed:consumed + size]
        sd.feed(chunk)
        consumed += len(chunk)
        assert sd.text == native.decode(ids[:consumed])
    assert sd.text == text


def test_stream_decoder_stop_across_chunks(hf_and_native):
    _, native = hf_and_native
    stop = "### Instruction:"
    text = "answer text\n" + stop + " trailing"
    ids = native.encode(text, add_special_tokens=False)
    sd = StreamDecoder(native)
    fired = False
    for i in range(0, len(ids), 2):  # 2-token chunks split the stop string
        sd.feed(ids[i:i + 2])
        if sd.stopped((stop,)):
            fired = True
            break
    assert fired
    assert stop in sd.text


def test_stream_decoder_no_false_stop():
    sd = StreamDecoder(_ByteTok())
    sd.feed([ord(c) for c in "hello wor"])
    assert not sd.stopped(("world",))
    sd.feed([ord("l"), ord("d")])
    assert sd.stopped(("world",))


# ---- native trainer (pdec_tok_train) ------------------------------------

TRAIN_CORPUS = [
    "the heat equation rod must stay above the profile",
    "the wave equation rod displacement is bounded",
    "G_[0.0, 3.0] (forall x in [10, 50] (u(x) - (0.1 x + 5.0) > 0))",
    "F_[1.0, 2.0] (forall x in [20, 80] (u(x) - (-0.2 x + 3.0) < 0))",
] * 64


def test_native_trainer_roundtrip_and_compression():
    tok = NativeBPETokenizer.train(TRAIN_CORPUS, vocab_size=512)
    assert tok.vocab_size <= 512
    text = TRAIN_CORPUS[0] + " " + TRAIN_CORPUS[2]
    ids = tok.encode(text, add_special_tokens=False)
    assert tok.decode(ids) == text
    # merges must actually compress: far fewer tokens than bytes
    assert len(ids) < len(text.encode()) * 0.6
    # specials carry ids 0..2 in the given order (HF trainer convention)
    assert (tok.pad_token_id, tok.bos_token_id, tok.eos_token_id) == (0, 1, 2)


def test_native_trainer_deterministic():
    a = NativeBPETokenizer.train(TRAIN_CORPUS, vocab_size=384)
    b = NativeBPETokenizer.train(TRAIN_CORPUS, vocab_size=384)
    assert a.merges == b.merges
    assert a.vocab == b.vocab


def test_native_trainer_matches_python_encode():
    """Native encode with trained tables == the pure-python greedy encoder
    (same rank order), so the trainer's tables are well-formed."""
    tok = NativeBPETokenizer.train(TRAIN_CORPUS, vocab_size=384)
    for text in TRAIN_CORPUS[:4]:
        native = tok.encode(text, add_special_tokens=False)
        py = tok._encode_py(text.encode("utf-8"))
        assert native == py


def test_native_trainer_quality_parity_with_hf():
    """Same-vocab-size compression within 10% of the HF trainer on held-out
    text (merge ORDER may differ on count ties; quality must not)."""
    held_out = (
        "G_[0.5, 2.5] (forall x in [30, 60] (u(x) - (0.05 x + 4.0) > 0)) "
        "and the heat rod profile must stay bounded above the wave"
    )
    nat = NativeBPETokenizer.train(TRAIN_CORPUS, vocab_size=512)
    hf = NativeBPETokenizer.train_hf(TRAIN_CORPUS, vocab_size=512)
    n_nat = len(nat.encode(held_out, add_special_tokens=False))
    n_hf = len(hf.encode(held_out, add_special_tokens=False))
    assert n_nat <= n_hf * 1.1
