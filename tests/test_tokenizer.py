"""Tokenizer contract tests (reference magma/utils.py:43-58)."""

import numpy as np
import pytest

from magma_tpu.tokenizer import ByteFallbackTokenizer, get_tokenizer


def test_id_space_contract():
    tok = get_tokenizer("gpt2", sequence_length=2048)
    assert len(tok) == 50258
    assert tok.eos_token_id == 50256
    assert tok.image_token_id == 50257
    assert tok.cls_token_id == tok.image_token_id  # magma.py:48 reads cls
    assert tok.pad_token_id == tok.eos_token_id    # pad == eos
    assert tok.model_max_length == 2048


def test_encode_decode_roundtrip():
    tok = get_tokenizer("gpt2")
    text = "A cabin on a lake"
    ids = tok.encode(text)
    assert ids.ndim == 2 and ids.dtype == np.int32
    assert tok.decode(ids[0]) == text


def test_padding_to_max_length():
    tok = ByteFallbackTokenizer(64)
    out = tok.encode("hi", max_length=10, padding="max_length")
    assert out.shape == (1, 10)
    assert list(out[0, 2:]) == [50256] * 8  # right-padded with eos


def test_truncation():
    tok = ByteFallbackTokenizer(64)
    out = tok.encode("hello world", max_length=4, padding="max_length", truncation=True)
    assert out.shape == (1, 4)


def test_decode_strips_special_tokens():
    tok = ByteFallbackTokenizer(64)
    ids = [72, 105, 50257, 50256, 65]  # "Hi" + image + eos + "A"
    assert tok.decode(ids) == "HiA"


def test_unknown_name_raises():
    with pytest.raises(ValueError):
        get_tokenizer("llama")


# ---------------------------------------------------------------------------
# Real-BPE loading path, driven by a miniature GPT-2-format vocab fixture
# (the full GPT-2 vocab.json/merges.txt can't be downloaded in this sandbox;
# the loading/merge/special-token logic is identical at any vocab size).
# ---------------------------------------------------------------------------

MINI_VOCAB = {
    "<|endoftext|>": 0, "h": 1, "e": 2, "l": 3, "o": 4, "Ġ": 5,
    "he": 6, "ll": 7, "hell": 8,
}
MINI_MERGES = "#version: 0.2\nh e\nl l\nhe ll\n"


def _write_mini_bpe(d):
    import json
    (d / "vocab.json").write_text(json.dumps(MINI_VOCAB))
    (d / "merges.txt").write_text(MINI_MERGES)
    return str(d / "vocab.json"), str(d / "merges.txt")


def test_bpe_loading_path_with_mini_vocab(tmp_path):
    from magma_tpu.tokenizer import GPT2BPETokenizer, get_tokenizer

    vocab, merges = _write_mini_bpe(tmp_path)
    tok = get_tokenizer("gpt2", sequence_length=32,
                        vocab_file=vocab, merges_file=merges)
    assert isinstance(tok, GPT2BPETokenizer)
    # special tokens: eos from the vocab, <|image|> appended last
    assert tok.eos_token_id == 0
    assert tok.image_token_id == len(MINI_VOCAB)  # appended after the vocab
    assert tok.cls_token_id == tok.image_token_id
    assert tok.pad_token_id == tok.eos_token_id

    # merges actually apply: "hello hello" -> [hell, o, Ġ, hell, o]
    ids = tok.encode("hello hello")
    assert ids.shape[0] == 1 and ids.dtype.name == "int32"
    assert list(ids[0]) == [8, 4, 5, 8, 4]

    # padding pads with eos; decode strips eos + image tokens
    padded = tok.encode("hello", max_length=8, padding="max_length")
    assert padded.shape == (1, 8)
    assert list(padded[0][2:]) == [tok.eos_token_id] * 6
    row = [tok.image_token_id] * 2 + list(padded[0])
    assert tok.decode(row) == "hello"
    assert tok.batch_decode([row, row]) == ["hello", "hello"]


def test_bpe_env_dir_resolution(tmp_path, monkeypatch):
    from magma_tpu.tokenizer import GPT2BPETokenizer, get_tokenizer

    _write_mini_bpe(tmp_path)
    monkeypatch.setenv("MAGMA_TPU_GPT2_DIR", str(tmp_path))
    tok = get_tokenizer("gpt2", sequence_length=16)
    assert isinstance(tok, GPT2BPETokenizer)
    assert tok.model_max_length == 16


def test_byte_fallback_warns_and_strict_raises(tmp_path, monkeypatch):
    """The byte fallback must never engage silently (VERDICT r3 item 6):
    it warns by default and raises under strict=True — production sets
    MultimodalConfig.strict_tokenizer."""
    import warnings

    import pytest

    from magma_tpu.tokenizer import ByteFallbackTokenizer, get_tokenizer

    # force the no-assets path regardless of this host's caches
    monkeypatch.delenv("MAGMA_TPU_GPT2_DIR", raising=False)
    monkeypatch.setenv("HF_HOME", str(tmp_path / "hf"))
    monkeypatch.setenv("HOME", str(tmp_path))

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        tok = get_tokenizer("gpt2", sequence_length=64)
    assert isinstance(tok, ByteFallbackTokenizer)
    assert any("MAGMA_TPU_GPT2_DIR" in str(w.message) for w in rec)

    with pytest.raises(FileNotFoundError, match="GPT-2 BPE"):
        get_tokenizer("gpt2", sequence_length=64, strict=True)
