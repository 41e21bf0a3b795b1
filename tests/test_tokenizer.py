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
