"""Tokenizer golden tests: ids must be byte-identical to the reference."""

import numpy as np
import pytest

from fsvlm_tpu.models.clip.tokenizer import get_tokenizer, tokenize
from reference_oracle import import_reference_clip, reference_available

TEXTS = [
    "a photo of a cat.",
    "a photo of a abyssinian, a type of pet.",
    "X X X X golden retriever.",
    "itap of a 1962 Ferrari 250 GTO!",
    "satellite photo of annual crop land.",
    "a bad photo of the {}.",
    "an embroidered aircraft carrier",
    "this    has   extra whitespace\tand\ttabs",
    "apostrophe's and can't and we'll",
    "",
    "a",
    "Mixed CASE Text With Numbers 12345 and §ymbols &amp; entities",
]


@pytest.fixture(scope="module")
def ref_tokenizer():
    if not reference_available():
        pytest.skip("reference checkout not available")
    clip = import_reference_clip()
    from clip.simple_tokenizer import SimpleTokenizer

    return SimpleTokenizer(), clip


def test_vocab_size():
    tok = get_tokenizer()
    assert tok.vocab_size == 49408
    assert tok.sot_id == 49406
    assert tok.eot_id == 49407


@pytest.mark.parametrize("text", [t for t in TEXTS if t])
def test_encode_matches_reference(ref_tokenizer, text):
    ref, _ = ref_tokenizer
    ours = get_tokenizer()
    assert ours.encode(text) == ref.encode(text), text


def test_tokenize_matches_reference(ref_tokenizer):
    _, ref_clip = ref_tokenizer
    texts = [t for t in TEXTS if t]
    ref_ids = ref_clip.tokenize(texts).numpy()
    our_ids = tokenize(texts)
    np.testing.assert_array_equal(our_ids, ref_ids.astype(np.int32))


def test_tokenize_truncate():
    long_text = "word " * 200
    with pytest.raises(RuntimeError):
        tokenize(long_text)
    ids = tokenize(long_text, truncate=True)
    assert ids.shape == (1, 77)
    assert ids[0, -1] == get_tokenizer().eot_id


def test_roundtrip_decode():
    tok = get_tokenizer()
    ids = tok.encode("a photo of a golden retriever, a type of dog.")
    assert tok.decode(ids).strip() == "a photo of a golden retriever , a type of dog ."
