"""Pin the vendored ftfy-equivalent (models/clip/textfix.py) to ftfy's
published behavior, and prove tokenizer parity with the reference on
non-ASCII / mojibake / html-escaped inputs (the path the reference runs
through real ftfy, simple_tokenizer.py:50-55)."""

import pytest

from fsvlm_tpu.models.clip.textfix import fix_encoding, fix_text
from fsvlm_tpu.models.clip.tokenizer import get_tokenizer

# (input, expected) — expected values are ftfy's own documented outputs
# (ftfy README/docs examples) plus NFC/width/quote normalization cases.
FTFY_CASES = [
    ("âœ” No problems", "✔ No problems"),
    ("The Mona Lisa doesnâ€™t have eyebrows.",
     "The Mona Lisa doesn't have eyebrows."),
    ("l&#39;humanitÃ©", "l'humanité"),
    ("Ã¼ber cool", "über cool"),
    ("naÃ¯ve dÃ©jÃ  vu", "naïve déjà vu"),
    ("ÃƒÂ©", "é"),  # double-encoded
    ("ＬＯＵＤ　ＮＯＩＳＥＳ", "LOUD NOISES"),  # fullwidth + ideographic space
    ("ﬁnancial ﬂow", "financial flow"),  # ligatures
    ("“smart quotes”", '"smart quotes"'),
    ("it’s", "it's"),
    ("plain ascii text stays.", "plain ascii text stays."),
    ("café déjà", "café déjà"),  # already-clean accents untouched
    ("café", "café"),  # NFD -> NFC
    ("A\x85B", "A…B"),  # C1 control interpreted as cp1252 (ftfy behavior)
]


@pytest.mark.parametrize("src,want", FTFY_CASES)
def test_fix_text_ftfy_examples(src, want):
    assert fix_text(src) == want


def test_fix_text_idempotent():
    for src, want in FTFY_CASES:
        assert fix_text(fix_text(src)) == fix_text(src)


def test_fix_encoding_leaves_valid_unicode_alone():
    for text in ["한국어", "日本語テキスト", "emoji 🎉 stays", "Ελληνικά"]:
        assert fix_encoding(text) == text
        assert fix_text(text) == text


MESSY_TEXTS = [
    "a photo of a crème brûlée, a type of food.",
    "l&#39;humanitÃ© &amp; more",
    "doesnâ€™t translate",
    "ＬＯＵＤ ＮＯＩＳＥＳ photo",
    "ﬁne-grained ﬂower classiﬁcation",
    "“a photo” of ‘quotes’",
    "naÃ¯ve user input",
    "café au lait",
    "日本語 mixed with english",
]


@pytest.fixture(scope="module")
def ref_tokenizer():
    from reference_oracle import import_reference_clip, reference_available

    if not reference_available():
        pytest.skip("reference checkout not available")
    import_reference_clip()
    from clip.simple_tokenizer import SimpleTokenizer

    return SimpleTokenizer()


@pytest.mark.parametrize("text", MESSY_TEXTS)
def test_tokenizer_parity_non_ascii(ref_tokenizer, text):
    """The oracle's ftfy stub delegates to textfix.fix_text (validated above
    against real-ftfy outputs), so this covers the byte-BPE path — unicode
    word splitting, UTF-8 byte mapping, merges — on non-ASCII input."""
    assert get_tokenizer().encode(text) == ref_tokenizer.encode(text), text
