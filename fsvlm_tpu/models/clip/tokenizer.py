"""CLIP byte-level BPE tokenizer.

Behavior-parity reimplementation of OpenAI CLIP's tokenizer (reference:
PromptSRC/clip/simple_tokenizer.py:1-132 and clip/clip.py:185-221).  Token ids
must be byte-identical to the reference for prompt-learning parity: the
learned context vectors are spliced between tokenized prefix/suffix segments,
so any id drift shifts the EOT position and breaks checkpoint compatibility.

The 49,152-entry BPE merge table (``bpe_simple_vocab_16e6.txt.gz``) is data,
not code; it is not vendored here.  ``find_bpe_vocab()`` searches, in order:
``$FSVLM_BPE_PATH``, this package directory, ``~/.cache/clip``, and the
read-only reference checkout.
"""

import functools
import gzip
import html
import os

import numpy as np
import regex as re

from .textfix import fix_text

_VOCAB_FILENAME = "bpe_simple_vocab_16e6.txt.gz"

SOT_TOKEN = "<|startoftext|>"
EOT_TOKEN = "<|endoftext|>"


def find_bpe_vocab():
    candidates = []
    env = os.environ.get("FSVLM_BPE_PATH")
    if env:
        candidates.append(env)
    here = os.path.dirname(os.path.abspath(__file__))
    candidates += [
        os.path.join(here, _VOCAB_FILENAME),
        os.path.expanduser(os.path.join("~/.cache/clip", _VOCAB_FILENAME)),
        os.path.join("/root/reference/PromptSRC/clip", _VOCAB_FILENAME),
    ]
    for c in candidates:
        if os.path.isfile(c):
            return c
    raise FileNotFoundError(
        f"CLIP BPE vocab ({_VOCAB_FILENAME}) not found. Searched: {candidates}. "
        "Set FSVLM_BPE_PATH to the vocab file location."
    )


@functools.lru_cache()
def byte_to_unicode_table():
    """Reversible byte -> printable-unicode map (GPT-2 style).

    Printable latin ranges map to themselves; the remaining 68 bytes map to
    256+i so no token string ever contains whitespace/control characters.
    """
    keep = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    table = {}
    extra = 0
    for b in range(256):
        if b in table:
            continue
        if b in keep:
            table[b] = chr(b)
        else:
            table[b] = chr(256 + extra)
            extra += 1
    # dict order must follow `keep` first then the extras, to match the
    # reference vocab construction order
    ordered = {b: chr(b) for b in keep}
    extra = 0
    for b in range(256):
        if b not in ordered:
            ordered[b] = chr(256 + extra)
            extra += 1
    return ordered


def _clean_text(text):
    """ftfy.fix_text + double html.unescape + strip
    (simple_tokenizer.py:50-55).

    ftfy is not installed in this environment; ``textfix.fix_text`` is a
    vendored equivalent of its default pipeline (mojibake repair, width/
    ligature/quote normalization, NFC), behavior-pinned by
    tests/test_textfix.py against ftfy's published examples.
    """
    text = fix_text(text)
    text = html.unescape(html.unescape(text))
    return text.strip()


class ClipTokenizer:
    def __init__(self, bpe_path=None):
        bpe_path = bpe_path or find_bpe_vocab()
        self.byte_encoder = byte_to_unicode_table()
        self.byte_decoder = {c: b for b, c in self.byte_encoder.items()}

        lines = gzip.open(bpe_path).read().decode("utf-8").split("\n")
        # line 0 is a header; the usable merge list is exactly
        # 49152 - 256*2 - 2 entries (SOT/EOT + byte vocab take the rest)
        merge_lines = lines[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(line.split()) for line in merge_lines]
        self.merge_rank = {pair: i for i, pair in enumerate(merges)}

        vocab = list(self.byte_encoder.values())
        vocab += [c + "</w>" for c in vocab]
        vocab += ["".join(pair) for pair in merges]
        vocab += [SOT_TOKEN, EOT_TOKEN]
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}

        self._bpe_cache = {SOT_TOKEN: SOT_TOKEN, EOT_TOKEN: EOT_TOKEN}
        self.word_pattern = re.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
            r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
            re.IGNORECASE,
        )

    @property
    def vocab_size(self):
        return len(self.encoder)

    @property
    def sot_id(self):
        return self.encoder[SOT_TOKEN]

    @property
    def eot_id(self):
        return self.encoder[EOT_TOKEN]

    def _apply_bpe(self, token):
        cached = self._bpe_cache.get(token)
        if cached is not None:
            return cached
        # a "word" is a sequence of symbols; the last byte carries the
        # end-of-word marker
        symbols = list(token[:-1]) + [token[-1] + "</w>"]
        if len(symbols) == 1:
            return token + "</w>"

        while len(symbols) > 1:
            # find the lowest-rank adjacent pair
            best_rank = None
            best_idx = -1
            for i in range(len(symbols) - 1):
                rank = self.merge_rank.get((symbols[i], symbols[i + 1]))
                if rank is not None and (best_rank is None or rank < best_rank):
                    best_rank = rank
                    best_idx = i
            if best_rank is None:
                break
            first, second = symbols[best_idx], symbols[best_idx + 1]
            # merge every (non-overlapping, left-to-right) occurrence of the pair
            merged = []
            i = 0
            while i < len(symbols):
                if (
                    i < len(symbols) - 1
                    and symbols[i] == first
                    and symbols[i + 1] == second
                ):
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(symbols[i])
                    i += 1
            symbols = merged

        result = " ".join(symbols)
        self._bpe_cache[token] = result
        return result

    def encode(self, text):
        text = _clean_text(text)
        text = re.sub(r"\s+", " ", text).strip().lower()
        ids = []
        for word in re.findall(self.word_pattern, text):
            mapped = "".join(self.byte_encoder[b] for b in word.encode("utf-8"))
            ids.extend(self.encoder[sym] for sym in self._apply_bpe(mapped).split(" "))
        return ids

    def decode(self, ids):
        text = "".join(self.decoder[i] for i in ids)
        raw = bytearray(self.byte_decoder[c] for c in text)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")


@functools.lru_cache()
def get_tokenizer():
    return ClipTokenizer()


def tokenize(texts, context_length=77, truncate=False):
    """Tokenize text(s) into a [N, context_length] int32 array.

    Parity with clip/clip.py:185-221: SOT + bpe ids + EOT, zero padded; raises
    on overflow unless ``truncate`` (which then keeps EOT as last token).
    """
    if isinstance(texts, str):
        texts = [texts]
    tok = get_tokenizer()
    sot, eot = tok.sot_id, tok.eot_id

    out = np.zeros((len(texts), context_length), dtype=np.int32)
    for row, text in enumerate(texts):
        ids = [sot] + tok.encode(text) + [eot]
        if len(ids) > context_length:
            if truncate:
                ids = ids[:context_length]
                ids[-1] = eot
            else:
                raise RuntimeError(
                    f"Input {text} is too long for context length {context_length}"
                )
        out[row, : len(ids)] = ids
    return out
