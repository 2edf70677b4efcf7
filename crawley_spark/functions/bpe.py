"""Byte-level BPE tokenizer (VERDICT r03 "next" #4) — a true merge-table
encoder kept alongside textstats' single-regex estimate.

Public-knowledge design (GPT-2-style byte-level BPE, Sennrich et al. 2016 /
Radford et al. 2019): text is pre-tokenized with a GPT-2-shaped regex
(ASCII classes so behavior is locale-independent), each piece is UTF-8
encoded and mapped byte→printable-unicode (the GPT-2 byte table, so merges
operate on visible chars and every byte sequence is representable), then
merges apply lowest-rank-first. Encoding is LOSSLESS: decode(encode(t)) ==
t for any *valid-Unicode* string — which covers every string Spark can hand
the UDF, since Arrow-backed Spark strings are valid UTF-8. (Python strings
containing lone surrogates outside U+DC80-DCFF — unreachable from Spark —
are not encodable: ``str.encode("utf-8", "surrogateescape")`` raises on
them by design rather than silently corrupting the roundtrip.) The
roundtrip is the operator's oracle invariant.

No external vocab file: the default merge table is LEARNED AT FIRST USE
from a fixed seed text embedded below (standard BPE training: repeatedly
merge the most frequent adjacent pair, ties broken lexicographically), so
it is fully deterministic, self-contained, and tiny (256 merges ≈ a few
KB). Real pipelines would pass their model's merge list to
``encode(..., merges=...)``; the plumbing is identical.

Scale shape: the merge table is a small broadcast-friendly closure; the
encoder is called from an Arrow-batched pandas UDF (operators/textstats.py
bpe_token_stats) with a per-word LRU memo — natural-language word
distributions are Zipfian, so the memo turns per-word merge loops into
dict hits for the bulk of tokens."""

from __future__ import annotations

import re
from collections import Counter
from functools import lru_cache

# GPT-2-shaped pre-tokenizer, ASCII classes (Java/RE2/Python-identical):
# contractions | space?-letters | space?-digits | space?-other | trailing ws
# | ws-run. findall pieces always concatenate back to the input (lossless).
PRETOKEN_RE = re.compile(
    r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
)

_N_DEFAULT_MERGES = 256

# Fixed seed text the default merge table is trained on (public-domain-style
# filler chosen for ordinary English letter statistics; any change to it
# changes the default vocab, so it is frozen).
_SEED_TEXT = (
    "the quick brown fox jumps over the lazy dog and the dog barks at the "
    "fox while the cat sleeps in the sun on the warm stone wall near the "
    "old mill by the river where the water runs clear and cold over the "
    "rocks and the children play in the field after school until the sun "
    "sets behind the hills and the lights come on in the town one by one "
    "as the people walk home along the road talking about the day and the "
    "work and the weather and what they will do tomorrow when the morning "
    "comes again with the light and the birds singing in the trees 0123456789"
)


def bytes_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte -> printable-unicode-char table: printable
    ASCII and Latin-1 map to themselves, the rest to U+0100+offset."""
    bs = list(range(33, 127)) + list(range(161, 173)) + list(range(174, 256))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


_B2U = bytes_to_unicode()
_U2B = {c: b for b, c in _B2U.items()}


def _to_units(piece: str) -> tuple[str, ...]:
    """Pre-token piece -> tuple of byte-unicode chars (the BPE alphabet)."""
    return tuple(_B2U[b] for b in piece.encode("utf-8", "surrogateescape"))


def learn_merges(text: str, n_merges: int = _N_DEFAULT_MERGES) -> list[tuple[str, str]]:
    """Standard BPE training: count adjacent symbol pairs over the
    pre-tokenized word multiset, merge the most frequent (ties ->
    lexicographically smallest pair, fully deterministic), repeat."""
    words = Counter(_to_units(p) for p in PRETOKEN_RE.findall(text))
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, c in words.items():
            for a, b in zip(w, w[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_words: Counter = Counter()
        for w, c in words.items():
            out, i = [], 0
            while i < len(w):
                if i + 1 < len(w) and w[i] == best[0] and w[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            new_words[tuple(out)] += c
        words = new_words
    return merges


_DEFAULT: dict | None = None


def default_ranks() -> dict[tuple[str, str], int]:
    """Rank table of the deterministic built-in vocab (lazy-trained once)."""
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = {p: i for i, p in enumerate(learn_merges(_SEED_TEXT))}
    return _DEFAULT


def _encode_word(units: tuple[str, ...], ranks: dict) -> tuple[str, ...]:
    w = list(units)
    while len(w) >= 2:
        best, best_rank = None, None
        for p in zip(w, w[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = p, r
        if best is None:
            break
        merged, out, i = best[0] + best[1], [], 0
        while i < len(w):
            if i + 1 < len(w) and w[i] == best[0] and w[i + 1] == best[1]:
                out.append(merged)
                i += 2
            else:
                out.append(w[i])
                i += 1
        w = out
    return tuple(w)


def make_encoder(merges: list[tuple[str, str]] | None = None):
    """Returns ``encode(text) -> list[str]`` with a per-word memo bound to
    this merge table (one encoder per executor task; Zipfian word reuse
    makes the memo the hot path)."""
    ranks = (
        {p: i for i, p in enumerate(merges)} if merges is not None else default_ranks()
    )

    @lru_cache(maxsize=65536)
    def _word(units: tuple[str, ...]) -> tuple[str, ...]:
        return _encode_word(units, ranks)

    def encode(text: str) -> list[str]:
        toks: list[str] = []
        for piece in PRETOKEN_RE.findall(text):
            toks.extend(_word(_to_units(piece)))
        return toks

    return encode


def decode(tokens: list[str]) -> str:
    """Inverse of encode (byte-exact): concatenate token chars, map back
    through the byte table, UTF-8 decode."""
    data = bytes(_U2B[c] for t in tokens for c in t)
    return data.decode("utf-8", "surrogateescape")
