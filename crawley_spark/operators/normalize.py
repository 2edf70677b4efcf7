"""Unicode text normalization for training-data pipelines.

Web text arrives in mixed normal forms (NFD from Mac-origin pages, NFC
elsewhere) and salted with zero-width/control characters; since every
downstream identity — exact-dedup md5, MinHash shingles, BPE merges — is
byte-keyed, normalization must run FIRST or visually-identical documents
dedup as distinct. The published practice (C4/ftfy-style): NFC, strip
control + format characters, collapse whitespace runs.

NFC itself needs Python (Spark has no built-in normalizer), so the kernel
is Arrow-batched ``mapInPandas`` over a widened input — one pass, no
shuffle, same shape as the other heavy text kernels. The control/format/
whitespace sets are EXPLICIT code-point tables below (not ``\\p{Cf}``
category probes), for two reasons: the oracle SQL is GENERATED from the
same tables (house pattern — Spark and DuckDB cannot desynchronize), and
category membership would otherwise float with the host's Unicode data
version. NFC agreement between Python's unicodedata and DuckDB's utf8proc
is safe: both implement UAX #15, which is stabilized for assigned code
points.
"""

from __future__ import annotations

import re
import unicodedata
from typing import Iterator

from pyspark.sql import DataFrame

# Cc controls minus the whitespace we keep (\t \n \r are folded into the
# whitespace collapse instead): U+0000-0008, 000B, 000C, 000E-001F, 007F-009F.
CONTROL_RANGES = [(0x00, 0x08), (0x0B, 0x0C), (0x0E, 0x1F), (0x7F, 0x9F)]

# Zero-width / directional format characters (Cf) that survive copy-paste
# into web text. Explicit, version-stable list: soft hyphen, zero-widths +
# joiners + marks, directional embeddings/overrides, word-joiner block, BOM.
FORMAT_RANGES = [
    (0x00AD, 0x00AD),
    (0x200B, 0x200F),
    (0x202A, 0x202E),
    (0x2060, 0x2064),
    (0xFEFF, 0xFEFF),
]

# Whitespace collapsed to a single ASCII space: ASCII runs + NBSP, the Zs
# en/em-space block, narrow NBSP, math space, ideographic space.
WS_RANGES = [
    (0x09, 0x0D),
    (0x20, 0x20),
    (0x00A0, 0x00A0),
    (0x2000, 0x200A),
    (0x202F, 0x202F),
    (0x205F, 0x205F),
    (0x3000, 0x3000),
]


def _char_class(ranges: list) -> str:
    return "[" + "".join(
        chr(a) if a == b else f"{chr(a)}-{chr(b)}" for a, b in ranges
    ) + "]"


_DROP_RE = re.compile(_char_class(CONTROL_RANGES + FORMAT_RANGES))
_WS_RE = re.compile(_char_class(WS_RANGES) + "+")


def normalize_str(s: str) -> str:
    """The exact per-document rule, reused by tests as the brute oracle:
    NFC -> drop control/format chars -> collapse whitespace runs to one
    space -> strip edges."""
    t = unicodedata.normalize("NFC", s)
    t = _DROP_RE.sub("", t)
    # strip ASCII space only: collapse already mapped every WS-set char to
    # ' ', and Python's bare strip() would also eat edge chars outside the
    # table (e.g. U+1680) that the DuckDB oracle's trim keeps
    return _WS_RE.sub(" ", t).strip(" ")


def normalize_text(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Returns (id_col, norm string, changed boolean, n_chars_before long,
    n_chars_after long). Null text passes through as null (changed=null).
    One widened scan, zero shuffle on wide inputs."""
    import pandas as pd

    from .dedup import widen_narrow_input

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            src = pdf[text_col]
            norm = src.map(lambda s: None if s is None else normalize_str(s))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "norm": norm,
                    "changed": [
                        None if s is None else (s != n)
                        for s, n in zip(src, norm)
                    ],
                    "n_chars_before": src.str.len().astype("Int64"),
                    "n_chars_after": norm.str.len().astype("Int64"),
                }
            )

    schema = (
        f"{id_col} long, norm string, changed boolean, "
        "n_chars_before long, n_chars_after long"
    )
    return widen_narrow_input(df, [id_col, text_col]).mapInPandas(run, schema)


def duckdb_char_class(ranges: list) -> str:
    """RE2 character class over the same table, for the generated oracle."""
    def esc(cp: int) -> str:
        return "\\x{%04X}" % cp

    return "[" + "".join(
        esc(a) if a == b else f"{esc(a)}-{esc(b)}" for a, b in ranges
    ) + "]"
