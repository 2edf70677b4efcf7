"""PII redaction for training-data pipelines (beyond-reference op, late
r05): mask emails, IPv4 addresses, and phone numbers in document text and
count the redactions — the standard webtext-cleaning stage published in
open corpus pipelines (e.g. the BigScience/BigCode PII statements; the
patterns below are original conservative regexes built from public
knowledge, not copied lists).

All hot-path logic is JVM-side ``regexp_replace`` / ``regexp_count`` —
one scan, zero shuffle, trivially 100-TB-parallel. The patterns restrict
themselves to regex constructs that Java (Spark) and RE2 (DuckDB)
interpret identically — character classes, bounded repetition, ``\\b``,
non-capturing groups; no lookaround, no backreferences — so the DuckDB
oracle recomputes masked text and counts byte-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Order matters and is part of the contract: emails first (so the phone
# pattern can never eat an address's digits), then IPv4 (dots bind tighter
# than the phone class), then phones. Each replacement token contains no
# digits, so later patterns cannot match inside earlier masks.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\- ]{6,}[0-9]", "<PHONE>"),
]


def pii_mask(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc PII redaction: returns ``masked`` text with every email /
    IPv4 / phone match replaced by a typed token, plus a redaction count
    per category (counted on the pre-masking text for emails, then on the
    progressively masked text for ipv4/phone — exactly the sequence the
    replacement itself sees, so counts always equal replacements made)."""
    masked = F.col(text_col)
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(F.regexp_count(masked, F.lit(pat)).alias(f"n_{name}"))
        masked = F.regexp_replace(masked, pat, token)
    return df.select(F.col("doc_id"), *counts, masked.alias("masked"))
