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


# Payment-card candidates: a bare run of 13-19 digits delimited by
# non-word characters (\b in both Java and RE2: letter-adjacent or
# longer runs never match, identically on both engines). Validity is the
# published Luhn mod-10 checksum (public knowledge; ISO/IEC 7812) —
# detector-style PII passes gate card masking on it to cut the false
# positives a bare digit-run regex would produce.
CC_CANDIDATE_RE = r"\b[0-9]{13,19}\b"
CC_TOKEN = "<CC>"

# Luhn as a pure Spark-SQL expression over a digit-string lambda var `s`:
# digit i (1-based from the LEFT) is doubled when its position from the
# right (length - i + 1) is even, i.e. (length(s) - i) % 2 = 1; doubled
# values over 9 subtract 9; valid iff the sum is 0 mod 10. Everything is
# integer arithmetic on ascii codes so a DuckDB oracle can restate the
# identical formula with list_transform/list_sum/ord.
_LUHN_D = "(ascii(substr(s, i, 1)) - 48)"
LUHN_SUM_SQL = (
    "aggregate(sequence(1, length(s)), 0, (acc, i) -> acc + "
    "CASE WHEN (length(s) - i) % 2 = 1 "
    f"THEN CASE WHEN 2 * {_LUHN_D} > 9 THEN 2 * {_LUHN_D} - 9 "
    f"ELSE 2 * {_LUHN_D} END ELSE {_LUHN_D} END)"
)


def luhn_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc payment-card detection: candidate digit runs
    (``CC_CANDIDATE_RE``), the subset passing the Luhn checksum, and
    ``cc_masked`` = text with every VALID number literal-replaced by
    ``<CC>`` (replacement folds over the bytewise-sorted distinct valid
    set, so it is order-independent and partitioning-independent; invalid
    candidates are deliberately left untouched — order numbers, IDs).

    One zero-shuffle JVM scan: regexp_extract_all + a bounded aggregate
    HOF per candidate (candidates per doc are few — HOF interpretation
    cost is irrelevant here, unlike gopher_repetition's per-char scans).
    Returns (doc_id, n_cc_candidates, n_cc_valid, cc_valid_md5,
    cc_masked)."""
    # the pattern goes through F.lit, never through a SQL string literal —
    # Spark's parser unescapes backslashes in literals, which would mangle
    # the \b word boundaries; LUHN_SUM_SQL itself is backslash-free
    d = df.withColumn(
        "_cands",
        F.regexp_extract_all(F.col(text_col), F.lit(CC_CANDIDATE_RE), F.lit(0)),
    )
    d = d.withColumn(
        "_cc",
        F.expr(
            "transform(_cands, s -> named_struct('s', s, 'ok', "
            f"{LUHN_SUM_SQL} % 10 = 0))"
        ),
    )
    valid = F.transform(
        F.filter(F.col("_cc"), lambda c: c["ok"]), lambda c: c["s"]
    )
    d = d.withColumn("_valid", valid)
    masked = F.aggregate(
        F.array_sort(F.array_distinct(F.col("_valid"))),
        F.col(text_col),
        lambda acc, s: F.replace(acc, s, F.lit(CC_TOKEN)),
    )
    return d.select(
        F.col("doc_id"),
        F.size("_cands").cast("long").alias("n_cc_candidates"),
        F.size("_valid").cast("long").alias("n_cc_valid"),
        F.md5(F.array_join(F.array_sort(F.col("_valid")), "|")).alias(
            "cc_valid_md5"
        ),
        masked.alias("cc_masked"),
    )
