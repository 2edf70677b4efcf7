"""Content-type sniffing from magic bytes — the dispatch step a real
crawler runs when servers lie about Content-Type (the reference trusts the
header, kernels/extract.py dispatch; production crawls sniff, cf. the
WHATWG MIME-sniffing rules these published signatures come from).

Pure zero-shuffle JVM projection: the detector compares the hex encoding
of the payload's first bytes against the signature table — ``hex()`` +
``startswith``/regexp on the hex TEXT, which Spark and DuckDB evaluate
identically (no binary collation or charset-decode hazards; the HTML rule
is a hex-domain regex ``^(09|0A|0C|0D|20)*3C`` — optional ASCII whitespace
then '<' — so no byte needs decoding). First match in table order wins;
unmatched payloads are ``application/octet-stream``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (mime, hex-prefix signature) — published magic numbers, first match wins.
# RIFF containers carry the format tag at byte offset 8 (after the chunk
# size), expressed as a hex-domain regex.
SNIFF_PREFIXES = [
    ("image/png", "89504E470D0A1A0A"),
    ("image/jpeg", "FFD8FF"),
    ("image/gif", "474946383761"),  # GIF87a
    ("image/gif", "474946383961"),  # GIF89a
    ("application/pdf", "255044462D"),  # %PDF-
    ("application/gzip", "1F8B"),
    ("application/zip", "504B0304"),
    ("image/bmp", "424D"),
]
SNIFF_RIFF = [  # ^52494646 (RIFF) + 8 hex chars (size) + format tag
    ("audio/wav", "57415645"),  # WAVE
    ("video/x-msvideo", "41564920"),  # 'AVI '
]
SNIFF_HTML_RE = "^(09|0A|0C|0D|20)*3C"  # optional ASCII whitespace then '<'
SNIFF_HEAD_BYTES = 64
SNIFF_DEFAULT = "application/octet-stream"


def sniff_mime(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Input + ``sniffed_mime`` from the payload's leading bytes. Zero
    shuffle; the whole decision runs on ``hex(substring(payload, 1, 64))``
    so every comparison is plain ASCII text both here and in any SQL
    replay."""
    h = F.hex(F.substring(F.col(payload_col).cast("binary"), 1, SNIFF_HEAD_BYTES))
    expr = None
    cases = []
    for mime, prefix in SNIFF_PREFIXES:
        cases.append((h.startswith(prefix), mime))
    for mime, tag in SNIFF_RIFF:
        cases.append((h.rlike(f"^52494646.{{8}}{tag}"), mime))
    cases.append((h.rlike(SNIFF_HTML_RE), "text/html"))
    for cond, mime in cases:
        expr = F.when(cond, mime) if expr is None else expr.when(cond, mime)
    return df.withColumn("sniffed_mime", expr.otherwise(F.lit(SNIFF_DEFAULT)))


def sniff_case_sql(hex_expr: str) -> str:
    """The identical decision as a SQL CASE over a hex-text expression —
    GENERATED from the same signature table (the lang_id oracle pattern:
    the two sides cannot desynchronize, while the SQL engine still
    recomputes hex/regex independently)."""
    whens = []
    for mime, prefix in SNIFF_PREFIXES:
        whens.append(f"WHEN starts_with({hex_expr}, '{prefix}') THEN '{mime}'")
    for mime, tag in SNIFF_RIFF:
        whens.append(
            f"WHEN regexp_matches({hex_expr}, '^52494646.{{{8}}}{tag}') "
            f"THEN '{mime}'"
        )
    whens.append(f"WHEN regexp_matches({hex_expr}, '{SNIFF_HTML_RE}') THEN 'text/html'")
    return "CASE " + " ".join(whens) + f" ELSE '{SNIFF_DEFAULT}' END"
