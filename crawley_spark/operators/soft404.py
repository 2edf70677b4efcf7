"""Soft-404 detection — the dead-link hygiene pass of a production crawl.

A "soft 404" is an error page served with HTTP 200: the server lies about
the status, so recrawl scheduling, link-graph signals, and training-data
extraction all ingest junk unless the CONTENT is checked (the published
study of the phenomenon is Bar-Yossef, Broder, Kumar & Tomkins, "Sic
Transit Gloria Telae", WWW 2004; archive/Heritrix tooling uses the
content-marker heuristic implemented here). The reference never sees
status lies (it trusts the transport, crawler.go), so this stage is
beyond-reference crawl hygiene.

Classifier: a 200-status page is a soft 404 when its lowercased text
contains a marker phrase from the table below AND the page is short
(real content that merely *mentions* "not found" is long). Both signals
are exact integers — marker mass via the length/replace occurrence trick,
word count via space-split — so the DuckDB oracle recomputes the whole
decision hash-exactly; the marker CASE terms are GENERATED from the same
table (the lang_id pattern).

Scale shape (100 TB): the per-URL pass is a pure zero-shuffle JVM
projection; :func:`host_soft404_stats` is one map-side-combined rollup on
host with exact-integer ppm — the same consumption shape the scheduler
already uses for trap and rank signals (a host serving mostly soft 404s
gets its crawl budget cut).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import occurrences, token_count

# Marker phrases (lowercase). Matched as literal substrings of the
# lowercased text — table order is irrelevant (counts sum).
SOFT404_MARKERS = [
    "page not found",
    "404 not found",
    "file not found",
    "does not exist",
    "no longer available",
    "cannot be found",
    "error 404",
]
# A 200 page with a marker still passes if it is long: genuine articles
# mention these phrases. The cut is a word-count knob, not a float score.
SOFT404_MAX_WORDS = 120


def soft404_signals(
    df: DataFrame,
    text_col: str = "text",
    status_col: str = "status",
    id_col: str = "doc_id",
    max_words: int = SOFT404_MAX_WORDS,
) -> DataFrame:
    """Per-URL soft-404 signals: (id passthrough cols, marker_hits,
    n_words, fetch_class).

    ``fetch_class`` is 'hard404' (transport said >= 400 — trustworthy),
    'soft404' (200 + marker + short), or 'ok'. ``marker_hits`` is the
    total marker occurrence count (BIGINT); NULL text counts as empty.
    Zero shuffle."""
    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    hits = F.lit(0).cast("long")
    for m in SOFT404_MARKERS:
        hits = hits + occurrences(t, m)
    out = df.select(
        "*",
        hits.alias("marker_hits"),
        token_count(F.coalesce(F.col(text_col), F.lit(""))).alias("n_words"),
    )
    cls = (
        F.when(F.col(status_col) >= 400, F.lit("hard404"))
        .when(
            (F.col("marker_hits") > 0) & (F.col("n_words") <= F.lit(int(max_words))),
            F.lit("soft404"),
        )
        .otherwise(F.lit("ok"))
    )
    return out.withColumn("fetch_class", cls)


def host_soft404_stats(signals: DataFrame, host_col: str = "host") -> DataFrame:
    """(host, n_urls, n_soft404, soft404_ppm) from :func:`soft404_signals`
    output — one map-side-combined shuffle on host; ppm is exact integer
    (Spark div ≡ DuckDB //). The scheduler-side input for cutting crawl
    budget on hosts that serve error pages as 200s."""
    return (
        signals.groupBy(host_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.sum(F.when(F.col("fetch_class") == "soft404", 1).otherwise(0))
            .cast("long")
            .alias("n_soft404"),
        )
        .withColumn(
            "soft404_ppm", F.expr("(n_soft404 * 1000000) div n_urls").cast("long")
        )
    )


def soft404_marker_sql(text_expr: str) -> str:
    """DuckDB marker-mass expression GENERATED from the same table."""
    terms = " + ".join(
        f"(length({text_expr}) - length(replace({text_expr}, '{m}', ''))) / {len(m)}"
        for m in SOFT404_MARKERS
    )
    return f"CAST({terms} AS BIGINT)"
