"""Crawler-trap detection — the frontier-hygiene pass a web-scale crawl
runs between link extraction and scheduling. Heuristics are the published
Heritrix decide-rules (public knowledge: Heritrix's
PathologicalPathDecideRule — the same path segment repeated consecutively;
TooManyPathSegmentsDecideRule — pathological depth) plus the standard
query-parameter-explosion check (calendar/faceted-search traps emit
unbounded distinct URLs that differ only in parameters).

Per-URL signals, all exact integers from pure JVM column expressions:

* ``max_seg_run`` — longest run of CONSECUTIVE identical path segments
  (``/cal/cal/cal/`` → 3). Computed with an ``aggregate`` HOF carrying a
  (current_run, best_run) struct — no regex backreference, which Java
  supports but RE2 (DuckDB) does not, so the oracle can recompute it
  independently with window functions instead.
* ``n_segments`` — path depth (non-empty segments).
* ``n_params`` — query parameters (``&``-separated, after the first ``?``).
* ``is_trap`` — any signal over its threshold.

``host_trap_stats`` rolls the flags up per host (n_urls, n_traps,
trap_ppm) — the input to a scheduler cap on trap-heavy hosts, the same
consumption shape as linkgraph.prioritize_frontier's rank join.

Scale shape: the per-URL pass is a ZERO-SHUFFLE projection (string split +
bounded HOF over the segment array — path segments, not corpus text); the
host rollup is one map-side-combined count shuffle keyed on host. Nothing
driver-side, no Python.

Thresholds follow Heritrix defaults where they exist (2 consecutive
repeats, 20 segments) and 10 parameters for the explosion check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_SEG_REPEATS = 2   # Heritrix PathologicalPathDecideRule default
MAX_PATH_SEGMENTS = 20  # Heritrix TooManyPathSegmentsDecideRule default
MAX_QUERY_PARAMS = 10


def _path_and_query(url):
    """(path, query) from an absolute http(s) URL, as column expressions:
    path = after the host, before '?' or '#'; query = between '?' and '#'
    (empty string when absent). parse_url is Java-side; its PATH/QUERY
    semantics are mirrored in the oracle with string arithmetic."""
    return F.parse_url(url, F.lit("PATH")), F.parse_url(url, F.lit("QUERY"))


def url_trap_signals(
    df: DataFrame,
    url_col: str = "url",
    max_seg_repeats: int = MAX_SEG_REPEATS,
    max_path_segments: int = MAX_PATH_SEGMENTS,
    max_query_params: int = MAX_QUERY_PARAMS,
) -> DataFrame:
    """Input columns + (host, max_seg_run, n_segments, n_params, is_trap).
    Zero shuffle (plan-test-pinned)."""
    if min(max_seg_repeats, max_path_segments, max_query_params) < 1:
        raise ValueError("thresholds must be >= 1")
    url = F.col(url_col)
    path, query = _path_and_query(url)
    segs = F.filter(F.split(F.coalesce(path, F.lit("")), "/"), lambda s: s != "")
    # longest run of consecutive identical segments; empty path → 0
    run = F.aggregate(
        segs,
        F.struct(
            F.lit(0).alias("cur"),
            F.lit(0).alias("best"),
            F.lit("").alias("prev"),  # empty segs filtered out: safe sentinel
        ),
        lambda acc, s: F.struct(
            F.when(s == acc["prev"], acc["cur"] + 1).otherwise(F.lit(1)).alias("cur"),
            F.greatest(
                acc["best"],
                F.when(s == acc["prev"], acc["cur"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
            s.alias("prev"),
        ),
        lambda acc: acc["best"],
    )
    nseg = F.size(segs)
    q = F.coalesce(query, F.lit(""))
    npar = F.when(q == "", F.lit(0)).otherwise(F.size(F.split(q, "&")))
    out = df.withColumn("host", F.parse_url(url, F.lit("HOST")))
    out = (
        out.withColumn("max_seg_run", run.cast("long"))
        .withColumn("n_segments", nseg.cast("long"))
        .withColumn("n_params", npar.cast("long"))
    )
    return out.withColumn(
        "is_trap",
        (F.col("max_seg_run") > max_seg_repeats)
        | (F.col("n_segments") > max_path_segments)
        | (F.col("n_params") > max_query_params),
    )


def host_trap_stats(signals: DataFrame) -> DataFrame:
    """(host, n_urls, n_traps, trap_ppm) from :func:`url_trap_signals`
    output — one map-side-combined shuffle on host; trap_ppm is exact
    integer (Spark div ≡ DuckDB //)."""
    return (
        signals.groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.sum(F.when(F.col("is_trap"), 1).otherwise(0)).cast("long").alias("n_traps"),
        )
        .withColumn("trap_ppm", F.expr("(n_traps * 1000000) div n_urls").cast("long"))
    )
