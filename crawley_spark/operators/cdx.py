"""CDX index construction — the URL-index artifact Common Crawl actually
publishes next to its WARCs (public formats: the CDX(J) line format and the
SURT canonical key, as documented by the IIPC / OpenWayback / pywb
projects; no code from any of them is used here).

Two pieces:

* :func:`surt_key` — the Sort-friendly URI Reordering Transform, as column
  expressions: ``http://www.Example.com/Path?b=2&a=1`` →
  ``com,example)/path?a=1&b=2``. Documented subset (matching the common
  canonicalization): scheme dropped, host lowercased with one leading
  ``www.`` stripped and its labels reversed comma-joined, path lowercased
  (empty → ``/``), query lowercased with params bytewise-sorted and
  ``&``-rejoined. Ports never appear (``parse_url HOST`` excludes them);
  URLs are assumed ASCII (true post percent-encoding). Pure JVM — zero
  shuffle, and every step is in the Java∩DuckDB-identical subset so an
  oracle can rebuild the key independently.

* :func:`build_cdx_index` — the *sorted, range-sharded* index layout that
  makes the artifact binary-searchable. The classic build is a global
  terasort; a ``repartitionByRange`` would do it but samples its
  boundaries, so two runs shard differently and no oracle can replay it.
  Instead the boundaries are EXACT order statistics of an integer proxy
  key (the first 7 bytes of the SURT, big-endian — always positive in a
  BIGINT) computed by :func:`sketch.exact_quantiles` — the two-pass
  bucketed selection with NO global sort — then broadcast as literals, so
  shard assignment is a ZERO-SHUFFLE projection and the layout is
  bit-reproducible. Proxy-order is a prefix-coarsening of SURT order and
  proxy-ties cannot straddle shards, so (shard asc, line asc) is a true
  global SURT order: the binary-search property holds. At 100 TB: two
  map-side-combined scans for the boundaries (driver traffic = one count
  per value bucket), one projection, then a ``partitionBy(shard)`` text
  write — per-shard files sorted at write time, never collected.

CDX line shape used here (CDX-11 subset, space-joined):
``<surt> <ts14> <url> <digest>`` — lexicographic line order within a shard
is the within-shard order both engines replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_SHARDS_DEFAULT = 8
PROXY_BYTES = 7  # big-endian ascii polynomial fits a signed 64-bit


def surt_key(url_col) -> "F.Column":
    """SURT canonical key of an absolute http(s) URL column (see module
    docstring for the documented subset)."""
    url = F.col(url_col) if isinstance(url_col, str) else url_col
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    host = F.regexp_replace(host, r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.lower(F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("")))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.lower(F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit("")))
    qsorted = F.array_join(
        F.array_sort(F.filter(F.split(q, "&"), lambda x: x != "")), "&"
    )
    return F.concat(
        rev,
        F.lit(")"),
        path,
        F.when(qsorted == "", F.lit("")).otherwise(F.concat(F.lit("?"), qsorted)),
    )


def surt_proxy_long(surt_col) -> "F.Column":
    """First ``PROXY_BYTES`` bytes of the (ASCII) SURT as one big-endian
    BIGINT — the integer range-partition key. Written as an explicit
    polynomial over ``ascii(substring(...))`` terms (out-of-range substring
    → '' → ascii 0) so a SQL oracle states the identical arithmetic."""
    s = F.col(surt_col) if isinstance(surt_col, str) else surt_col
    term = None
    for i in range(1, PROXY_BYTES + 1):
        t = F.ascii(F.substring(s, i, 1)).cast("long") * F.lit(
            256 ** (PROXY_BYTES - i)
        ).cast("long")
        term = t if term is None else term + t
    return term


def build_cdx_index(
    records: DataFrame,
    n_shards: int = N_SHARDS_DEFAULT,
    url_col: str = "url",
    ts_col: str = "ts",
    digest_col: str = "digest",
) -> DataFrame:
    """Assign every record its range shard and CDX line. Input: one row per
    capture with (url, ts14 string, digest). Output: input + (surt, line,
    shard) — ``partitionBy("shard")`` + sortWithinPartitions("line") is the
    artifact write; aggregations over (shard) are the index stats.

    Boundaries are the exact ``i·1000 div n_shards`` per-mille order
    statistics of the proxy key (i = 1..n_shards-1); ``shard =
    Σ [proxy > b_i]`` over the broadcast literals — ties land left, every
    equal proxy lands together. Deterministic under any partitioning."""
    if n_shards < 1:
        raise ValueError(f"build_cdx_index: n_shards must be >= 1 (got {n_shards})")
    from .sketch import exact_quantiles

    with_key = records.withColumn("surt", surt_key(url_col)).withColumn(
        "_proxy", surt_proxy_long("surt")
    )
    line = F.concat_ws(
        " ", F.col("surt"), F.col(ts_col), F.col(url_col), F.col(digest_col)
    )
    with_key = with_key.withColumn("line", line)
    if n_shards == 1:
        return with_key.withColumn("shard", F.lit(0).cast("long")).drop("_proxy")
    probs = sorted({i * 1000 // n_shards for i in range(1, n_shards)})
    bounds = sorted(
        int(r["value"])
        for r in exact_quantiles(with_key, "_proxy", probs).collect()
    )
    shard = F.lit(0).cast("long")
    for b in bounds:
        shard = shard + F.when(F.col("_proxy") > b, 1).otherwise(0)
    return with_key.withColumn("shard", shard.cast("long")).drop("_proxy")
