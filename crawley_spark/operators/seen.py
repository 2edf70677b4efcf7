"""Seen-set operators (D1/D2): in-wave first-occurrence dedup + cross-
iteration anti-join against the checkpointed seen table.

The reference gates everything on a single insert-if-absent
(crawler.go:127); distributed equivalents:

* D2 (in-wave): window first-occurrence in canonical (parent_rank, ord)
  order — the arrival order of the workers=1 reference loop.
* D1 (cross-wave): left-anti join on (run_id, url_key) against the seen
  table. The engine (engine.py step 4) never shuffles the seen side in the
  steady state: the compacted seen snapshot is stored bucket-partitioned on
  pmod(xxhash64(url_key), SEEN_BUCKETS) (sources/state.py), the post-Bloom
  "maybe" key-set is broadcast into a left-semi probe of only the touched
  buckets, and the ≤|maybe| hits are broadcast back for this exact
  anti-join — per-iteration cost O(Δfrontier × shard + recent deltas).
  The transitional huge-maybe corner falls back to a shuffle anti-join
  against the bucket-pruned read; on a real cluster that corner is where
  Iceberg's storage-partitioned join (bucket(N, url_key) both sides) or a
  Spark bucketed table would also eliminate the seen-side shuffle — the
  parquet-dir layout here is the sandbox stand-in for exactly that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def first_occurrence(candidates: DataFrame) -> DataFrame:
    """Keep the canonical-order first occurrence per (run_id, url_key).

    Implemented as ``min`` over the ``(parent_rank, ord, …)`` struct in a
    groupBy rather than a row_number window: a groupBy gets map-side partial
    aggregation (each shuffle partition pre-reduces its duplicates), so the
    shuffle carries ~unique keys instead of every raw occurrence — the same
    reason the extraction UDF pre-combines per partition. (parent_rank, ord)
    is unique per row, so the struct min picks exactly the window's winner,
    including its classification flags. ``dup_count`` (if present) is summed
    so raw-occurrence metrics survive the reduction."""
    keys = ("run_id", "url_key")
    has_dup = "dup_count" in candidates.columns
    rest = [
        c
        for c in candidates.columns
        if c not in keys and c not in ("parent_rank", "ord", "dup_count")
    ]
    ordered = ["parent_rank", "ord", *rest]
    aggs = [F.min(F.struct(*ordered)).alias("_first")]
    if has_dup:
        aggs.append(F.sum("dup_count").alias("dup_count"))
    out = candidates.groupBy(*keys).agg(*aggs)
    cols = [*keys, *[F.col(f"_first.{c}").alias(c) for c in ordered]]
    if has_dup:
        cols.append(F.col("dup_count"))
    return out.select(*cols)


def anti_join_seen(candidates: DataFrame, seen: DataFrame) -> DataFrame:
    """Drop candidates whose (run_id, url_key) is already in the seen table."""
    return candidates.join(
        seen.select("run_id", "url_key"), on=["run_id", "url_key"], how="left_anti"
    )
