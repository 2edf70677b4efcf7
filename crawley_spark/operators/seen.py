"""Seen-set operators (D1/D2): in-wave first-occurrence dedup + cross-
iteration anti-join against the checkpointed seen table.

The reference gates everything on a single insert-if-absent
(crawler.go:127); distributed equivalents:

* D2 (in-wave): window first-occurrence in canonical (parent_rank, ord)
  order — the arrival order of the workers=1 reference loop.
* D1 (cross-wave): left-anti join on (run_id, url_key) against the seen
  table. The seen table is written bucket-partitioned on
  pmod(xxhash64(url_key), SEEN_BUCKETS) (sources/state.py) so a future
  bucketed-table / Bloom-shard prefilter can skip most of the shuffle; at
  10^10 keys the anti-join shuffles only the candidate side when the seen
  side is storage-bucketed (Iceberg bucket(N, url_key) hidden partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def first_occurrence(candidates: DataFrame) -> DataFrame:
    """Keep the canonical-order first occurrence per (run_id, url_key)."""
    w = Window.partitionBy("run_id", "url_key").orderBy("parent_rank", "ord")
    return (
        candidates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def anti_join_seen(candidates: DataFrame, seen: DataFrame) -> DataFrame:
    """Drop candidates whose (run_id, url_key) is already in the seen table."""
    return candidates.join(
        seen.select("run_id", "url_key"), on=["run_id", "url_key"], how="left_anti"
    )
