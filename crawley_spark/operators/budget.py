"""Host-level crawl-budget allocation (beyond-reference, closing r05).

The frontier-scheduler step between prioritization (linkgraph.
prioritize_frontier ranks WHICH hosts matter) and the fetch wave: given a
per-host frontier count and ONE global fetch budget for the wave, decide
HOW MANY URLs each host may fetch. The reference (single-process
s0rg/crawley) never needs this — its bounded channel IS the budget — but a
distributed crawler fetching 10^8 URLs/wave across 10^7 hosts must split
the budget fairly and deterministically so every executor agrees on the
quota without coordination.

Allocation rule: the largest-remainder (Hamilton) method — the published
apportionment scheme (public knowledge; used for seat apportionment and
proportional quota splitting) — in exact integer arithmetic:

* ``base_h  = (budget * count_h) div total``
* ``rem_h   = (budget * count_h) mod total``
* the ``K = budget - sum(base_h)`` leftover slots go to the K hosts with
  the largest remainder, ties broken by host name ascending.

Every quantity is a BIGINT (products run through DECIMAL(38,0) so
budget * count never overflows at any realistic scale), so a DuckDB
oracle reproduces the allocation hash-exactly via ROW_NUMBER() — and
``sum(quota) == min(budget, total)`` by construction.

Scale shape — top-K WITHOUT a global sort (the pack_token_shards two-pass
pattern applied to selection): remainders live in [0, total), so bucket
them by value range, bring per-bucket COUNTS (not rows) to the driver,
walk buckets from the top until K is covered — hosts in strictly-higher
buckets take +1 with no sort at all, and only the single boundary bucket
is window-ranked (ORDER BY rem DESC, host ASC), one bounded partition.
Remainder ties cannot straddle buckets (equal rem ⇒ equal bucket), so
bucket-local ranking equals the global rank. Degenerate case: if every
host carries the SAME remainder (all-equal counts), the boundary bucket is
the whole host table and its rank window is one task — documented bound;
a recursive re-split of the boundary bucket would remove it but no real
frontier is remainder-uniform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def allocate_crawl_budget(
    hosts: DataFrame,
    budget: int,
    count_col: str = "n_frontier",
    host_col: str = "host",
    n_buckets: int = 1024,
) -> DataFrame:
    """Largest-remainder allocation of ``budget`` fetch slots across hosts.

    ``hosts``: one row per host with a frontier count (the output of a
    map-side-combined groupBy on the frontier — counts only, never URLs).
    Returns (host, count, quota) with ``sum(quota) == min(budget, total)``.

    Driver traffic is bounded: two scalars (total, sum of bases) plus one
    count per NON-EMPTY remainder bucket (≤ n_buckets longs).
    """
    if budget < 0:
        raise ValueError(f"allocate_crawl_budget: budget must be >= 0 (got {budget})")
    cnt = F.col(count_col).cast("long")
    base_cols = [F.col(host_col), cnt.alias(count_col)]
    total_row = hosts.agg(F.sum(cnt).alias("t")).collect()[0]
    total = int(total_row["t"] or 0)
    if total == 0 or budget == 0:
        return hosts.select(*base_cols, F.lit(0).cast("long").alias("quota"))
    if budget >= total:
        # every host fully served; no apportionment needed
        return hosts.select(*base_cols, cnt.alias("quota"))
    # DECIMAL(38,0) product: budget and count are both < 2^63 but their
    # product need not be; div/% on decimals stay exact integers
    prod = f"CAST({budget} AS DECIMAL(38,0)) * CAST({count_col} AS DECIMAL(38,0))"
    t = hosts.select(
        *base_cols,
        F.expr(f"CAST(({prod}) div {total} AS BIGINT)").alias("_base"),
        F.expr(f"CAST(({prod}) % {total} AS BIGINT)").alias("_rem"),
    )
    sum_base = int(t.agg(F.sum("_base").alias("s")).collect()[0]["s"])
    k = budget - sum_base
    if k == 0:
        return t.select(*base_cols, F.col("_base").alias("quota"))
    # --- two-pass top-K by (_rem DESC, host ASC): bucket by remainder range,
    # counts to the driver, rank only the boundary bucket -----------------
    width = max(1, -(-total // n_buckets))  # ceil(total / n_buckets)
    t = t.withColumn("_bk", F.expr(f"_rem div {width}"))
    bucket_counts = {
        int(r["_bk"]): int(r["n"])
        for r in t.groupBy("_bk").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    taken = 0
    full_min_bk = None  # lowest bucket whose hosts ALL get +1
    boundary_bk = None
    boundary_slots = 0
    for bk in sorted(bucket_counts, reverse=True):
        n = bucket_counts[bk]
        if taken + n <= k:
            taken += n
            full_min_bk = bk
            if taken == k:
                break
        else:
            boundary_bk = bk
            boundary_slots = k - taken
            break
    non_boundary_topup = (
        (F.col("_bk") >= full_min_bk) if full_min_bk is not None else F.lit(False)
    )

    def _with_quota(df: DataFrame, topup) -> DataFrame:
        return df.select(
            *base_cols,
            (F.col("_base") + F.when(topup, F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias("quota"),
        )

    if boundary_bk is None:
        return _with_quota(t, non_boundary_topup)
    # only the boundary bucket is ever sorted: filter it out, rank it in its
    # own (single, bounded) window partition, union the unsorted rest back
    rest = _with_quota(t.filter(F.col("_bk") != boundary_bk), non_boundary_topup)
    w = Window.partitionBy("_bk").orderBy(F.col("_rem").desc(), F.col(host_col).asc())
    boundary = t.filter(F.col("_bk") == boundary_bk).withColumn(
        "_rnk", F.row_number().over(w)
    )
    return rest.unionByName(_with_quota(boundary, F.col("_rnk") <= boundary_slots))
