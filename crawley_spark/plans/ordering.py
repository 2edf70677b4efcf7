"""Deterministic global sequence assignment.

The engine's crawl-order parity (SURVEY.md §3.4) hinges on materializing an
explicit per-run FIFO index — never on partition order. A naive
``row_number() OVER (ORDER BY ...)`` funnels the whole dataset through one
partition; ``assign_order_index`` instead:

1. range-partitions + sorts by the order key (parallel sort),
2. counts rows per (partition, run) — one light job over the persisted input,
3. cumulative-sums the counts on the driver (#partitions entries),
4. adds partition-local row_numbers to the per-partition offsets.

This keeps the sort fully parallel and the driver state at O(#partitions),
which survives a 1000-executor 10^10-row frontier; the reference's pending
counter (crawler.go:119-135) has no distributed equivalent, this replaces it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_order_index(
    df: DataFrame,
    order_cols: list,
    out_col: str,
    offsets: dict,
    run_col: str = "run_id",
):
    """Add ``out_col`` = per-run 0-based dense index following ``order_cols``,
    starting at ``offsets[run_id]`` (missing run → 0).

    Returns ``(indexed_df, per_run_counts)`` where per_run_counts is
    ``{run_id: rows_indexed}`` (the caller advances its offsets with it).

    ``df`` should be persisted by the caller (two jobs read it).
    """
    spark = df.sparkSession
    n = max(2, int(spark.conf.get("spark.sql.shuffle.partitions", "32")))
    keys = [run_col] + list(order_cols)
    ranged = (
        df.repartitionByRange(n, *[F.col(c) for c in keys])
        .sortWithinPartitions(*keys)
        .withColumn("_pid", F.spark_partition_id())
    )
    # materialize once: the counts job and the index job must see identical
    # partition boundaries (range sampling re-runs per job otherwise)
    ranged = ranged.localCheckpoint(eager=False)
    counts = ranged.groupBy("_pid", run_col).count().collect()
    # cumulative offsets per (pid, run): partitions are range-ordered on
    # (run, order), so within a run ascending pid == ascending order key
    per_run: dict = {}
    for row in sorted(counts, key=lambda r: r["_pid"]):
        run = row[run_col]
        base = per_run.setdefault(run, {"next": offsets.get(run, 0), "by_pid": {}})
        base["by_pid"][row["_pid"]] = base["next"]
        base["next"] += row["count"]
    # build a flat (pid, run) -> offset literal map
    run_counts = {run: info["next"] - offsets.get(run, 0) for run, info in per_run.items()}
    entries = []
    for run, info in per_run.items():
        for pid, off in info["by_pid"].items():
            entries.append(((pid, run), off))
    if not entries:
        return ranged.withColumn(out_col, F.lit(0).cast("long")).drop("_pid"), run_counts
    map_args = []
    for (pid, run), off in entries:
        map_args.append(F.concat_ws("\x00", F.lit(str(pid)), F.lit(run)))
        map_args.append(F.lit(off))
    offset_map = F.create_map(*map_args)
    w = Window.partitionBy("_pid", run_col).orderBy(*[F.col(c) for c in order_cols])
    out = ranged.withColumn(
        out_col,
        (
            F.element_at(offset_map, F.concat_ws("\x00", F.col("_pid").cast("string"), F.col(run_col)))
            + F.row_number().over(w)
            - 1
        ).cast("long"),
    ).drop("_pid")
    return out, run_counts


def advance_offsets(offsets: dict, run_counts: dict) -> dict:
    """Advance per-run offsets by the counts returned from assign_order_index."""
    out = dict(offsets)
    for run, cnt in run_counts.items():
        out[run] = out.get(run, 0) + cnt
    return out
