"""Training-mixture construction operators (beyond-reference, late r05):
deterministic stratified sampling and token-budget shard packing — the two
steps between "filtered corpus" and "training shards" in a published
LLM-data pipeline (public knowledge: hash-based deterministic sampling and
fixed-token-budget packing are standard practice in open corpus builds).

Both are exact-integer and therefore DuckDB-oracle-checkable:

* sampling keys on the low-60-bit md5 (``dedup.md5_low60`` — DuckDB's
  ``md5_number % 2^60``), so the SELECTION ITSELF is cross-engine
  reproducible, not just its size;
* packing computes the global running token sum with a two-pass
  driver-offset prefix sum (the plans/ordering.py pattern), never a
  single-partition global window sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import md5_low60

SAMPLE_DEN = 1_000_000  # rate granularity: 1e-6


def stratified_sample(
    df: DataFrame,
    rates: dict | None = None,
    default_rate: float = 1.0,
    strat_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic hash-based stratified sampling: each row is assigned
    ``sample_bucket`` = md5_low60(salt || key) % SAMPLE_DEN — uniform on
    [0, SAMPLE_DEN) and a pure function of (salt, key) — and is ``sampled``
    iff bucket < rate(stratum) · SAMPLE_DEN (rates rounded to 1e-6; the
    comparison is integer). Properties the RNG-based ``df.sample`` cannot
    give: reruns and resumes select the IDENTICAL rows, per-stratum rates
    are exact policy knobs (training-mixture weights), disjoint salts draw
    independent samples, and the DuckDB oracle reproduces the exact
    selection (md5_number % 2^60 parity). One scan, zero shuffle."""
    rates = rates or {}
    bucket = md5_low60(F.concat(F.lit(salt), F.col(key_col).cast("string"))) % SAMPLE_DEN
    thresh = F.lit(int(round(default_rate * SAMPLE_DEN)))
    for stratum, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(strat_col) == stratum, F.lit(int(round(rate * SAMPLE_DEN)))
        ).otherwise(thresh)
    return df.withColumn("sample_bucket", bucket.cast("long")).withColumn(
        "sampled", F.col("sample_bucket") < thresh
    )


def pack_token_shards(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """Assign documents, in deterministic ``order_col`` order, to
    contiguous shards of ~``budget`` tokens: ``shard`` =
    floor(exclusive-prefix-sum(tokens) / budget). A doc whose tokens cross
    a boundary belongs to the shard its FIRST token falls in (the standard
    greedy sequential packing, stated so the oracle can reproduce it).

    Scale shape — the global running sum WITHOUT a global sort: rows are
    bucketed by the driver-known ``order_col`` span (one min/max agg);
    per-bucket token totals (one tiny map-side-combined agg) come back to
    the driver, whose exclusive offsets broadcast back as a literal CASE;
    the within-bucket prefix is a window over (bucket, order) — bounded
    partitions, one shuffle on the bucket key. The single-partition
    global-window sort Spark would otherwise use (WindowExec with no
    PARTITION BY) never appears; pinned by a plan test.

    Size ``n_buckets`` so a bucket's rows fit one window task (~1M rows /
    bucket is comfortable): the default 1024 covers ~1B docs; at larger
    corpora raise it — empty buckets are free (only non-empty totals come
    back to the driver) and past 64 non-empty buckets the offsets ship as
    a broadcast join instead of a CASE chain, so plan size stays flat."""
    stats = df.agg(
        F.min(order_col).alias("lo"), F.max(order_col).alias("hi")
    ).collect()[0]
    lo, hi = stats["lo"], stats["hi"]
    if lo is None:
        return df.select(
            F.col(order_col),
            F.col(token_col).cast("long").alias(token_col),
            F.lit(0).cast("long").alias("prefix_tokens"),
            F.lit(0).cast("long").alias("shard"),
        ).limit(0)
    span = int(hi) - int(lo) + 1
    width = max(1, -(-span // n_buckets))  # ceil
    # integer `div`, not `/`: double division loses exactness past 2^53
    # (billions of docs x big keys at 100 TB)
    b = F.expr(f"(CAST({order_col} AS BIGINT) - {int(lo)}) div {width}")
    rows = df.select(
        F.col(order_col), F.col(token_col).cast("long").alias(token_col), b.alias("_b")
    )
    totals = {
        r["_b"]: r["t"]
        for r in rows.groupBy("_b").agg(F.sum(token_col).alias("t")).collect()
    }
    offsets, acc = {}, 0
    for bk in sorted(totals):
        offsets[bk] = acc
        acc += totals[bk]
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    if len(offsets) <= 64:
        # small bucket counts inline as a CASE chain (no join stage)
        off = F.lit(0).cast("long")
        for bk, v in sorted(offsets.items()):
            off = F.when(F.col("_b") == bk, F.lit(int(v)).cast("long")).otherwise(off)
    else:
        # thousands of buckets (the raised-n_buckets 100 TB shape) would
        # bloat the expression tree — ship offsets as a broadcast join
        spark = df.sparkSession
        off_df = spark.createDataFrame(
            [(int(k), int(v)) for k, v in sorted(offsets.items())], "_b long, _off long"
        )
        rows = rows.join(broadcast(off_df), "_b")
        off = F.col("_off")

    w = (
        Window.partitionBy("_b")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    inclusive = F.sum(token_col).over(w)
    prefix_col = off + inclusive - F.col(token_col)
    return rows.select(
        order_col,
        token_col,
        prefix_col.alias("prefix_tokens"),
    ).select(
        order_col,
        token_col,
        "prefix_tokens",
        # integer div (exact at any corpus size; prefix sums are BIGINTs)
        F.expr(f"prefix_tokens div {int(budget)}").cast("long").alias("shard"),
    )


def assign_splits(
    df: DataFrame,
    splits: dict | None = None,
    key_col: str = "doc_id",
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic disjoint-and-exhaustive dataset split assignment
    (train/val/test): each row gets ``split_bucket`` =
    md5_low60(salt || key) % SAMPLE_DEN and ``split`` = the name whose
    cumulative integer range [lo, hi) contains the bucket, with weights
    rounded to 1e-6 and the FINAL split (in the dict's order) absorbing
    the rounding remainder so the ranges exactly tile [0, SAMPLE_DEN).

    Properties an RNG split cannot give: every rerun/resume assigns the
    IDENTICAL rows (membership is a pure function of (salt, key), so a
    doc never migrates between train and test across corpus rebuilds —
    the leakage guarantee); ranges are disjoint and exhaustive BY
    CONSTRUCTION (one bucket, consecutive thresholds), not by sampling
    three times and hoping; disjoint salts give independent splits; and
    a DuckDB oracle reproduces the exact assignment via
    md5_number % 2^60. One scan, zero shuffle, pure column expressions.

    ``splits``: ordered {name: weight}, weights summing to ~1 (validated
    to 1e-6·len tolerance). Default 98/1/1 train/val/test.
    """
    if splits is None:
        splits = {"train": 0.98, "val": 0.01, "test": 0.01}
    if len(splits) < 1:
        raise ValueError("assign_splits: need at least one split")
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-6 * max(1, len(splits)):
        raise ValueError(
            f"assign_splits: weights must sum to 1 (got {total})"
        )
    names = list(splits)
    # cumulative integer thresholds; the last is pinned to SAMPLE_DEN so
    # rounding can never leave a bucket unassigned or double-assigned
    cum, thresholds = 0.0, []
    for name in names:
        cum += splits[name]
        thresholds.append(int(round(cum * SAMPLE_DEN)))
    thresholds[-1] = SAMPLE_DEN
    bucket = (
        md5_low60(F.concat(F.lit(salt), F.col(key_col).cast("string")))
        % SAMPLE_DEN
    )
    out = df.withColumn("split_bucket", bucket.cast("long"))
    # chained when(): the FIRST threshold exceeding the bucket wins, which
    # is exactly [lo, hi) range containment under cumulative bounds; the
    # last split is the otherwise() branch (its threshold is SAMPLE_DEN,
    # so the chain is exhaustive by construction)
    expr = F.when(F.col("split_bucket") < thresholds[0], F.lit(names[0]))
    for name, hi in zip(names[1:-1], thresholds[1:-1]):
        expr = expr.when(F.col("split_bucket") < hi, F.lit(name))
    return out.withColumn("split", expr.otherwise(F.lit(names[-1])))
