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


def chunk_sequences(
    df: DataFrame,
    seq_len: int,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window token chunking: split each document's whitespace
    tokens (space-split, empties dropped — the exact ``textstats.
    token_count`` tokenizer) into training sequences of ``seq_len`` tokens
    starting every ``stride`` tokens (``stride == seq_len`` ⇒ disjoint
    chunks; ``stride < seq_len`` ⇒ the published overlapping-context
    windows). Chunk count per doc is the standard rule

        ``n_chunks = 1                         if n <= seq_len
                   = 1 + ceil((n-seq_len)/stride)  otherwise``

    (0 chunks for an empty doc), so every token is covered, the last chunk
    may be short, and no chunk is a suffix of its predecessor. All
    arithmetic is integer and the chunk text hash is md5 of the
    space-rejoined slice, so a DuckDB oracle (string_split / list_slice /
    array_to_string) reproduces every row hash-exactly.

    Scale shape: one scan, explode is map-side, ZERO shuffle — chunking is
    embarrassingly parallel per document. Pure JVM column expressions
    (split / sequence / slice / array_join); no Python.
    """
    if seq_len < 1:
        raise ValueError(f"chunk_sequences: seq_len must be >= 1 (got {seq_len})")
    stride = seq_len if stride is None else stride
    if not (1 <= stride <= seq_len):
        raise ValueError(
            f"chunk_sequences: need 1 <= stride <= seq_len (got stride={stride})"
        )
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
    n = F.size(toks).cast("long")
    # ceil((n - seq_len)/stride) in exact integers
    extra = F.expr(
        f"(size(filter(split({text_col}, ' '), x -> x != '')) - {seq_len}"
        f" + {stride} - 1) div {stride}"
    ).cast("long")
    n_chunks = F.when(n <= seq_len, F.lit(1).cast("long")).otherwise(1 + extra)
    base = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        n.alias("_n"),
        n_chunks.alias("_nc"),
    ).filter(F.col("_n") > 0)
    k = F.col("chunk_id")
    start = (k * stride).cast("long")
    chunk = F.slice(F.col("_toks"), (k * stride + 1).cast("int"), seq_len)
    return base.select(
        id_col,
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("_nc") - 1)).alias(
            "chunk_id"
        ),
        "_toks",
        "_n",
    ).select(
        id_col,
        k.cast("long").alias("chunk_id"),
        start.alias("start_tok"),
        F.least(F.lit(seq_len).cast("long"), F.col("_n") - start).alias("chunk_len"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


def training_order(
    df: DataFrame,
    n_shards: int = 1024,
    key_col: str = "doc_id",
    salt: str = "order-v1",
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets
    ``shard`` = md5_low60(salt || key) % n_shards and ``ord`` = its
    1-based rank within the shard by (hash-bucket, key). Reading shards
    0..n_shards-1 each in ``ord`` order visits the corpus in a fixed
    pseudo-random permutation — the standard deterministic alternative to
    an RNG shuffle for training-data orders: reruns and resumes produce
    the IDENTICAL order (restart mid-epoch at (shard, ord) exactly),
    disjoint salts give independent epoch permutations, and a DuckDB
    oracle reproduces the full permutation hash-exactly via
    md5_number % 2^60 + ROW_NUMBER.

    Scale shape: ONE hash shuffle on the shard key; the rank window
    partitions by shard (bounded — size n_shards like pack_token_shards'
    n_buckets so a shard's rows fit one task; md5 spreads keys uniformly
    so shards cannot skew). Never a global sort: the permutation is
    defined per-shard, so no cross-shard order exists to sort for —
    pinned by a plan test (no SinglePartition).
    """
    if n_shards < 1:
        raise ValueError(f"training_order: n_shards must be >= 1 (got {n_shards})")
    from pyspark.sql import Window

    bucket = md5_low60(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    t = df.select(
        F.col(key_col),
        bucket.cast("long").alias("_bucket"),
    ).withColumn("shard", (F.col("_bucket") % n_shards).cast("long"))
    w = Window.partitionBy("shard").orderBy(
        F.col("_bucket").asc(), F.col(key_col).asc()
    )
    return t.select(
        key_col,
        "shard",
        F.row_number().over(w).cast("long").alias("ord"),
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


def temperature_mix_rates(
    df: DataFrame,
    strat_col: str = "source",
    alpha_milli: int = 500,
    budget: int | None = None,
) -> DataFrame:
    """Temperature-based training-mixture sampling rates (Conneau & Lample
    2019 §3.1, the multinomial smoothing rule mT5/XLM-R also use; public
    knowledge): with per-stratum shares p_i = n_i/N, sample stratum i with
    probability q_i ∝ p_i^α — α < 1 up-weights small strata (low-resource
    languages / rare domains) without letting any stratum dominate.

    One row per stratum: ``n_docs``, ``w_micro`` = round(1e6 · p^α)
    (α = alpha_milli/1000 — a milli-integer knob so the float literal is
    exact), ``q_ppm`` = the normalized mixture weight in parts-per-million
    (integer division — sums to ≤ 1e6 with truncation remainder, like the
    pre-apportionment step of crawl_budget), and with ``budget`` B:
    ``take_docs`` = B·q_i (the stratum's document allocation) and
    ``rate_ppm`` = min(1e6, take·1e6 // n) — the EXACT integer knob to feed
    :func:`stratified_sample`, closing the loop from policy to row
    selection. p^α is computed as exp(α·ln p) with one fixed IEEE parse
    tree and rounded ONCE to micro-units (the lmscore/change_rate libm
    surface — ln/exp written identically on both engines); everything
    after is exact integer arithmetic (Spark ``div`` ≡ DuckDB ``//``).

    Scale shape: one map-side-combined count shuffle on the stratum key;
    N and Σw are one-row aggregates broadcast back (no driver collect);
    the output is the bounded per-stratum rollup. Bounds: q_ppm·budget
    must fit BIGINT ⇒ budget ≤ ~9e12 documents — beyond any corpus."""
    if not (0 < alpha_milli <= 1000):
        raise ValueError("alpha_milli must be in (0, 1000]")
    alpha = alpha_milli / 1000.0
    counts = df.groupBy(strat_col).agg(F.count(F.lit(1)).alias("n_docs"))
    tot = df.agg(F.count(F.lit(1)).alias("n_total"))
    w = F.round(
        F.lit(1e6) * F.exp(F.lit(alpha) * F.log(F.col("n_docs") / F.col("n_total")))
    ).cast("long")
    wt = counts.crossJoin(F.broadcast(tot)).withColumn("w_micro", w)
    sw = wt.agg(F.sum("w_micro").alias("sum_w"))
    out = (
        wt.crossJoin(F.broadcast(sw))
        .withColumn("q_ppm", F.expr("(w_micro * 1000000) div sum_w").cast("long"))
    )
    cols = [strat_col, "n_docs", "w_micro", "q_ppm"]
    if budget is not None:
        if budget < 0:
            raise ValueError("budget must be >= 0")
        out = out.withColumn(
            "take_docs",
            F.expr(f"(q_ppm * CAST({int(budget)} AS BIGINT)) div 1000000").cast("long"),
        ).withColumn(
            "rate_ppm",
            F.least(
                F.lit(SAMPLE_DEN).cast("long"),
                F.expr(f"(take_docs * {SAMPLE_DEN}) div n_docs").cast("long"),
            ),
        )
        cols += ["take_docs", "rate_ppm"]
    return out.select(*[F.col(c).cast("long").alias(c) if c != strat_col else F.col(c) for c in cols])
