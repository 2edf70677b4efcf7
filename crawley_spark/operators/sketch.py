"""Bounded-memory corpus statistics (beyond-reference, closing r05): the
three sketch/selection primitives a 100 TB pipeline runs where exact global
state would be unbounded — count–min frequency estimation (Cormode &
Muthukrishnan 2005), HyperLogLog distinct counting (Flajolet et al. 2007),
and exact order-statistic quantiles via two-pass bucketed selection (the
budget.py boundary-bucket pattern — no global sort, ever).

All three are integer-exact and therefore DuckDB-oracle-checkable:

* both sketches key on the low-60-bit md5 (``dedup.md5_low60`` — DuckDB's
  ``md5_number`` canonical non-negative residue), so every cell/register is
  a pure integer function of the data, identical under any partitioning;
* the HLL rank (rho) is derived from ``length(bin(v))`` — Spark and DuckDB
  both print minimal-width binary, so floor(log2) is a string length, not a
  float log;
* the HLL estimate's two libm steps (the published alpha_m bias correction
  and linear-counting ln) follow the lmscore discipline: ONE float
  expression written identically on both engines, floored once into
  integer units.

Scale shape:

* ``count_min_sketch`` — tokens explode map-side into depth cells; the one
  shuffle is map-side combined, so each task emits at most depth x width
  partial rows and the finished sketch is depth x width rows TOTAL,
  independent of corpus size. Lookup broadcasts the sketch; probes never
  shuffle.
* ``hll_registers`` — same shape with 2^p registers; ``hll_estimate`` is
  one aggregate row.
* ``exact_quantiles`` — value-range bucket counts (bounded by
  ``max_buckets``) come to the driver, the prefix sum picks each
  quantile's boundary bucket, and ONLY boundary buckets are ever
  window-ranked (partitioned by bucket — ``SinglePartition`` never appears;
  plan-test-pinned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import md5_low60

LOW60_DEN = 1 << 60


def _low60_of_hex(hex_col) -> "F.Column":
    """dedup.md5_low60's conv arithmetic over an ALREADY-COMPUTED md5 hex
    column. Inlining md5_low60 here would embed a separate ``md5()`` call
    in each of its 8 conv terms; across depth cells that is 8 x depth md5
    evaluations per row and a generated-code tree large enough to cost
    whole seconds of first-run JIT (measured: cms_freq 8.0 s cold at
    sf0.1 before this split, 1.9 s after). Hashing once into a column and
    deriving the long from the hex keeps the value bit-identical."""

    def byte(j):
        return F.conv(F.substring(hex_col, 2 * j + 1, 2), 16, 10).cast("long")

    h = F.lit(0).cast("long")
    for j in range(7):
        h = h + byte(j) * F.lit(1 << (8 * j)).cast("long")
    return h + (byte(7) % 16) * F.lit(1 << 56).cast("long")


def _cms_cells(df: DataFrame, key_col: str, depth: int, width: int, salt: str):
    """(row_i, col) cell coordinates for every input row, exploded map-side:
    col_i = md5_low60('salt|i|' || key) % width. The depth md5 digests are
    posexploded as a hex array FIRST and the conv arithmetic runs once on
    the exploded column — inlining md5_low60 per cell put depth copies of
    its 8-conv chain (each embedding its own md5 call) into one generated
    method, and Janino compilation of that tree cost ~8 s of first-run
    wall at ANY data size (measured; 1.9 s with this shape)."""
    hexes = F.array(
        *[
            F.md5(F.concat(F.lit(f"{salt}|{i}|"), F.col(key_col).cast("string")))
            for i in range(depth)
        ]
    )
    return (
        df.select(F.col(key_col), F.posexplode(hexes).alias("row_i", "_h"))
        .select(
            key_col,
            F.col("row_i").cast("int").alias("row_i"),
            (_low60_of_hex(F.col("_h")) % width).alias("col"),
        )
    )


def count_min_sketch(
    df: DataFrame,
    key_col: str = "tok",
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms-v1",
) -> DataFrame:
    """Count–min sketch (Cormode & Muthukrishnan 2005; public knowledge):
    one row per non-empty cell ``(row_i, col, cnt)`` where
    ``col = md5_low60(salt|row_i| || key) % width`` and ``cnt`` counts the
    key OCCURRENCES hashing there. The finished sketch is at most
    depth x width rows regardless of corpus size — the whole point: the
    one shuffle is map-side combined (each task emits <= depth x width
    partial rows), so frequency estimation over 100 TB of tokens exchanges
    kilobytes. Deterministic and integer-exact: the DuckDB oracle rebuilds
    every cell from ``md5_number``."""
    if depth < 1 or width < 1:
        raise ValueError("count_min_sketch: depth and width must be >= 1")
    return (
        _cms_cells(df, key_col, depth, width, salt)
        .groupBy("row_i", "col")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_lookup(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str = "tok",
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms-v1",
) -> DataFrame:
    """Point-query the sketch for each DISTINCT probe key: the estimate is
    ``min`` over the depth rows of the addressed cell counts (an absent
    cell is 0). CMS guarantee: ``est >= true count`` always (collisions
    only ADD). The sketch (bounded: depth x width rows) is broadcast, so
    probes are never shuffled on content; the per-probe min is a map-side
    combined aggregate. ``depth``/``width``/``salt`` must match the build
    call — they address the cells."""
    cells = _cms_cells(probes.select(key_col).distinct(), key_col, depth, width, salt)
    return (
        cells.join(F.broadcast(sketch), ["row_i", "col"], "left")
        .select(key_col, F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt"))
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est"))
    )


def hll_registers(
    df: DataFrame, key_col: str = "key", p: int = 8, salt: str = "hll-v1"
) -> DataFrame:
    """HyperLogLog register table (Flajolet et al. 2007; public knowledge):
    ``h = md5_low60(salt| || key)`` splits into ``bucket`` (low p bits) and
    a ``w = 60 - p`` bit value ``v``; the register is the max over the
    bucket's keys of ``rho(v)`` = leading zeros of v in w bits + 1
    (``w + 1 - bitlength(v)``, bitlength via ``length(bin(v))`` — both
    engines print minimal-width binary, so no float log anywhere). Output:
    one row per NON-EMPTY bucket ``(bucket, register)`` — at most 2^p rows
    total; the one shuffle is map-side combined max. Merging two corpora's
    sketches = groupBy bucket max(register), the property that makes HLL
    the 100 TB distinct-count primitive."""
    if not 4 <= p <= 16:
        raise ValueError("hll_registers: p must be in [4, 16]")
    m = 1 << p
    w = 60 - p
    h = md5_low60(F.concat(F.lit(f"{salt}|"), F.col(key_col).cast("string")))
    d = df.select(h.alias("_h")).select(
        (F.col("_h") % m).alias("bucket"),
        F.shiftright(F.col("_h"), p).alias("_v"),
    )
    rho = F.when(F.col("_v") == 0, F.lit(w + 1)).otherwise(
        F.lit(w) + 1 - F.length(F.bin(F.col("_v")))
    )
    return (
        d.select("bucket", rho.cast("int").alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("register"))
    )


def hll_estimate(registers: DataFrame, p: int = 8) -> DataFrame:
    """One-row HLL cardinality estimate from a register table. Exact
    integer core: ``z_scaled = sum over ALL 2^p buckets of 2^(K - M_j)``
    with ``K = 61 - p`` (empty buckets contribute 2^K), a BIGINT by
    construction (<= 2^(p + K) = 2^61). The published estimator is then
    TWO documented float steps, each written identically in the DuckDB
    oracle (the lmscore libm discipline): raw = alpha_m * m^2 * 2^K /
    z_scaled (alpha_m = 0.7213 / (1 + 1.079 / m), the m >= 128 constant —
    enforced p >= 7), switched to linear counting m * ln(m / n_zero) when
    raw <= 2.5 m and empty buckets exist; floor(x + 0.5) into ``est``.
    Columns: m, n_zero, z_scaled, est."""
    if p < 7:
        raise ValueError("hll_estimate: p must be >= 7 (alpha_m constant regime)")
    m = 1 << p
    k = 61 - p
    agg = registers.agg(
        F.count(F.lit(1)).alias("_present"),
        F.coalesce(
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {k} - register)")),
            F.lit(0),
        ).alias("_z_present"),
    )
    return agg.select(
        F.lit(m).cast("long").alias("m"),
        (F.lit(m) - F.col("_present")).cast("long").alias("n_zero"),
        (
            (F.lit(m) - F.col("_present")) * F.lit(1 << k).cast("long")
            + F.col("_z_present")
        ).alias("z_scaled"),
    ).selectExpr("m", "n_zero", "z_scaled", hll_est_sql(p) + " AS est")


def hll_raw_sql(p: int) -> str:
    """The raw-estimator float expression, shared verbatim between the
    Spark plan and the DuckDB oracle so both engines evaluate the
    IDENTICAL parse tree: alpha_m * m^2 * 2^K / z_scaled."""
    m = 1 << p
    k = 61 - p
    return f"(0.7213 / (1.0 + 1.079 / {m}.0)) * {float(m) * m!r} * {float(1 << k)!r} / z_scaled"


def hll_est_sql(p: int) -> str:
    """The full estimator expression over columns (z_scaled, n_zero) —
    raw estimator switched to linear counting in the published small-range
    regime, floored once to BIGINT. Shared verbatim by
    :func:`hll_estimate` and the driver oracle (the lmscore libm
    discipline: one parse tree, both engines)."""
    m = 1 << p
    raw = hll_raw_sql(p)
    return (
        f"CAST(floor(CASE WHEN {raw} <= {2.5 * m!r} AND n_zero > 0 "
        f"THEN {m}.0 * ln({m}.0 / n_zero) ELSE {raw} END + 0.5) AS BIGINT)"
    )


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    probs_milli: list,
    max_buckets: int = 2048,
) -> DataFrame:
    """EXACT order-statistic quantiles of an integer column with NO global
    sort (the classic cluster anti-pattern: ``ORDER BY`` into one task).
    For each p in ``probs_milli`` the result is the k-th smallest value
    with ``k = (n - 1) * p div 1000 + 1`` (1-based; p=0 -> min, p=1000 ->
    max — DuckDB's ``quantile_disc`` positions).

    Two-pass bucketed selection (the budget.py boundary-bucket pattern):
    (1) one aggregate gives n/lo/hi; (2) value-range bucket counts — at
    most ``max_buckets`` rows — come to the driver, the prefix sum locates
    each quantile's boundary bucket and within-bucket rank; (3) ONLY the
    boundary buckets are filtered out and window-ranked (partitioned by
    bucket, so ``SinglePartition`` never appears — plan-test-pinned). At
    100 TB that is two map-side-combined scans plus a window over a
    1/max_buckets slice of the data.

    Returns (p_milli, k, n, value), one row per requested quantile."""
    if not probs_milli:
        raise ValueError("exact_quantiles: probs_milli must be non-empty")
    if any(q < 0 or q > 1000 for q in probs_milli):
        raise ValueError("exact_quantiles: probs_milli must be within [0, 1000]")
    spark = df.sparkSession
    v = F.col(value_col).cast("long")
    n, lo, hi = df.agg(
        F.count(F.lit(1)), F.min(v), F.max(v)
    ).first()
    out_schema = "p_milli long, k long, n long, value long"
    if not n:
        return spark.createDataFrame([], out_schema)
    bw = max(1, (hi - lo) // max_buckets + 1)
    # integer div, not float-and-truncate: values may exceed 2^53
    bucketed = df.select(
        F.expr(f"(CAST({value_col} AS BIGINT) - {int(lo)}) div {bw}").alias("_bk"),
        v.alias("_v"),
    )
    counts = dict(
        bucketed.groupBy("_bk").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    # driver prefix sum over <= max_buckets + 1 entries -> per-quantile
    # (boundary bucket, within-bucket rank)
    targets = []  # (p_milli, k, bucket, rank_in_bucket)
    for q in sorted(set(int(x) for x in probs_milli)):
        kth = (n - 1) * q // 1000 + 1
        cum = 0
        for bk in sorted(counts):
            if cum + counts[bk] >= kth:
                targets.append((q, kth, bk, kth - cum))
                break
            cum += counts[bk]
    want = spark.createDataFrame(
        [(int(q), int(kth), int(bk), int(r)) for q, kth, bk, r in targets],
        "p_milli long, k long, _bk long, _r long",
    )
    boundary = sorted({bk for _, _, bk, _ in targets})
    from pyspark.sql import Window

    ranked = (
        bucketed.filter(F.col("_bk").isin(boundary))
        .withColumn(
            "_r",
            F.row_number().over(
                Window.partitionBy("_bk").orderBy(F.col("_v").asc())
            ),
        )
    )
    return (
        ranked.join(F.broadcast(want), ["_bk", "_r"])
        .select("p_milli", "k", F.lit(int(n)).cast("long").alias("n"),
                F.col("_v").alias("value"))
    )
