"""SemDeDup — semantic deduplication via embedding k-means + within-cluster
cosine pruning (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", arXiv:2303.09540).

The published pipeline: (1) k-means-cluster the corpus embeddings, (2)
within each cluster find pairs above a cosine-similarity threshold, (3) per
duplicate group keep the item with the LOWEST similarity to its cluster
centroid (the most atypical copy — the paper's §3 rule; equivalently max
centroid distance), dropping the rest. Clustering is what makes the
quadratic pair step tractable at web scale: pairs are only ever generated
inside a cluster, never across the corpus.

Everything here is INTEGER-EXACT so the driver oracle can replay the whole
computation hash-exactly in DuckDB (the pagerank discipline — floating
k-means differs in the last ulp across engines; integer k-means cannot):

* Embeddings are quantized once: ``q[i] = round(x[i] * 1e6)`` as BIGINT
  (Spark HALF_UP ≡ DuckDB round: both are half-away-from-zero on the exact
  double, verified for ties and non-ties — the embed_dedup cos_milli
  discipline). All distances/dots below are exact integer arithmetic on q.
* Squared L2 distance: ``Σ (q_i - c_i)²`` ≤ 64 · (2·2^20)² ≈ 3e14 — BIGINT.
* Centroid update: element-wise ``SUM(q_i) // count`` — Spark ``div`` and
  DuckDB ``//`` both truncate toward zero (verified on negatives), so the
  two sides agree even on negative coordinate sums.
* Cosine threshold (milli-units): ``cos ≥ T/1000`` for T > 0 is evaluated
  as ``dot > 0 AND dot² · 10⁶ ≥ T² · |a|² · |b|²`` — dot ≤ 1.8e13 fits
  BIGINT, but the squared products reach ~3e32, so they are compared in
  DECIMAL(38,0) (Spark) ≡ HUGEINT (DuckDB), the crawl_budget pattern.

Determinism choices (all oracle-mirrored, all documented here):

* Seeds: the k smallest ids' quantized vectors (no RNG — rerun-identical,
  the stratified_sample discipline).
* Assignment tie-break: min distance, then min centroid id.
* Empty cluster after an update: carries its previous centroid unchanged.
* ``iterations`` update rounds, then one final assignment — so the reported
  (cluster, dist_q) is against the FINAL centroids.

Scale shape (what survives 1000 executors / 100 TB):

* Centroids are k·dim bounded scalars held on the driver between rounds
  (8 clusters × 64 dims = 512 longs — the pagerank two-scalar discipline;
  the same place ``train_ivf_centroids`` already keeps its float
  centroids). Holding them driver-side is what makes assignment a ZERO-
  SHUFFLE projection: the centroid table is folded into the plan as
  literals (impl="sql") or an Arrow-kernel closure (impl="arrow") — no
  join, no exchange, pinned by a plan test.
* Per-iteration update is ONE map-side-combined shuffle keyed on
  (cluster, dim) carrying k·dim partial rows per task — never vectors.
* The within-cluster pair join repartitions on the cluster id; the
  quadratic term is bounded by the largest cluster (choose k so clusters
  are bounded — the paper's own premise). Rows carry the 512-byte q vector
  into exactly that one exchange; the threshold is applied pre-dedup so
  only true-duplicate pairs survive to the component step.
* Components + keep/drop ride :mod:`crawley_spark.operators.cluster`
  (min-label propagation + pointer jumping; driver fast path for small
  graphs), exchanging (long, long) labels only.

``impl="sql"`` keeps assignment in pure JVM column expressions
(zip_with/aggregate HOFs — Catalyst runs the lambdas interpreted, the
gopher_repetition finding); ``impl="arrow"`` (default) computes the same
argmin with one int64 numpy matmul-shaped kernel per Arrow batch. The two
are row-for-row identical (parity-pinned in tests/test_semdedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT_SCALE = 1_000_000
DEFAULT_K = 8
DEFAULT_ITERATIONS = 2
DEFAULT_THRESHOLD_MILLI = 900

_DEC = "decimal(38,0)"


def quantize_embeddings(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, q): embedding quantized to integer micro-units. One projection,
    zero shuffle; the float→double cast is exact, ·1e6 is one IEEE op
    written identically in the oracle, round is half-away-from-zero on both
    engines."""
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.transform(
            vec_col, lambda x: F.round(x.cast("double") * QUANT_SCALE).cast("long")
        ).alias("q"),
    )


def _dist_expr(centroid: list):
    """Integer squared-L2 distance from column ``q`` to a driver-known
    centroid, as a pure JVM expression (the literal centroid array is folded
    into the plan — no join)."""
    carr = F.array(*[F.lit(int(v)).cast("long") for v in centroid])
    return F.aggregate(
        F.zip_with("q", carr, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _assign_sql(points: DataFrame, centroids: list) -> DataFrame:
    """(id, q, cluster, dist_q) — argmin over k literal-centroid distance
    expressions; tie → smallest cluster id (array_position returns the FIRST
    match of the min). Zero shuffle (plan-test-pinned)."""
    dists = F.array(*[_dist_expr(c) for c in centroids])
    md = F.array_min(dists)
    return points.select(
        "id",
        "q",
        (F.array_position(dists, md) - 1).cast("int").alias("cluster"),
        md.alias("dist_q"),
    )


def _assign_arrow(points: DataFrame, centroids: list) -> DataFrame:
    """Same contract as :func:`_assign_sql`, computed per Arrow batch with
    int64 numpy (exact: values bounded ~3e14 ≪ 2^63). np.argmin returns the
    first (smallest-id) minimum — the same tie-break."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("q", T.ArrayType(T.LongType())),
            T.StructField("cluster", T.IntegerType()),
            T.StructField("dist_q", T.LongType()),
        ]
    )
    cvals = [list(map(int, c)) for c in centroids]

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        C = np.asarray(cvals, dtype=np.int64)  # (k, dim)
        for batch in batches:
            ids = batch.column(batch.schema.get_field_index("id"))
            qcol = batch.column(batch.schema.get_field_index("q"))
            qlists = qcol.to_pylist()
            if not qlists:
                continue
            Q = np.asarray(qlists, dtype=np.int64)  # (n, dim)
            # (n, k): Σ q² - 2 q·c + Σ c² — int64 throughout; the cross
            # term is the only O(n·k·dim) work and runs as one matmul
            qq = (Q * Q).sum(axis=1, keepdims=True)
            cc = (C * C).sum(axis=1)
            d = qq - 2 * (Q @ C.T) + cc[None, :]
            cl = d.argmin(axis=1)
            dist = d[np.arange(len(qlists)), cl]
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    qcol,
                    pa.array(cl.astype("int32")),
                    pa.array(dist),
                ],
                names=["id", "q", "cluster", "dist_q"],
            )

    return points.select("id", "q").mapInArrow(fn, schema)


def kmeans_integer(
    points: DataFrame,
    k: int = DEFAULT_K,
    iterations: int = DEFAULT_ITERATIONS,
    impl: str = "arrow",
    stats: dict | None = None,
) -> DataFrame:
    """Deterministic integer k-means over (id, q) rows: returns
    (id, q, cluster, dist_q) against the final centroids. Seeds = the k
    smallest ids' vectors; ``iterations`` update rounds then one final
    assignment; empty clusters carry their previous centroid. The centroid
    table lives on the driver between rounds (k·dim bounded longs) — see
    module docstring for why that is the scale-correct shape."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if impl not in ("sql", "arrow"):
        raise ValueError(f"unknown impl {impl!r}")
    assign = _assign_sql if impl == "sql" else _assign_arrow

    seed_rows = points.orderBy("id").limit(k).select("id", "q").collect()
    if not seed_rows:
        raise ValueError("kmeans_integer: empty input")
    centroids = [list(r["q"]) for r in sorted(seed_rows, key=lambda r: r["id"])]
    dim = len(centroids[0])
    k_eff = len(centroids)  # fewer points than k: every point its own seed

    for _ in range(iterations):
        assigned = assign(points, centroids)
        # ONE map-side-combined shuffle on (cluster, dim): partial sums and
        # counts combine per task before the exchange, so it carries
        # k·dim·n_tasks scalar rows — never vectors
        sums = (
            assigned.select(
                "cluster", F.posexplode("q").alias("dim", "v")
            )
            .groupBy("cluster", "dim")
            .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new_c = [list(c) for c in centroids]  # empty-cluster carryover
        acc: dict = {}
        for r in sums:
            row = acc.setdefault(r["cluster"], [[0, 0] for _ in range(dim)])
            cell = row[r["dim"]]
            cell[0] += r["s"]
            cell[1] += r["n"]
        for cid, row in acc.items():
            # Spark div ≡ DuckDB // : truncation toward zero on both
            new_c[cid] = [
                (s // n if s >= 0 else -((-s) // n)) for s, n in row
            ]
        centroids = new_c

    if stats is not None:
        stats["k"] = k_eff
        stats["dim"] = dim
        stats["centroids"] = [list(c) for c in centroids]
    return assign(points, centroids)


def semantic_duplicate_pairs(
    assigned: DataFrame, threshold_milli: int = DEFAULT_THRESHOLD_MILLI
) -> DataFrame:
    """(doc_a, doc_b) with doc_a < doc_b: same-cluster pairs whose exact
    integer cosine clears threshold_milli/1000. The join keys on the cluster
    id, so the exchange is the SemDeDup-bounded within-cluster term; norms
    are computed map-side pre-join. The squared comparison runs in
    DECIMAL(38,0) — see module docstring for the bound arithmetic."""
    if not (0 < threshold_milli <= 1000):
        raise ValueError("threshold_milli must be in (0, 1000]")
    norm = F.aggregate(
        F.zip_with("q", "q", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    side = assigned.select("id", "q", "cluster", norm.alias("n2"))
    a = side.alias("a")
    b = side.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.q"), F.col("b.q"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    t2 = F.lit(int(threshold_milli) ** 2).cast(_DEC)
    cond = (dot > 0) & (
        dot.cast(_DEC) * dot.cast(_DEC) * F.lit(1_000_000).cast(_DEC)
        >= t2 * F.col("a.n2").cast(_DEC) * F.col("b.n2").cast(_DEC)
    )
    return (
        a.join(b, on=(F.col("a.cluster") == F.col("b.cluster")) & (F.col("a.id") < F.col("b.id")))
        .filter(cond)
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
    )


def semdedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = DEFAULT_K,
    iterations: int = DEFAULT_ITERATIONS,
    threshold_milli: int = DEFAULT_THRESHOLD_MILLI,
    impl: str = "arrow",
    stats: dict | None = None,
) -> DataFrame:
    """The full published pipeline: quantize → integer k-means → within-
    cluster cosine pairs → connected components → keep the max-centroid-
    distance member per duplicate group (min-id tiebreak) — the paper's
    keep-the-most-atypical rule, expressed through
    :func:`~crawley_spark.operators.cluster.consolidate_near_duplicates`
    with ``score_col="dist_q"``.

    Returns one row per input: (id, cluster, dist_q, component, keep_id,
    is_kept). Singletons (no duplicate) are their own kept component."""
    from .cluster import consolidate_near_duplicates

    assigned = kmeans_integer(
        quantize_embeddings(df, id_col, vec_col),
        k=k,
        iterations=iterations,
        impl=impl,
        stats=stats,
    )
    # the pair join and the consolidation both reread it; one cut keeps the
    # k-means assignment from recomputing per consumer
    assigned = assigned.localCheckpoint(eager=False)
    pairs = semantic_duplicate_pairs(assigned, threshold_milli=threshold_milli)
    # consolidate's internal label table is named "id"; a distinct id_col
    # avoids the ambiguous self-reference
    out = consolidate_near_duplicates(
        assigned.select(F.col("id").alias("vid"), "cluster", "dist_q"),
        pairs,
        id_col="vid",
        score_col="dist_q",
    )
    return out.join(
        assigned.select(F.col("id").alias("vid"), "cluster", "dist_q"), on="vid"
    ).select(
        F.col("vid").alias("id"), "cluster", "dist_q", "component", "keep_id", "is_kept"
    )
