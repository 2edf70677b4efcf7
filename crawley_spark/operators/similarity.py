"""Similarity search over an embedding column (``embeddings`` table:
vec_id long, embedding array<float>, label int).

* brute-force cosine top-k — baseline: broadcast the (small) query set,
  JVM-side dot product via zip_with/aggregate, per-query top-k window.
* LSH-bucketed (random hyperplane signs) — the scale path: candidates only
  within matching buckets; same scoring afterwards. At 100 TB the bucket
  join replaces the all-pairs cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def with_unit_vectors(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    n = _norm(F.col(vec_col))
    return df.withColumn(
        "_unit",
        F.when(n > 0, F.transform(F.col(vec_col), lambda v: v.cast("double") / n)).otherwise(
            F.transform(F.col(vec_col), lambda v: F.lit(0.0))
        ),
    )


def cosine_topk_bruteforce(
    corpus: DataFrame, queries: DataFrame, k: int = 5, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(query_id, neighbor_id, rank, cos_sim). Self-matches excluded.
    Queries are broadcast — corpus is scanned once, no shuffle on the big
    side; top-k via per-query window over the scored candidates."""
    c = with_unit_vectors(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("_unit").alias("cv")
    )
    q = with_unit_vectors(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("_unit").alias("qv")
    )
    scored = c.join(F.broadcast(q), on=F.col("neighbor_id") != F.col("query_id")).select(
        "query_id", "neighbor_id", _dot(F.col("cv"), F.col("qv")).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int):
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim)).astype("float64")


def lsh_signature_col(vec_col, planes) -> "F.Column":
    """Sign-bit signature as a long: bit p set iff dot(vec, plane_p) > 0."""
    sig = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        d = _dot(F.col(vec_col) if isinstance(vec_col, str) else vec_col, arr)
        sig = sig + F.when(d > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: only candidates sharing the hyperplane-sign bucket
    with the query are scored. Recall grows with fewer planes / multi-probe;
    n_planes=8 → 256 buckets."""
    dim = len(corpus.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    c = with_unit_vectors(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("_unit").alias("cv"),
        lsh_signature_col("_unit", planes).alias("bucket"),
    )
    q = with_unit_vectors(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("_unit").alias("qv"),
        lsh_signature_col("_unit", planes).alias("bucket"),
    )
    scored = c.join(F.broadcast(q), on="bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    ).select("query_id", "neighbor_id", _dot(F.col("cv"), F.col("qv")).alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )
