"""Deduplication operators for training-data pipelines.

* exact: hash-groupBy on md5(text) — one shuffle, map-side partial agg.
* MinHash + LSH: shingle → minhash signature (vectorized numpy in a pandas
  UDF — the only Python stage) → band buckets → bucket self-join → candidate
  pairs with estimated Jaccard. The banding keeps the join output near-linear
  in true-duplicate count instead of O(n²).
* SimHash: 64-bit token-hash sign aggregation; near-dups = small Hamming
  distance within LSH buckets of the high bits.
* n-gram Jaccard: exact verification on candidate pairs via array ops
  (JVM-side array_intersect/array_union sizes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MINHASH_PERMS = 64
LSH_BANDS = 16  # 4 rows/band


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical texts (md5 key). Returns one row per
    duplicated fingerprint with group size and member ids (sorted)."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.col("n_docs") > 1)
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", shingle: int = 5, seed: int = 42
) -> DataFrame:
    """Char-shingle MinHash signatures (MINHASH_PERMS 64-bit universal
    hashes, numpy-vectorized per doc). Shingle hashing uses blake2b, not
    Python's salted ``hash``, so signatures are stable across executors."""

    def fn(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        rng = np.random.RandomState(seed)
        a = rng.randint(1, 2**62, size=MINHASH_PERMS).astype(np.uint64) * 2 + 1
        b = rng.randint(0, 2**62, size=MINHASH_PERMS).astype(np.uint64)
        mask = np.uint64(0xFFFFFFFFFFFFFFFF)

        def h64(x: str) -> int:
            return int.from_bytes(hashlib.blake2b(x.encode(), digest_size=8).digest(), "big")

        for pdf in batches:
            out_ids, out_sigs = [], []
            for doc_id, text in zip(pdf[id_col].values, pdf[text_col].values):
                s = text if isinstance(text, str) else ""
                shingles = (
                    {s} if len(s) < shingle else {s[i : i + shingle] for i in range(len(s) - shingle + 1)}
                )
                hv = np.fromiter((h64(x) for x in shingles), dtype=np.uint64, count=len(shingles))
                sig = ((hv[:, None] * a[None, :] + b[None, :]) & mask).min(axis=0)
                out_ids.append(doc_id)
                out_sigs.append([int(x >> np.uint64(1)) for x in sig])
            yield pd.DataFrame({id_col: out_ids, "sig": out_sigs})

    schema = T.StructType(
        [T.StructField(id_col, T.LongType()), T.StructField("sig", T.ArrayType(T.LongType()))]
    )
    return df.select(id_col, text_col).mapInPandas(fn, schema)


def near_duplicates_minhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle: int = 5,
    threshold: float = 0.7,
    seed: int = 42,
) -> DataFrame:
    """Candidate pairs via LSH banding, scored by signature agreement.
    Returns (doc_a, doc_b, est_jaccard) with doc_a < doc_b."""
    sigs = minhash_signatures(df, text_col, id_col, shingle, seed).persist()
    rows_per_band = MINHASH_PERMS // LSH_BANDS
    banded = sigs.select(
        F.col(id_col),
        F.col("sig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bnd).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", bnd * rows_per_band + r + 1).cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for bnd in range(LSH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.bucket") == F.col("r.bucket"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias("doc_a"),
            F.col(f"r.{id_col}").alias("doc_b"),
            F.col("l.sig").alias("sig_a"),
            F.col("r.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m))
        / F.lit(MINHASH_PERMS)
    ).alias("est_jaccard")
    return pairs.select("doc_a", "doc_b", est).filter(F.col("est_jaccard") >= threshold)


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over whitespace tokens, fully JVM-side: explode tokens,
    xxhash64 each, aggregate per-bit sign sums, reassemble the fingerprint."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit(""))).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    bit_sums = toks.groupBy(id_col).agg(
        *[
            F.sum(F.when(F.col("h").bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1)).alias(f"b{b}")
            for b in range(63)  # bit 63 is the sign bit of int64; skip to stay positive
        ]
    )
    fp = F.lit(0).cast("long")
    for b in range(63):
        fp = fp + F.when(F.col(f"b{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
    return bit_sums.select(F.col(id_col), fp.alias("simhash"))


def ngram_jaccard(
    df: DataFrame, pairs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact word-n-gram Jaccard for given (doc_a, doc_b) candidate pairs —
    the verify stage after LSH. Array ops, JVM-side."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit(""))
    grams = df.select(
        F.col(id_col),
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        ).alias("grams"),
    )
    a = grams.select(F.col(id_col).alias("doc_a"), F.col("grams").alias("ga"))
    b = grams.select(F.col(id_col).alias("doc_b"), F.col("grams").alias("gb"))
    joined = pairs.join(a, "doc_a").join(b, "doc_b")
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size(F.array_union("ga", "gb"))
    return joined.select(
        "doc_a", "doc_b", (inter / F.greatest(union, F.lit(1))).alias("jaccard")
    )
