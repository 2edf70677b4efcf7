"""Benchmark decontamination for training-data pipelines (beyond-reference
op, late r05): flag documents sharing any word n-gram with a probe set of
evaluation texts — the published n-gram-overlap practice (Brown et al.
2020 use 13-gram collisions; public knowledge).

Scale shape: the probe set (benchmark suites are tiny next to a 100-TB
corpus) is reduced to its DISTINCT n-grams and broadcast; the corpus side
explodes its n-grams map-side and broadcast-semi-joins — the big side is
never shuffled on content, and the only exchange is the per-doc hit-count
partial aggregate ((long, long) rows). Probe n-grams are hashed to 64-bit
with xxhash64 before the join so the broadcast table and the join keys
carry 8 bytes per n-gram instead of ~13 words of text; xxhash64 collisions
(~2^-64 per pair) are the declared approximation, identical on both sides
of the driver oracle because DuckDB cannot reproduce Spark's xxhash64 —
the oracle therefore joins on the n-gram STRING, which must agree with the
hash join exactly unless a collision fires (none at test scale, asserted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _word_ngrams_col(text, n: int):
    from .textstats import _word_ngrams

    words = F.filter(F.split(text, " "), lambda w: w != F.lit(""))
    return _word_ngrams(words, n)


def ngram_decontaminate(
    df: DataFrame,
    probes: DataFrame,
    n: int = 13,
    text_col: str = "text",
    join_on_hash: bool = True,
) -> DataFrame:
    """One row per input doc: ``n_ngrams`` (word n-grams in the doc),
    ``n_hits`` (positions whose n-gram occurs in the probe set, counted
    with multiplicity), ``contaminated`` (any hit — the published removal
    rule). ``join_on_hash=False`` joins on the n-gram string instead of
    its xxhash64 (the oracle path; byte-heavier broadcast, zero collision
    risk)."""
    grams = df.select(
        F.col("doc_id"), F.explode(_word_ngrams_col(F.col(text_col), n)).alias("g")
    )
    probe_grams = (
        probes.select(F.explode(_word_ngrams_col(F.col(text_col), n)).alias("g")).distinct()
    )
    if join_on_hash:
        grams = grams.select("doc_id", F.xxhash64("g").alias("k"))
        probe_grams = probe_grams.select(F.xxhash64("g").alias("k"))
        key = "k"
    else:
        key = "g"
    hits = (
        grams.join(broadcast(probe_grams), key, "inner")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    base = df.select(
        F.col("doc_id"),
        F.size(_word_ngrams_col(F.col(text_col), n)).cast("long").alias("n_ngrams"),
    )
    return (
        base.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_ngrams",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        )
        .withColumn("contaminated", F.col("n_hits") > 0)
    )
