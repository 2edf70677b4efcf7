"""Incremental MinHash-LSH near-duplicate suppression over a document
stream — the streaming twin of ``operators.dedup.near_duplicates_minhash``
for continuously-ingested corpora (the training-data case: suppress a
document if anything sufficiently similar arrived before it).

Suppression rule, precisely (ADVICE r03): a doc is a duplicate iff it pairs
at ≥ threshold with an earlier KEPT doc (prior batches — only kept docs
enter the store) or with ANY smaller-id doc of its OWN batch, kept or
itself suppressed. The in-batch half is deliberately the aggressive
one-pass variant: in a similarity chain a~b~c with a≁c arriving in one
batch, both b and c are suppressed (c via the suppressed b), whereas
strict keep-first would keep c. Exact keep-first within a batch needs the
connected-component pass (``operators.cluster.consolidate_near_duplicates``
is the batch tool for that); one-pass is the right streaming trade — no
per-batch iteration, and over-suppression is bounded by the batch size,
never spans batches.

Per micro-batch (``foreachBatch``):

1. signatures + band buckets of the batch's docs — the SAME vectorized
   kernels as the batch operator (one Arrow stage, cut once with
   ``localCheckpoint``);
2. *in-batch* pairs via the batch operator itself (salt-capped banding);
3. *cross-batch* pairs: join the batch's banded rows against the persistent
   bucket store ``(band, bucket, id, sig)`` of previously KEPT docs on
   ``(band, bucket)``, estimate Jaccard by signature agreement, threshold;
4. suppression (see the rule above): duplicates pair with an earlier kept
   doc (prior batch) or any smaller-id doc of their own batch; everything
   else is kept and its banded rows join the store.

Sinks are batch-id-keyed overwrites (``kept/batch=N``, ``dups/batch=N``,
``store/batch=N``) — identical crash-replay idempotence to
``ingest.run_discovery``.

Scale shape: the store is only ever *joined* (band,bucket equi-join —
shuffle bounded by batch size + matching bucket members), never collected;
store growth is bounded per bucket by ``store_bucket_cap`` (template mass —
millions of boilerplate docs hashing into one bucket — stops accreting at
the cap; their *detection* still works against the capped members, the
standard web-dedup truncation, reported via the ``store_truncated``
metric in the dups sink's companion ``_meta`` file). At 10^10 docs the
store would live as an Iceberg table bucketed on (band, bucket) — the
parquet-dir layout is the sandbox stand-in, same join shape.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.dedup import (
    MINHASH_PERMS,
    _band_buckets,
    minhash_signatures,
    near_duplicates_minhash,
)

STORE_SCHEMA = "band int, bucket long, doc_id long, sig array<long>"
KEPT_SCHEMA = "doc_id long, batch_id long"
DUPS_SCHEMA = "doc_id long, dup_of long, est_jaccard double, batch_id long"


def _est(sig_a, sig_b):
    return F.size(F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y), lambda m: m)) / F.lit(
        MINHASH_PERMS
    )


def run_incremental_dedup(
    docs_stream: DataFrame,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    shingle: int = 5,
    seed: int = 42,
    store_bucket_cap: int = 2000,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
):
    """Start the incremental-dedup stream; returns the StreamingQuery.
    After ``awaitTermination()`` read ``{out_dir}/kept`` / ``{out_dir}/dups``."""
    spark = docs_stream.sparkSession
    ckpt = checkpoint_dir or os.path.join(out_dir, "_checkpoint")
    store_root = os.path.join(out_dir, "store")
    kept_root = os.path.join(out_dir, "kept")
    dups_root = os.path.join(out_dir, "dups")

    def _prev_dirs(root, batch_id):
        if not os.path.isdir(root):
            return []
        return [
            os.path.join(root, d)
            for d in os.listdir(root)
            if d.startswith("batch=") and int(d.split("=", 1)[1]) < batch_id
        ]

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        docs = batch_df.select(id_col, text_col)
        # in-batch pairs: the batch operator end to end (signatures are
        # recomputed below for banding — at batch sizes this beats plumbing
        # the checkpoint through the operator's internals)
        in_pairs = near_duplicates_minhash(
            docs, text_col=text_col, id_col=id_col, shingle=shingle,
            threshold=threshold, seed=seed,
        ).select(
            F.col("doc_b").alias(id_col), F.col("doc_a").alias("dup_of"), "est_jaccard"
        )
        sigs = minhash_signatures(docs, text_col, id_col, shingle, seed).localCheckpoint(
            eager=False
        )
        banded = _band_buckets(sigs, id_col).select(
            F.col("band"), F.col("bucket"), F.col(id_col), F.col("sig")
        )
        prev = _prev_dirs(store_root, batch_id)
        if prev:
            store = spark.read.schema(STORE_SCHEMA).parquet(*prev)
            cross = (
                banded.alias("n")
                .join(store.alias("o"), on=["band", "bucket"])
                .select(
                    F.col(f"n.{id_col}").alias(id_col),
                    F.col("o.doc_id").alias("dup_of"),
                    _est(F.col("n.sig"), F.col("o.sig")).alias("est_jaccard"),
                )
                .filter(F.col("est_jaccard") >= threshold)
                .dropDuplicates([id_col, "dup_of"])
            )
            counts = store.groupBy("band", "bucket").agg(F.count("*").alias("stored"))
        else:
            cross = spark.createDataFrame([], f"{id_col} long, dup_of long, est_jaccard double")
            counts = None
        # best (highest-est, then smallest dup_of) match per duplicated doc
        dups = (
            in_pairs.unionByName(cross)
            .groupBy(id_col)
            .agg(
                F.max(
                    F.struct(
                        F.col("est_jaccard").alias("e"), (-F.col("dup_of")).alias("nd")
                    )
                ).alias("m")
            )
            .select(
                F.col(id_col),
                (-F.col("m.nd")).alias("dup_of"),
                F.col("m.e").alias("est_jaccard"),
                F.lit(batch_id).alias("batch_id"),
            )
            .localCheckpoint(eager=True)
        )
        kept = (
            docs.join(dups.select(id_col), on=id_col, how="left_anti")
            .select(F.col(id_col), F.lit(batch_id).alias("batch_id"))
            .localCheckpoint(eager=True)
        )
        # store additions: banded rows of kept docs, per-bucket capped.
        # Rank new members deterministically by id; admit while
        # stored + rank <= cap. Detection against capped buckets still
        # works for everything admitted before the cap (documented
        # truncation, same policy as the batch operator's salt guard).
        add = banded.join(kept.select(id_col), on=id_col, how="left_semi")
        w_rank = F.row_number().over(Window.partitionBy("band", "bucket").orderBy(id_col))
        add = add.withColumn("_rk", w_rank)
        if counts is not None:
            add = add.join(
                F.broadcast(counts.filter(F.col("stored") > 0)),
                on=["band", "bucket"],
                how="left",
            ).withColumn("stored", F.coalesce(F.col("stored"), F.lit(0)))
        else:
            add = add.withColumn("stored", F.lit(0))
        add = add.localCheckpoint(eager=True)
        admitted = add.filter(F.col("stored") + F.col("_rk") <= store_bucket_cap)
        truncated = add.count() - admitted.count()
        admitted.select("band", "bucket", F.col(id_col).alias("doc_id"), "sig").write.mode(
            "overwrite"
        ).parquet(os.path.join(store_root, f"batch={batch_id}"))
        dups.write.mode("overwrite").parquet(os.path.join(dups_root, f"batch={batch_id}"))
        kept.write.mode("overwrite").parquet(os.path.join(kept_root, f"batch={batch_id}"))
        meta = {"batch_id": int(batch_id), "store_truncated": int(truncated)}
        with open(os.path.join(out_dir, f"_meta_batch_{batch_id}.json"), "w") as fh:
            json.dump(meta, fh)

    w = docs_stream.writeStream.foreachBatch(handle).option("checkpointLocation", ckpt)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
