"""Incremental MinHash-LSH near-duplicate suppression over a document
stream — the streaming twin of ``operators.dedup.near_duplicates_minhash``
for continuously-ingested corpora (the training-data case: suppress a
document if anything sufficiently similar arrived before it).

Suppression rule, precisely (VERDICT r04 "next" #2 — the exact batch-twin
rule, replacing r03's one-pass approximation): per micro-batch, build the
pair graph over (a) in-batch pairs at ≥ threshold and (b) cross-batch pairs
between batch docs and previously-KEPT store docs, then take connected
components (``operators.cluster.connected_components`` — batches are small
graphs, so its driver-local union-find fast path applies and the
consolidation costs one collect, not log(n) Spark jobs). Per component:

* contains ≥ 1 store doc → every batch doc in it is suppressed
  (``dup_of`` = the smallest such store doc — it was kept in an earlier
  batch and cannot be retracted);
* else → the smallest batch id is kept, the rest suppressed
  (``dup_of`` = that keeper).

Two identity edge rules (r05 review fixes): a batch doc whose id was
already KEPT in an earlier batch (exact-id replay — the (X, X) cross pair
is a self-loop components would drop) is routed straight to ``dups`` with
``dup_of`` = its own id and NULL ``est_jaccard``, and never re-enters the
store; a NULL-id doc cannot participate in identity-keyed dedup and passes
through as kept. Both preserve the invariant that every processed doc
lands in exactly one of kept/dups.

This is byte-identical to what ``consolidate_near_duplicates`` would decide
had the whole component arrived in one batch (stream≡batch parity is
pinned in tests/test_streaming.py): in a chain a~b~c with a≁c, b AND c are
suppressed with ``dup_of`` = a — one keeper per cluster, the
training-data-dedup contract. ``est_jaccard`` on a suppressed doc is its
best DIRECT pair estimate (max over its own edges — evidence, not the
similarity to the possibly-transitive keeper).

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

from ..operators.cluster import connected_components
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
        raw = batch_df.select(id_col, text_col)
        # NULL-id rows cannot participate in identity-keyed dedup; pass
        # them through as kept (the pre-r05 left_anti path's behavior)
        # so every processed doc lands in exactly one of kept/dups.
        null_kept = raw.filter(F.col(id_col).isNull()).select(
            F.col(id_col), F.lit(batch_id).alias("batch_id")
        )
        docs = raw.filter(F.col(id_col).isNotNull())
        prev = _prev_dirs(store_root, batch_id)
        replayed = None
        if prev:
            store = spark.read.schema(STORE_SCHEMA).parquet(*prev)
            # exact-id replay: a batch doc whose id was already KEPT in an
            # earlier batch must not be re-kept (double emission) or re-enter
            # the store (bucket inflation toward store_bucket_cap). The
            # (X, X) cross pair is a self-loop connected_components drops,
            # so handle identity directly: route replays to dups with
            # dup_of = their own id (prior delivery), est_jaccard NULL (no
            # signature comparison made). One extra distinct-ids semi/anti
            # join per batch — the store is already scanned twice below
            # (cross + counts), and it stays join-only, never collected.
            store_ids = store.select(F.col("doc_id").alias(id_col)).distinct()
            replayed = (
                docs.select(id_col)
                .join(store_ids, on=id_col, how="left_semi")
                .localCheckpoint(eager=True)
            )
            docs = docs.join(store_ids, on=id_col, how="left_anti")
        # in-batch pairs: the batch operator end to end (signatures are
        # recomputed below for banding — at batch sizes this beats plumbing
        # the checkpoint through the operator's internals)
        in_pairs = near_duplicates_minhash(
            docs, text_col=text_col, id_col=id_col, shingle=shingle,
            threshold=threshold, seed=seed,
        ).localCheckpoint(eager=True)  # read 3×: edges + both direct sides
        sigs = minhash_signatures(docs, text_col, id_col, shingle, seed).localCheckpoint(
            eager=False
        )
        banded = _band_buckets(sigs, id_col).select(
            F.col("band"), F.col("bucket"), F.col(id_col), F.col("sig")
        )
        if prev:
            cross = (
                banded.alias("n")
                .join(store.alias("o"), on=["band", "bucket"])
                .select(
                    F.col(f"n.{id_col}").alias(id_col),
                    F.col("o.doc_id").alias("store_id"),
                    _est(F.col("n.sig"), F.col("o.sig")).alias("est_jaccard"),
                )
                .filter(F.col("est_jaccard") >= threshold)
                .dropDuplicates([id_col, "store_id"])
            )
            counts = store.groupBy("band", "bucket").agg(F.count("*").alias("stored"))
        else:
            cross = spark.createDataFrame(
                [], f"{id_col} long, store_id long, est_jaccard double"
            )
            counts = None
        cross = cross.localCheckpoint(eager=True)
        # exact batch-twin consolidation (module docstring): components over
        # in-batch + cross edges; store-anchored components are wholly
        # suppressed, others keep their min batch id. Batches are small
        # graphs, so connected_components takes its driver-local fast path.
        edges = in_pairs.select(
            F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
        ).unionByName(cross.select(F.col(id_col).alias("u"), F.col("store_id").alias("v")))
        comp = connected_components(edges, src="u", dst="v")
        anchors = (
            comp.join(
                cross.select(F.col("store_id").alias("id")).distinct(), on="id"
            )
            .groupBy("component")
            .agg(F.min("id").alias("store_keep"))
        )
        labeled = (
            docs.select(id_col)
            .join(comp, docs[id_col] == comp.id, "left")
            .select(
                F.col(id_col),
                F.coalesce(F.col("component"), F.col(id_col)).alias("component"),
            )
        )
        min_batch = labeled.groupBy("component").agg(F.min(id_col).alias("batch_keep"))
        keepers = (
            labeled.join(F.broadcast(min_batch), on="component")
            .join(F.broadcast(anchors), on="component", how="left")
            .select(
                F.col(id_col),
                F.coalesce(F.col("store_keep"), F.col("batch_keep")).alias("keep_id"),
            )
        )
        # evidence column: each suppressed doc's best DIRECT pair estimate
        direct = (
            in_pairs.select(F.col("doc_a").alias(id_col), "est_jaccard")
            .unionByName(in_pairs.select(F.col("doc_b").alias(id_col), "est_jaccard"))
            .unionByName(cross.select(F.col(id_col), "est_jaccard"))
            .groupBy(id_col)
            .agg(F.max("est_jaccard").alias("est_jaccard"))
        )
        dups = keepers.filter(F.col(id_col) != F.col("keep_id")).join(
            direct, on=id_col, how="left"
        ).select(
            F.col(id_col),
            F.col("keep_id").alias("dup_of"),
            F.col("est_jaccard"),
            F.lit(batch_id).alias("batch_id"),
        )
        if replayed is not None:
            dups = dups.unionByName(
                replayed.select(
                    F.col(id_col),
                    F.col(id_col).alias("dup_of"),
                    F.lit(None).cast("double").alias("est_jaccard"),
                    F.lit(batch_id).alias("batch_id"),
                )
            )
        dups = dups.localCheckpoint(eager=True)
        kept = (
            keepers.filter(F.col(id_col) == F.col("keep_id"))
            .select(F.col(id_col), F.lit(batch_id).alias("batch_id"))
            .unionByName(null_kept)
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
