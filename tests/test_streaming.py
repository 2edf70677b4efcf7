"""Structured Streaming surface (crawley_spark/streaming/ingest.py).

Every test runs bounded streams (``availableNow`` over a file-source
directory) so results are deterministic, and checks the streaming result
against the equivalent batch pipeline on the same bytes — the streaming
operators must be the *incremental twins* of the batch ones, not a second
implementation with its own semantics.
"""

import os

import pytest
from pyspark.sql import functions as F

from crawley_spark.config import CrawlConfig
from crawley_spark.corpus import synth_corpus
from crawley_spark.streaming import (
    extract_links_stream,
    host_window_metrics,
    pace_fetches,
    run_discovery,
    stream_pages,
)

CFG = CrawlConfig(depth=-1, no_head=True)
SEED = "http://h0.test"


def _write_corpus_files(spark, tmp_path, n_pages=40, n_hosts=3, splits=((0, 20), (20, 40))):
    """Materialize a deterministic corpus into per-range parquet files with
    strictly increasing mtimes (the file source orders batches by mtime)."""
    corpus = synth_corpus(spark, n_pages=n_pages, n_hosts=n_hosts, links_per_page=4).cache()
    d = str(tmp_path / "pages")
    os.makedirs(d, exist_ok=True)
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = corpus.collect()
    by_url = {r["url"]: r for r in rows}

    def pid_of(url):
        # page ids: roots are http://h{h}.test (pid = h); others end /p{pid}
        if "/p" in url:
            return int(url.rsplit("/p", 1)[1])
        return int(url.split("http://h", 1)[1].split(".", 1)[0])

    files = []
    for i, (lo, hi) in enumerate(splits):
        sel = [r for r in rows if lo <= pid_of(r["url"]) < hi]
        t = pa.table(
            {
                "url": [r["url"] for r in sel],
                "warc_ts": [r["warc_ts"] for r in sel],
                "html": [bytes(r["html"]) for r in sel],
                "text": [r["text"] for r in sel],
                "lang": [r["lang"] for r in sel],
            }
        )
        f = os.path.join(d, f"chunk-{i:05d}.parquet")
        pq.write_table(t, f)
        os.utime(f, (1000000000 + i * 100, 1000000000 + i * 100))
        files.append(f)
    corpus.unpersist()
    return d, by_url


def _rank_from_url():
    """Canonical per-page rank: the corpus page number (roots rank with
    their host index, which is their page id)."""
    return F.coalesce(
        F.expr(r"try_cast(regexp_extract(url, '/p(\\d+)$', 1) as long)"),
        F.expr(r"try_cast(regexp_extract(url, '^http://h(\\d+)\\.test$', 1) as long)"),
    )


def test_stream_extract_matches_batch(spark, tmp_path):
    d, _ = _write_corpus_files(spark, tmp_path)
    batch = spark.read.parquet(d)
    want = {
        (r["uri"], r["url_key"], r["emit_ok"], r["enqueue_ok"])
        for r in extract_links_stream(batch, CFG, SEED).collect()
    }
    q = (
        extract_links_stream(stream_pages(spark, d), CFG, SEED)
        .writeStream.format("memory")
        .queryName("xstream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["uri"], r["url_key"], r["emit_ok"], r["enqueue_ok"])
        for r in spark.table("xstream").collect()
    }
    assert got == want and len(got) > 0


def test_discovery_incremental_and_idempotent(spark, tmp_path):
    """Two sequential drops; cross-batch seen state suppresses re-discovery,
    and the final discovered set equals the batch pipeline on all bytes."""
    from crawley_spark.operators.seen import first_occurrence

    d, _ = _write_corpus_files(spark, tmp_path)
    out = str(tmp_path / "disc")
    # stream 1: only the first file exists yet
    only_first = str(tmp_path / "drop")
    os.makedirs(only_first)
    import shutil

    shutil.copy(os.path.join(d, "chunk-00000.parquet"), only_first)
    q = run_discovery(stream_pages(spark, only_first), out, CFG, SEED)
    q.awaitTermination(120)
    disc1 = spark.read.parquet(os.path.join(out, "discovered")).collect()
    assert len(disc1) > 0
    # drop the second file, resume from the same checkpoint
    shutil.copy(os.path.join(d, "chunk-00001.parquet"), only_first)
    q = run_discovery(stream_pages(spark, only_first), out, CFG, SEED)
    q.awaitTermination(120)
    disc = spark.read.parquet(os.path.join(out, "discovered")).collect()

    keys = [r["url_key"] for r in disc]
    assert len(keys) == len(set(keys)), "a URL was discovered twice across batches"
    batch_cand = extract_links_stream(spark.read.parquet(d), CFG, SEED)
    want = {
        r["url_key"] for r in first_occurrence(batch_cand.filter(F.col("emit_ok"))).collect()
    }
    assert set(keys) == want
    # batch 2 discovered strictly new URLs only
    b1 = {r["url_key"] for r in disc1}
    b2 = {r["url_key"] for r in disc if r["batch_id"] > max(x["batch_id"] for x in disc1)}
    assert b1.isdisjoint(b2)


def test_pace_fetches_state_continues_across_batches(spark, tmp_path):
    """Per-host slots keep counting across micro-batches (state store), no
    gaps, no duplicates; schedule = slot * delay."""
    d, _ = _write_corpus_files(spark, tmp_path)
    delay = 250
    q = (
        pace_fetches(
            stream_pages(spark, d, max_files_per_trigger=1),
            delay_ms=delay,
            rank_col=_rank_from_url(),
        )
        .writeStream.format("memory")
        .queryName("paced")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("paced").collect()
    assert len(rows) == 40
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    assert len(by_host) == 3
    for host, hrows in by_host.items():
        slots = sorted(r["slot"] for r in hrows)
        assert slots == list(range(len(hrows))), (host, slots)
        for r in hrows:
            assert r["fetch_after_ms"] == r["slot"] * delay
        # slot order == rank order (batches arrive in rank order by mtime)
        in_rank = sorted(hrows, key=lambda r: (r["rank"], r["url"]))
        assert [r["slot"] for r in in_rank] == list(range(len(hrows)))


def test_pace_fetches_state_survives_restart(spark, tmp_path):
    """The per-host slot counter is restored from the streaming checkpoint
    across QUERY RESTARTS, not just across micro-batches of one run: a
    second availableNow query over a later file drop continues each host's
    slots where the first run stopped."""
    import shutil

    d, _ = _write_corpus_files(spark, tmp_path)
    drop = str(tmp_path / "drop")
    os.makedirs(drop)
    shutil.copy(os.path.join(d, "chunk-00000.parquet"), drop)
    ckpt = str(tmp_path / "ckpt")
    outp = str(tmp_path / "paced_out")

    def run():
        # file sink: the recoverable-sink path (memory sink cannot resume
        # from a checkpoint)
        q = (
            pace_fetches(stream_pages(spark, drop), delay_ms=100, rank_col=_rank_from_url())
            .writeStream.format("parquet")
            .option("path", outp)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.schema(
            "host string, url string, rank long, slot long, fetch_after_ms long"
        ).parquet(outp).collect()

    first = run()
    shutil.copy(os.path.join(d, "chunk-00001.parquet"), drop)
    both = run()
    seen_urls = {r["url"] for r in first}
    second = [r for r in both if r["url"] not in seen_urls]
    max1 = {}
    for r in first:
        max1[r["host"]] = max(max1.get(r["host"], -1), r["slot"])
    assert first and second
    for host, rows in _group(second).items():
        slots = sorted(r["slot"] for r in rows)
        start = max1.get(host, -1) + 1
        assert slots == list(range(start, start + len(rows))), (host, slots, start)


def _group(rows):
    by = {}
    for r in rows:
        by.setdefault(r["host"], []).append(r)
    return by


def test_host_window_metrics_matches_batch(spark, tmp_path):
    """Watermarked tumbling windows over event time == the batch windowed
    aggregation on the same bytes (complete mode flushes every window)."""
    d, _ = _write_corpus_files(spark, tmp_path)

    def with_ts(df):
        return df.withColumn(
            "warc_ts",
            F.timestamp_seconds(
                F.to_unix_timestamp(F.lit("2026-01-01 00:00:00")) + _rank_from_url() * 7
            ),
        )

    batch = (
        with_ts(spark.read.parquet(d))
        .withColumn(
            "host",
            F.regexp_extract(F.col("url"), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1),
        )
        .groupBy(F.window("warc_ts", "60 seconds").alias("win"), "host")
        .agg(F.count("*").alias("n_pages"), F.sum(F.length("html")).alias("n_bytes"))
        .select(F.col("win.start").alias("win_start"), "host", "n_pages", "n_bytes")
    )
    want = {tuple(r) for r in batch.collect()}
    q = (
        host_window_metrics(with_ts(stream_pages(spark, d)))
        .writeStream.format("memory")
        .queryName("hostwin")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.table("hostwin").collect()}
    assert got == want and len(got) > 1


def _write_doc_files(spark, tmp_path, texts_by_batch):
    """{batch_index: [(doc_id, text)]} → drop dir of mtime-ordered files."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "docs")
    os.makedirs(d, exist_ok=True)
    for i, rows in sorted(texts_by_batch.items()):
        t = pa.table(
            {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}
        )
        f = os.path.join(d, f"chunk-{i:05d}.parquet")
        pq.write_table(t, f)
        os.utime(f, (1500000000 + i * 100, 1500000000 + i * 100))
    return d


def _texts(n, tag):
    # long-ish distinct bodies so 5-shingle MinHash separates them cleanly
    return [
        f"document {tag} number {i} " + " ".join(f"w{tag}{i}x{j}" for j in range(40))
        for i in range(n)
    ]


def test_incremental_dedup_cross_batch(spark, tmp_path):
    """Exact duplicates arriving in a LATER batch are suppressed against the
    store of earlier kept docs; in-batch dups keep the smallest id."""
    from crawley_spark.streaming import run_incremental_dedup

    base = _texts(12, "a")
    batch0 = [(i, base[i]) for i in range(12)]
    # batch 1: 4 exact copies of batch-0 docs + 4 fresh + 1 in-batch dup pair
    fresh = _texts(4, "b")
    batch1 = (
        [(100 + i, base[i]) for i in range(4)]
        + [(200 + i, fresh[i]) for i in range(4)]
        + [(300, fresh[0])]
    )
    d = _write_doc_files(spark, tmp_path, {0: batch0, 1: batch1})
    out = str(tmp_path / "dedup")
    q = run_incremental_dedup(
        spark.readStream.schema("doc_id long, text string").option(
            "maxFilesPerTrigger", "1"
        ).parquet(d),
        out,
        threshold=0.9,
    )
    q.awaitTermination(180)
    kept = {r["doc_id"] for r in spark.read.parquet(os.path.join(out, "kept")).collect()}
    dups = {
        r["doc_id"]: r["dup_of"]
        for r in spark.read.parquet(os.path.join(out, "dups")).collect()
    }
    assert set(range(12)) <= kept
    for i in range(4):  # cross-batch exact copies suppressed, matched to originals
        assert 100 + i in dups and dups[100 + i] == i
    assert {200, 201, 202, 203} <= kept
    assert dups.get(300) == 200  # in-batch dup keeps the smaller id
    assert kept.isdisjoint(dups)


def test_incremental_dedup_replay_idempotent(spark, tmp_path):
    from crawley_spark.streaming import run_incremental_dedup

    batch0 = [(i, t) for i, t in enumerate(_texts(8, "c"))]
    batch1 = [(50 + i, t) for i, t in enumerate(_texts(8, "c"))]  # all dups
    d = _write_doc_files(spark, tmp_path, {0: batch0, 1: batch1})
    out = str(tmp_path / "dedup")

    def run():
        q = run_incremental_dedup(
            spark.readStream.schema("doc_id long, text string").option(
                "maxFilesPerTrigger", "1"
            ).parquet(d),
            out,
            threshold=0.9,
        )
        q.awaitTermination(180)
        return (
            sorted(
                (r["doc_id"], r["batch_id"])
                for r in spark.read.parquet(os.path.join(out, "kept")).collect()
            ),
            sorted(
                (r["doc_id"], r["dup_of"])
                for r in spark.read.parquet(os.path.join(out, "dups")).collect()
            ),
        )

    first = run()
    import shutil

    shutil.rmtree(os.path.join(out, "_checkpoint"))
    assert run() == first
    kept, dups = first
    assert [k for k, _ in kept] == list(range(8))
    assert [d_ for d_, _ in dups] == list(range(50, 58))


def _chain_texts():
    """Shared canonical chain fixture (pair graph exactly 5~9, 9~3, NO 5~3
    at threshold 0.70) — single definition in crawley_spark.fixtures so the
    oracle pin (__spark_entry__._q_stream_dedup) and these pair-level tests
    cannot desynchronize. a→id 5, b→id 9, c→id 3."""
    from crawley_spark.fixtures import chain_texts

    return chain_texts()


def test_incremental_dedup_keep_first_chain(spark, tmp_path):
    """VERDICT r04 "next" #2 pinned divergence: a similarity chain 5~9~3
    (5≁3) in ONE batch. The r03 one-pass rule kept {5, 3} (9 suppressed by
    5; 3's only pair is the larger id 9). The batch-twin component rule
    must keep exactly the component's min id: {3}, with 5 and 9 both
    attributed to keeper 3."""
    from crawley_spark.streaming import run_incremental_dedup

    a, b, c = _chain_texts()
    d = _write_doc_files(spark, tmp_path, {0: [(5, a), (9, b), (3, c)]})
    out = str(tmp_path / "dedup")
    q = run_incremental_dedup(
        spark.readStream.schema("doc_id long, text string").option(
            "maxFilesPerTrigger", "1"
        ).parquet(d),
        out,
        threshold=0.70,
    )
    q.awaitTermination(180)
    kept = {r["doc_id"] for r in spark.read.parquet(os.path.join(out, "kept")).collect()}
    dups = {
        r["doc_id"]: r["dup_of"]
        for r in spark.read.parquet(os.path.join(out, "dups")).collect()
    }
    assert kept == {3}
    assert dups == {5: 3, 9: 3}


def test_incremental_dedup_stream_equals_batch_consolidation(spark, tmp_path):
    """Stream≡batch parity (the updated r04 contract): a single micro-batch
    must reproduce consolidate_near_duplicates' keep/drop decisions exactly
    — same keeper per component, same suppressed set."""
    from crawley_spark.operators.cluster import consolidate_near_duplicates
    from crawley_spark.operators.dedup import near_duplicates_minhash
    from crawley_spark.streaming import run_incremental_dedup

    a, b, c = _chain_texts()
    fresh = _texts(3, "z")
    rows = [(5, a), (9, b), (3, c)] + [(20 + i, t) for i, t in enumerate(fresh)] + [
        (40, fresh[0])  # exact in-batch dup of 20
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    batch = {
        r["doc_id"]: (r["keep_id"], bool(r["is_kept"]))
        for r in consolidate_near_duplicates(
            docs, near_duplicates_minhash(docs, threshold=0.70)
        ).collect()
    }
    d = _write_doc_files(spark, tmp_path, {0: rows})
    out = str(tmp_path / "dedup")
    q = run_incremental_dedup(
        spark.readStream.schema("doc_id long, text string").option(
            "maxFilesPerTrigger", "1"
        ).parquet(d),
        out,
        threshold=0.70,
    )
    q.awaitTermination(180)
    kept = {r["doc_id"] for r in spark.read.parquet(os.path.join(out, "kept")).collect()}
    dups = {
        r["doc_id"]: r["dup_of"]
        for r in spark.read.parquet(os.path.join(out, "dups")).collect()
    }
    assert kept == {i for i, (_, k) in batch.items() if k}
    assert dups == {i: kid for i, (kid, k) in batch.items() if not k}


def test_incremental_dedup_store_anchored_component(spark, tmp_path):
    """A batch doc connected to the store only TRANSITIVELY (via another
    batch doc) is still suppressed — the whole component is anchored by the
    earlier-kept store doc. Batch 0 keeps text A (id 5). Batch 1 carries B
    (id 9, pairs with stored A and with C) and C (id 3, pairs with B only):
    both must be suppressed with dup_of = 5, even though min batch id is 3."""
    from crawley_spark.streaming import run_incremental_dedup

    a, b, c = _chain_texts()
    d = _write_doc_files(spark, tmp_path, {0: [(5, a)], 1: [(9, b), (3, c)]})
    out = str(tmp_path / "dedup")
    q = run_incremental_dedup(
        spark.readStream.schema("doc_id long, text string").option(
            "maxFilesPerTrigger", "1"
        ).parquet(d),
        out,
        threshold=0.70,
    )
    q.awaitTermination(180)
    kept = {r["doc_id"] for r in spark.read.parquet(os.path.join(out, "kept")).collect()}
    dups = {
        r["doc_id"]: r["dup_of"]
        for r in spark.read.parquet(os.path.join(out, "dups")).collect()
    }
    assert kept == {5}
    assert dups == {9: 5, 3: 5}


def test_incremental_dedup_null_id_and_exact_id_replay(spark, tmp_path):
    """r05 review fixes: (a) a NULL-id doc passes through as kept — it
    cannot participate in identity-keyed dedup — instead of vanishing from
    BOTH sinks (the component partition's NULL-propagating filters dropped
    it); (b) a later batch re-delivering an ALREADY-KEPT doc_id is routed to
    dups (dup_of = its own id, NULL est_jaccard: the (X, X) cross pair is a
    self-loop connected components drop) and its banded rows must NOT
    re-enter the store. Every processed doc lands in exactly one sink."""
    from crawley_spark.streaming import run_incremental_dedup

    base = _texts(4, "n")
    batch0 = [(i, base[i]) for i in range(4)] + [(None, base[0] + " nulltail")]
    batch1 = [(0, base[0]), (700, _texts(1, "fresh")[0])]  # replay of kept id 0
    d = _write_doc_files(spark, tmp_path, {0: batch0, 1: batch1})
    out = str(tmp_path / "dedup")
    q = run_incremental_dedup(
        spark.readStream.schema("doc_id long, text string").option(
            "maxFilesPerTrigger", "1"
        ).parquet(d),
        out,
        threshold=0.9,
    )
    q.awaitTermination(180)
    kept_rows = spark.read.parquet(os.path.join(out, "kept")).collect()
    dup_rows = spark.read.parquet(os.path.join(out, "dups")).collect()
    kept = {r["doc_id"] for r in kept_rows}
    assert kept == {0, 1, 2, 3, None, 700}
    assert len(kept_rows) == 6  # id 0 kept exactly once, not re-kept on replay
    assert [(r["doc_id"], r["dup_of"], r["est_jaccard"]) for r in dup_rows] == [
        (0, 0, None)
    ]
    assert len(kept_rows) + len(dup_rows) == len(batch0) + len(batch1)
    store = spark.read.parquet(os.path.join(out, "store"))
    # doc 0's banded rows were stored by batch 0 only — no replay inflation
    n_doc0 = store.filter(F.col("doc_id") == 0).count()
    n_doc0_b1 = (
        spark.read.parquet(os.path.join(out, "store", "batch=1"))
        .filter(F.col("doc_id") == 0)
        .count()
        if os.path.isdir(os.path.join(out, "store", "batch=1"))
        else 0
    )
    assert n_doc0 > 0 and n_doc0_b1 == 0
    # NULL-id doc is never banded into the store; replay added nothing
    assert store.select("doc_id").distinct().count() == 5


def test_incremental_dedup_store_cap(spark, tmp_path):
    """A degenerate stream (every doc identical) stops accreting store rows
    at the cap but keeps suppressing against the capped members."""
    from crawley_spark.streaming import run_incremental_dedup

    same = "identical boilerplate body " + " ".join(f"t{j}" for j in range(40))
    d = _write_doc_files(
        spark, tmp_path,
        {0: [(i, same) for i in range(30)], 1: [(100 + i, same) for i in range(30)]},
    )
    out = str(tmp_path / "dedup")
    q = run_incremental_dedup(
        spark.readStream.schema("doc_id long, text string").option(
            "maxFilesPerTrigger", "1"
        ).parquet(d),
        out,
        threshold=0.9,
        store_bucket_cap=3,
    )
    q.awaitTermination(180)
    kept = {r["doc_id"] for r in spark.read.parquet(os.path.join(out, "kept")).collect()}
    assert kept == {0}  # one survivor, everything else suppressed
    store = spark.read.parquet(os.path.join(out, "store")).groupBy("band", "bucket").count()
    assert store.agg(F.max("count")).collect()[0][0] <= 3
    import json

    meta0 = json.load(open(os.path.join(out, "_meta_batch_0.json")))
    assert meta0["store_truncated"] == 0  # only doc 0's rows were admitted


def test_discovery_batch_replay_is_idempotent(spark, tmp_path):
    """Re-running a batch id (crash-replay) rewrites the same directories
    instead of duplicating rows."""
    d, _ = _write_corpus_files(spark, tmp_path)
    out = str(tmp_path / "disc")
    q = run_discovery(stream_pages(spark, d), out, CFG, SEED)
    q.awaitTermination(120)
    before = sorted(
        (r["url_key"], r["batch_id"])
        for r in spark.read.parquet(os.path.join(out, "discovered")).collect()
    )
    # wipe the stream checkpoint: the whole input replays as fresh batches
    import shutil

    shutil.rmtree(os.path.join(out, "_checkpoint"))
    q = run_discovery(stream_pages(spark, d), out, CFG, SEED)
    q.awaitTermination(120)
    after = sorted(
        (r["url_key"], r["batch_id"])
        for r in spark.read.parquet(os.path.join(out, "discovered")).collect()
    )
    assert before == after
