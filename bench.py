"""Benchmark harness.

Default mode: runs the headline operator queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) plus a synthetic-corpus crawl on
local[$SPARK_GRAFT_CPUS], printing ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ...,
     "crawl": {...frontier throughput details...}}

--crawl-only --cores N: run just the crawl at a given parallelism and print
its JSON (used by tools/scaling_bench.py for the N-vs-4N efficiency run).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "fetch_join",
    "seen_antijoin",
    "wave_dedup",
    "politeness_slots",
    "bfs_waves",
    "dedup_exact",
    "token_count",
    "lang_id",
    "fingerprint",
    "simhash",
    "minhash_dedup",
    "ann_brute",
    "ann_lsh",
    # r04 additions — new operators, timed for regression visibility; the
    # r03-comparable subset is everything above (BENCH.md round-4 notes)
    "near_dup_clusters",
    "bpe_tokens",
    # r05 additions (same policy)
    "gopher_quality",
    "gopher_repetition",
    "c4_lines",
    "pii_mask",
    "decontam_13gram",
    "c4_span_dedup",
    "source_quality",
    "prep_pipeline",
    "stratified_sample",
    "pack_shards",
    "warc_roundtrip",
    "normalize_text",
    "pagerank",
    "host_rank",
    "frontier_priority",
    "lm_perplexity",
    "line_dedup",
    "crawl_delta",
    "recrawl_priority",
    "url_canonical",
    "bm25",
    "sitemap_roundtrip",
    "vocab_topk",
    "split_assign",
    # closing-r05 additions (same policy — per-query regression visibility;
    # the earlier-round-comparable subsets are documented in BENCH.md)
    "semdedup",
    "substr_dedup",
    "temperature_mix",
    "crawl_traps",
    "fineweb_pipeline",
    "nb_classifier",
    "wet_roundtrip",
    "inverted_index",
    "hits_rank",
    "ppl_buckets",
    "bigram_lm",
    "scheduler_pipeline",
    "cdx_index",
    "cc_luhn",
    "warc_revisit",
    "redirects",
    "mime_sniff",
    "canonical_links",
    "cms_freq",
    "hll_distinct",
    "length_quantiles",
    "boilerpipe_blocks",
    "main_content",
    "char_entropy",
    "script_detect",
    "soft404",
    "url_diversity",
    "crawl_delay",
    "dup_by_source",
    "lang_confidence",
]


def _bench_minhash_dedup(spark, sf_dir):
    """Times the raw MinHash+LSH operator (planted near-dups, pair output).
    The queries() entry now wraps it in an oracle-checkable verification
    harness (joins vs brute md5 groups) — timing that would blend the
    verification joins into the operator number, so the bench keeps the
    r02-shape kernel."""
    from pyspark.sql import functions as F

    from crawley_spark.operators.dedup import near_duplicates_minhash

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = d.count()
    dup = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + n).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    cand = d.select("doc_id", "text").unionByName(dup)
    return near_duplicates_minhash(cand, threshold=0.5).select("doc_a", "doc_b")


def _bench_ann_lsh(spark, sf_dir):
    """Times the raw LSH ANN operator (the queries() entry now also runs
    brute force for the recall check)."""
    from pyspark.sql import functions as F

    from crawley_spark.operators.similarity import cosine_topk_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8)
    return cosine_topk_lsh(emb, queries, k=5).select("query_id", "neighbor_id", "rank")


def _bench_near_dup_clusters(spark, sf_dir):
    """Times the raw consolidation operator on a synthetic pair graph at
    20x the sf0.1 doc count (100k docs, ~45k in pairs: 1875 chains of 8 +
    300 stars of 100 — the small-diameter shape LSH pair generation
    actually emits; the adversarial long-chain case is pinned by
    tests/test_cluster.py's convergence-bound test instead), so the number
    measures the CC iterations and the keeper joins — not simhash pair
    generation, which the `simhash` entry already times. The queries()
    entry keeps the end-to-end oracle shape."""
    from pyspark.sql import functions as F

    from crawley_spark.operators.cluster import consolidate_near_duplicates

    docs = spark.range(100_000).select(F.col("id").alias("doc_id"))
    chains = (
        spark.range(1875 * 8)
        .select(
            F.col("id").alias("doc_a"),
            (F.col("id") + 1).alias("doc_b"),
        )
        .filter((F.col("id") % 8) != 7)  # break chains every 8 nodes
    )
    stars = spark.range(1875 * 8, 1875 * 8 + 300 * 100).select(
        ((F.col("id") - 1875 * 8) / 100).cast("long").alias("hub"),
        F.col("id").alias("doc_b"),
    ).select((F.lit(1875 * 8) + F.col("hub") * 100).alias("doc_a"), "doc_b")
    pairs = chains.unionByName(stars)
    return consolidate_near_duplicates(docs, pairs)


def _bench_bpe_tokens(spark, sf_dir):
    """Times the raw merge-table BPE encode over the documents table (the
    queries() entry adds the planted/roundtrip verification harness)."""
    from crawley_spark.operators.textstats import bpe_token_stats

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bpe_token_stats(d.select("doc_id", "text"))


BENCH_OVERRIDES = {
    "minhash_dedup": _bench_minhash_dedup,
    "ann_lsh": _bench_ann_lsh,
    "near_dup_clusters": _bench_near_dup_clusters,
    "bpe_tokens": _bench_bpe_tokens,
}

CRAWL_PAGES_PER_DOC = 4  # corpus pages per documents row at the bench sf

STREAM_BATCHES = 8


def run_stream_bench(spark, n_pages: int = 8000, n_batches: int = STREAM_BATCHES) -> dict:
    """Micro-batch ingestion throughput (VERDICT r03 "next" #8): pages/s
    through streaming run_discovery — synth corpus written as ``n_batches``
    parquet drop files, availableNow + maxFilesPerTrigger=1 so every file is
    its own micro-batch (extraction UDF + in-batch dedup + anti-join against
    all previous batches' seen dirs + idempotent two-sink write, per batch).
    Timed from query start to drain; corpus materialization is excluded."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from crawley_spark.config import CrawlConfig
    from crawley_spark.corpus import synth_corpus
    from crawley_spark.streaming import run_discovery, stream_pages

    drop = tempfile.mkdtemp(prefix="crawley_stream_bench_in_")
    out = tempfile.mkdtemp(prefix="crawley_stream_bench_out_")
    try:
        synth_corpus(spark, n_pages=n_pages, n_hosts=20).repartition(
            n_batches
        ).write.mode("overwrite").parquet(drop)
        t0 = time.monotonic()
        q = run_discovery(
            stream_pages(spark, drop, max_files_per_trigger=1),
            out,
            CrawlConfig(depth=-1, no_head=True),
            "http://h0.test/",
        )
        q.awaitTermination()
        wall = time.monotonic() - t0
        disc = spark.read.parquet(os.path.join(out, "discovered"))
        n_disc = disc.count()
        n_b = disc.select(F.countDistinct("batch_id")).collect()[0][0]
        return {
            "pages": n_pages,
            "batches": int(n_b),
            "discovered": int(n_disc),
            "wall_sec": round(wall, 3),
            "pages_per_sec": round(n_pages / wall, 1),
        }
    finally:
        shutil.rmtree(drop, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def run_crawl(spark, n_pages: int, seed_hosts: int = 2, links_per_page: int = 8, body_words: int = 24, n_hosts: int = 20, warmup: bool = False, corpus_parquet: str | None = None):
    """Synthetic-corpus crawl; returns throughput stats. warmup=True first
    runs a small crawl to warm python workers/JIT (the headline metric is
    *sustained* throughput). corpus_parquet: read the corpus from a
    pre-materialized parquet (identical input bytes across runs of a scaling
    pair — and corpus *generation* stops consuming the measured session's
    cores) instead of synthesizing in-session."""
    from pyspark.sql import functions as F

    from crawley_spark.config import CrawlConfig
    from crawley_spark.corpus import synth_corpus
    from crawley_spark.engine import crawl

    from crawley_spark.sources.pages import normalize_pages, prepare_pages

    if corpus_parquet:
        # pre-bucketed-table stand-in: no repartition (the fetch join
        # broadcasts the frontier side; corpus partitioning = file splits),
        # just the column projection + cache an Iceberg scan would give
        pages = normalize_pages(spark.read.parquet(corpus_parquet)).persist()
    else:
        pages = synth_corpus(
            spark, n_pages=n_pages, n_hosts=n_hosts,
            links_per_page=links_per_page, body_words=body_words,
        )
        # one-time corpus prep (bucket-by-url + persist), excluded from crawl
        # time like a pre-bucketed Iceberg table would be
        pages = prepare_pages(pages)
    n_corpus = pages.count()
    if warmup:
        wpages = prepare_pages(synth_corpus(spark, n_pages=4000, n_hosts=8, links_per_page=8, body_words=24))
        wreport = crawl(spark, wpages, {"w0": "http://h0.test"}, CrawlConfig(depth=-1, no_head=True))
        wreport.state.cleanup()
        wpages.unpersist()
    seeds = {f"h{i}": f"http://h{i}.test" for i in range(seed_hosts)}
    t0 = time.monotonic()
    report = crawl(spark, pages, seeds, CrawlConfig(depth=-1, no_head=True))
    wall = time.monotonic() - t0
    m = {
        r["metric"]: r["value"]
        for r in report.metrics().groupBy("metric").sum("value").collect()
        for r in [{"metric": r["metric"], "value": r["sum(value)"]}]
    }
    frontier_urls = int(m.get("frontier_in", 0)) + int(m.get("bootstrap_frontier", 0))
    candidates = int(m.get("candidates", 0))
    emitted = int(m.get("emitted", 0))
    pages.unpersist()
    stats = {
        "corpus_pages": n_corpus,
        "iterations": report.iterations,
        "frontier_urls": frontier_urls,
        "candidates": candidates,
        "emitted": emitted,
        "wall_sec": round(wall, 2),
        "frontier_urls_per_sec": round(frontier_urls / wall, 1),
        "candidates_per_sec": round(candidates / wall, 1),
    }
    report.state.cleanup()
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--crawl-only", action="store_true")
    ap.add_argument("--corpus-parquet", default=None, help="crawl a pre-materialized corpus parquet")
    ap.add_argument("--synth-corpus-out", default=None, help="synthesize the corpus, write parquet, exit")
    ap.add_argument("--crawl-pages", type=int, default=0)
    ap.add_argument("--links-per-page", type=int, default=8)
    ap.add_argument("--body-words", type=int, default=24)
    ap.add_argument("--seed-hosts", type=int, default=2)
    ap.add_argument("--n-hosts", type=int, default=20)
    ap.add_argument("--warmup", action="store_true")
    args = ap.parse_args()

    from crawley_spark.session import get_spark

    # Python-UDF-heavy stages stop scaling past ~16 concurrent workers on one
    # socket (each worker pairs with a JVM feeder thread; beyond ~16 the
    # 2×parallelism thread count oversubscribes the machine). Cap the
    # *partition*-driven concurrency at that ceiling while keeping all cores
    # for JVM stages (ADVICE r01: cores//2 neither implemented the ceiling
    # at 64 cores nor at 20).
    sp = min(16, args.cores)
    spark = get_spark("crawley-bench", cores=args.cores, shuffle_partitions=sp)
    spark.sparkContext.setLogLevel("ERROR")

    # Spawn + warm the Arrow python workers in the background NOW: the
    # corpus prep below is JVM-only, so the ~4-5 s per-session python-worker
    # cold start (32 process spawns + pandas/kernel imports) fully overlaps
    # it instead of landing inside the first measured crawl wave.
    from crawley_spark.engine import _start_python_worker_prewarm

    _start_python_worker_prewarm(spark)

    import duckdb

    n_docs = duckdb.connect().execute(
        f"select count(*) from '{args.sf_dir}/documents.parquet'"
    ).fetchone()[0]
    n_pages = args.crawl_pages or max(4000, n_docs * CRAWL_PAGES_PER_DOC)

    sf = args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    if args.synth_corpus_out:
        from crawley_spark.corpus import synth_corpus

        synth_corpus(
            spark, n_pages=n_pages, n_hosts=args.n_hosts,
            links_per_page=args.links_per_page, body_words=args.body_words,
        ).write.mode("overwrite").parquet(args.synth_corpus_out)
        print(json.dumps({"corpus_out": args.synth_corpus_out, "pages": n_pages}))
        return
    if args.crawl_only:
        stats = run_crawl(
            spark, n_pages, seed_hosts=args.seed_hosts,
            links_per_page=args.links_per_page, body_words=args.body_words,
            n_hosts=args.n_hosts, warmup=args.warmup,
            corpus_parquet=args.corpus_parquet,
        )
        print(json.dumps({"cores": args.cores, "sf": sf, **stats}))
        return

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    timings = {}
    total0 = time.monotonic()
    # Disclosed session warmup: JVM codegen, parquet footer caches, Arrow
    # python workers. COUNTED IN THE TOTAL (cross-round totals stay
    # comparable — in earlier rounds this cost sat inside the first query's
    # number) but reported separately so per-query timings mean the
    # operator, not the session cold start.
    def _wu(batches):
        import numpy  # noqa: F401  (the minhash/ANN stages' heavy import)

        for pdf in batches:
            yield pdf

    docs_wu = spark.read.parquet(f"{args.sf_dir}/documents.parquet").limit(256)
    docs_wu.mapInPandas(_wu, docs_wu.schema).write.format("noop").mode("overwrite").save()
    spark.range(1_000_000).selectExpr("sum(id) s").collect()
    warmup_sec = round(time.monotonic() - total0, 3)
    for name in HEADLINE:
        t0 = time.monotonic()
        df = BENCH_OVERRIDES.get(name, qs[name])(spark, args.sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.monotonic() - t0, 3)
    crawl_stats = run_crawl(spark, n_pages)
    timings["crawl_bfs_synth"] = crawl_stats["wall_sec"]
    total = time.monotonic() - total0
    # Streaming ingestion throughput (VERDICT r03 #8) — measured OUTSIDE the
    # headline total so cross-round totals stay comparable (this stage did
    # not exist before r04); reported under its own key.
    stream_stats = run_stream_bench(spark, n_pages=min(n_pages, 8000))
    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_crawl_total",
                "value": round(total, 2),
                "unit": "sec",
                "session_warmup_sec": warmup_sec,
                "queries": timings,
                "sf": sf,
                "crawl": crawl_stats,
                "stream": stream_stats,
            }
        )
    )


if __name__ == "__main__":
    main()
