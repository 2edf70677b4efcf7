"""Physical-plan quality gates (the 100-TB story, asserted on .explain).

These tests pin the plan properties the engine's scale design depends on,
so a refactor that silently regresses them fails CI rather than a cluster:

* corpus column pruning — the fetch join's parquet scan must read only
  (url, html, content_type, status), never text/lang (normalize_pages);
* small frontiers broadcast into the fetch join (no corpus shuffle);
* the canonical index pass never uses repartitionByRange (its boundary
  sampling would execute the whole wave plan twice);
* the seen read path prunes to the requested buckets (driver-side dir
  pruning on the bucket-partitioned compacted snapshot).
"""

import datetime
import os

from pyspark.sql import functions as F


def _fmt_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _write_corpus(spark, tmp_path):
    rows = [
        (
            f"http://h0.test/p{i}",
            datetime.datetime(2026, 1, 1),
            f'<html><body><a href="/p{i + 1}">x</a> body {i}</body></html>'.encode(),
            f"x body {i}",
            "en",
        )
        for i in range(20)
    ]
    path = os.path.join(str(tmp_path), "pages.parquet")
    spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    ).write.parquet(path)
    return path


def test_fetch_join_prunes_corpus_columns(spark, tmp_path):
    """ReadSchema of the corpus scan must exclude text/lang: a scan reading
    all 5 columns for the 4-column fetch join is wrong (pages.py contract)."""
    from crawley_spark.sources.pages import normalize_pages

    path = _write_corpus(spark, tmp_path)
    pages_n = normalize_pages(spark.read.parquet(path))
    frontier = spark.createDataFrame(
        [("r0", 0, "http://h0.test/p1")], "run_id string, rank long, url string"
    )
    joined = F.broadcast(frontier).join(pages_n, on="url", how="inner")
    plan = _fmt_plan(joined)
    scan = [
        block
        for block in plan.split("\n\n")
        if "Scan parquet" in block and "ReadSchema" in block
    ]
    assert scan, plan
    read_schema = [l for l in scan[0].splitlines() if "ReadSchema" in l][0]
    assert "url" in read_schema and "html" in read_schema
    assert "text" not in read_schema and "lang" not in read_schema


def test_fetch_join_broadcasts_small_frontier(spark, tmp_path):
    from crawley_spark.sources.pages import normalize_pages

    path = _write_corpus(spark, tmp_path)
    pages_n = normalize_pages(spark.read.parquet(path))
    frontier = spark.createDataFrame(
        [("r0", 0, "http://h0.test/p1")], "run_id string, rank long, url string"
    )
    plan = _fmt_plan(F.broadcast(frontier).join(pages_n, on="url", how="inner"))
    assert "BroadcastHashJoin" in plan
    # the corpus side must not shuffle for a broadcast fetch join
    assert "Exchange hashpartitioning(url" not in plan


def test_index_pass_has_no_range_repartition(spark):
    """assign_flagged_indexes_bucketed computes range boundaries
    arithmetically from driver-known spans — repartitionByRange's sampling
    pass (which would execute the wave plan twice) must never appear."""
    from crawley_spark.plans.ordering import assign_flagged_indexes_bucketed

    df = spark.createDataFrame(
        [("r0", i, i % 3, i % 2 == 0, True) for i in range(30)],
        "run_id string, parent_rank long, ord long, emit_ok boolean, enqueue_ok boolean",
    )
    out, counts, rows = assign_flagged_indexes_bucketed(
        df,
        ["parent_rank", "ord"],
        ["emit_ok", "enqueue_ok"],
        {"emit_ok": {}, "enqueue_ok": {}},
        {"r0": (0, 30)},
        num_buckets=8,
    )
    assert rows == 30
    plan = _fmt_plan(out)
    assert "rangepartitioning" not in plan.lower()
    # dense per-run indexes came out right (0-based, canonical order)
    got = [r["idx_enqueue_ok"] for r in out.orderBy("parent_rank", "ord").collect()]
    assert got == list(range(30))
    assert counts["enqueue_ok"] == {"r0": 30}


def test_seen_read_prunes_buckets(spark, tmp_path):
    """state.seen(buckets=...) must list only the matching pb= leaf dirs of
    the compacted snapshot — the bucket-pruned anti-join's seen-side scan is
    O(touched shards), not O(seen)."""
    from crawley_spark.sources.state import SEEN_SCHEMA, CrawlState, with_bucket

    state = CrawlState(spark, os.path.join(str(tmp_path), "state"))
    rows = [("r0", f"http://h.test/p{i}", f"http://h.test/p{i}") for i in range(200)]
    df = with_bucket(
        spark.createDataFrame(rows, "run_id string, url_key string, url string")
    ).select(*[f.name for f in SEEN_SCHEMA.fields])
    state.write_seen(1, df)
    state.compact_seen(1)
    state.commit(1, {}, {}, done=False, seen_compact=1)

    all_dirs = state.seen_dirs(1)
    pruned = state.seen_dirs(1, buckets=[3, 7])
    assert len(pruned) <= 2 < len(all_dirs)
    assert all(d.endswith(("pb=3", "pb=7")) for d in pruned)
    # pruned read returns exactly the rows of those buckets
    want = df.filter(F.col("bucket").isin(3, 7)).count()
    got = state.seen(upto=1, buckets=[3, 7]).count()
    assert got == want > 0


def _dedup_exchange_blocks(plan: str, key: str) -> list:
    """Formatted-plan blocks for Exchange nodes partitioned on the candidate
    dedup keys (query_id/doc_a...)."""
    return [
        b
        for b in plan.split("\n\n")
        if "Exchange" in b and f"hashpartitioning({key}" in b
    ]


def test_gopher_repetition_single_scan_no_shuffle(spark, tmp_path):
    """gopher_repetition is per-row arithmetic: the plan must be one pruned
    two-column parquet scan (doc_id, text) with zero Exchange — the
    property that makes it trivially 100-TB-parallel. The SQL impl never
    shuffles; the Arrow impl may widen a NARROW input (the bench-corpus
    case, widen_narrow_input) but must pass a properly-partitioned input
    through unshuffled — both pinned here."""
    from crawley_spark.operators.textstats import gopher_repetition

    path = os.path.join(str(tmp_path), "docs.parquet")
    spark.createDataFrame(
        [(i, f"w{i} w{i + 1} w{i} text", "en") for i in range(200)],
        "doc_id long, text string, lang string",
    ).write.parquet(path)
    df_sql = gopher_repetition(spark.read.parquet(path), impl="sql")
    plan = _fmt_plan(df_sql)
    assert "Exchange" not in plan, plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and "lang" not in read_schema[0], plan
    # arrow impl over a wide input (>= shuffle width files): no Exchange
    wide_path = os.path.join(str(tmp_path), "docs_wide.parquet")
    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    spark.read.parquet(path).repartition(target + 1).write.parquet(wide_path)
    df_arrow = gopher_repetition(spark.read.parquet(wide_path), impl="arrow")
    plan_wide = _fmt_plan(df_arrow)
    assert "Exchange" not in plan_wide, plan_wide
    read_schema = [l for l in plan_wide.splitlines() if "ReadSchema" in l]
    assert read_schema and "lang" not in read_schema[0], plan_wide


def test_decontam_probe_join_broadcasts(spark, tmp_path):
    """ngram_decontaminate's probe join must be a broadcast hash join (the
    corpus side is never shuffled on n-gram content) and the only hash
    exchange in the plan carries (doc_id, count) partial aggregates —
    never the exploded n-gram/key column."""
    from crawley_spark.operators.decontam import ngram_decontaminate

    path = os.path.join(str(tmp_path), "docs.parquet")
    spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(20))) for i in range(30)],
        "doc_id long, text string",
    ).write.parquet(path)
    docs = spark.read.parquet(path)
    probes = docs.filter(F.col("doc_id") < 2)
    plan = _fmt_plan(ngram_decontaminate(docs, probes, n=13))
    assert "BroadcastHashJoin" in plan, plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "k#" not in line and "g#" not in line, line


def test_sampling_plan_shapes(spark, tmp_path):
    """stratified_sample is zero-shuffle column math; pack_token_shards'
    running sum must window over the BUCKET key — never the
    single-partition global sort Spark uses for a partitionless window."""
    from crawley_spark.operators.sampling import pack_token_shards, stratified_sample

    path = os.path.join(str(tmp_path), "docs.parquet")
    spark.createDataFrame(
        [(i, f"s{i % 3}", 10 + i % 7) for i in range(300)],
        "doc_id long, source string, n_tokens long",
    ).write.parquet(path)
    docs = spark.read.parquet(path)
    plan = _fmt_plan(stratified_sample(docs, rates={"s0": 0.5}))
    assert "Exchange" not in plan, plan
    plan2 = _fmt_plan(pack_token_shards(docs, budget=100, n_buckets=8))
    assert "Window" in plan2, plan2
    # every window/sort partitions by the bucket key — no SinglePartition
    assert "SinglePartition" not in plan2, plan2


def test_ann_candidate_dedup_exchange_carries_no_vectors(spark):
    """VERDICT r03 "what's wrong" #1: scoring happens before the candidate
    dedup, so the dedup exchange of cosine_topk_lsh / cosine_topk_ivf /
    near_duplicates_embedding(lsh) must carry only scalar columns — never a
    unit-vector array (dim×8 B per row at 100 TB)."""
    from crawley_spark.operators.dedup import near_duplicates_embedding
    from crawley_spark.operators.similarity import cosine_topk_ivf, cosine_topk_lsh

    emb = spark.createDataFrame(
        [(i, [float(i % 7) + 0.1, float(i % 5), 1.0, float(i % 3)]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    queries = emb.filter(F.col("vec_id") < 3)

    for df, keys in (
        (cosine_topk_lsh(emb, queries, k=3), "query_id"),
        (cosine_topk_ivf(emb, queries, k=3, n_cells=4, nprobe=2, sample=40), "query_id"),
        (near_duplicates_embedding(emb, threshold=0.9, method="lsh"), "doc_a"),
    ):
        plan = _fmt_plan(df)
        blocks = _dedup_exchange_blocks(plan, keys)
        assert blocks, plan  # the dedup exchange must exist
        for b in blocks:
            input_lines = [l for l in b.splitlines() if l.startswith("Input")]
            assert input_lines, b
            for l in input_lines:
                assert "cv#" not in l and "qv#" not in l, b
                assert "ua#" not in l and "ub#" not in l and "unit#" not in l, b


def test_lm_perplexity_plan_shapes(spark, tmp_path):
    """The LM scoring join must broadcast the (bounded) model — a shuffled
    join would exchange the full exploded token stream twice — and the
    parquet scan must prune to (doc_id, text)."""
    import os

    from crawley_spark.operators.lmscore import lm_perplexity

    path = os.path.join(str(tmp_path), "docs.parquet")
    spark.createDataFrame(
        # letter-distinct tokens (the [a-z]+ tokenizer strips digits, so
        # "w0".."w8" would collapse to one type and defeat the cap check)
        [(i, " ".join(chr(97 + j) * 3 for j in range(i % 9)), "x" * i) for i in range(50)],
        "doc_id long, text string, extra string",
    ).write.parquet(path)
    docs = spark.read.parquet(path)
    plan = _fmt_plan(lm_perplexity(docs))
    assert "BroadcastHashJoin" in plan, plan
    # column pruning: the untouched 'extra' column never leaves the scan
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "extra" not in line, line
    # past the broadcast cap the operator must NOT hint a broadcast of an
    # unbounded model (Spark's size-aware auto-broadcast may still fire for
    # genuinely small models — disable it to observe the hint alone)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan_hint = _fmt_plan(lm_perplexity(docs))
        assert "BroadcastHashJoin" in plan_hint, plan_hint  # explicit hint
        plan_big = _fmt_plan(lm_perplexity(docs, max_vocab_broadcast=1))
        assert "SortMergeJoin" in plan_big or "ShuffledHashJoin" in plan_big, plan_big
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
