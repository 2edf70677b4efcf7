"""Structured Streaming operators over the pages corpus.

Four surfaces, each the incremental twin of an existing batch operator:

* :func:`stream_pages` — file-source stream of the BASELINE.json input_hint
  table ``(url, warc_ts, html, text, lang)``: a fetch tier appends parquet
  files to a directory; each micro-batch is the newly-arrived files.
* :func:`extract_links_stream` — the engine's Arrow extraction UDF
  (functions/extract_udf.py — X1-X6/N1-N3/P1-P10 in one Python stage) mapped
  over the page stream. ``mapInArrow`` composes with streaming unchanged,
  so the batch and streaming paths share one kernel byte-for-byte.
* :func:`run_discovery` — ``foreachBatch`` incremental URL discovery: per
  micro-batch extract → in-batch first-occurrence dedup → anti-join against
  the accumulated seen set → append newly-discovered URLs. Batch-id-keyed
  overwrites make every batch idempotent (a replayed batch rewrites the same
  directories), mirroring the batch engine's checkpoint-commit discipline.
* :func:`pace_fetches` — per-host politeness pacing as a *stateful*
  streaming operator (``applyInPandasWithState``): each host's fetch slots
  continue across micro-batches from persisted state, the streaming twin of
  operators/politeness.py's windowed slot assignment (Q2). Reference
  semantics: one fetch per host per ``delay`` tick (crawley's
  ``-delay`` / client.go rate gate), here as an explicit schedule column.
* :func:`host_window_metrics` — watermarked tumbling-window per-host fetch
  metrics over event time (``warc_ts``), the streaming twin of the metrics
  sink (S2). Late pages beyond the watermark are dropped by Spark's state
  eviction instead of growing unbounded window state.

Scale notes (the 100 TB shape): extraction is map-side only — no shuffle
enters until the per-batch ``first_occurrence`` groupBy, whose map-side
partial aggregation bounds the shuffle at unique-keys-per-batch. The seen
anti-join reads the accumulated seen store once per batch; at the 10^10-URL
design point that store would be the engine's bucket-partitioned CrawlState
table (bucket-pruned semi-join, sources/state.py) rather than a flat
directory — the layout here keeps the sandbox dependency-free, the join
shape is identical. Politeness state is one long per (run, host): Spark
keeps it in the state store, sized by distinct hosts, not by traffic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import CrawlConfig
from ..functions.extract_udf import CANDIDATES_SCHEMA, build_extract_candidates
from ..kernels import robotsx
from ..sources.pages import PAGES_SCHEMA


def stream_pages(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of pages parquet dropped into ``path``.

    ``max_files_per_trigger`` bounds micro-batch size (files are the unit of
    arrival); ``availableNow`` triggers drain the backlog in bounded batches
    and stop — the pattern every test and the correctness harness use."""
    r = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.parquet(path)


def _with_host(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """JVM-side host projection for metrics/pacing (no Python stage)."""
    return pages.withColumn(
        "host", F.lower(F.regexp_extract(F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    )


def extract_links_stream(
    pages: DataFrame,
    config: CrawlConfig,
    seed: str,
    run_id: str = "stream",
    robots: "robotsx.RobotsTXT | None" = None,
    rank_col=None,
) -> DataFrame:
    """Candidate links from a page stream — the batch engine's extraction
    UDF over streaming micro-batches. Returns CANDIDATES_SCHEMA rows.

    ``robots`` defaults to allow-all: a stream has no synchronous way to
    fetch the seed's robots.txt mid-plan; pass the parsed rules in (the
    batch engine's ``_collect_robots`` result) when they matter.

    ``rank_col`` is the candidate's ``parent_rank`` — the canonical-order
    tie-break the dedup uses. A stream has no BFS wave rank, so the default
    is ``xxhash64(url)``: deterministic and stable across replays (a given
    page always ranks the same), which keeps first-occurrence dedup
    reproducible; pass e.g. an arrival sequence column for arrival-order
    semantics."""
    cfg = config.validated()
    rules = robots if robots is not None else robotsx.allow_all()
    fn = build_extract_candidates({run_id: cfg}, {run_id: seed}, {run_id: rules})
    rank = rank_col if rank_col is not None else F.xxhash64(F.col("url"))
    prep = pages.select(
        F.lit(run_id).alias("run_id"),
        rank.cast("long").alias("rank"),
        F.col("url"),
        F.col("html").cast("binary").alias("html"),
        (
            F.col("content_type")
            if "content_type" in pages.columns
            else F.lit(None).cast("string")
        ).alias("content_type"),
    )
    return prep.mapInArrow(fn, CANDIDATES_SCHEMA)


DISCOVERED_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("url_key", T.StringType()),
        T.StructField("uri", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("batch_id", T.LongType()),
    ]
)


def run_discovery(
    pages_stream: DataFrame,
    out_dir: str,
    config: CrawlConfig,
    seed: str,
    run_id: str = "stream",
    robots: "robotsx.RobotsTXT | None" = None,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
):
    """Incremental URL discovery over a page stream via ``foreachBatch``.

    Every micro-batch: extract candidates (emit-eligible ones), dedup to
    the canonical first occurrence within the batch, anti-join against the
    union of all PREVIOUS batches' seen directories, then write

        ``{out_dir}/discovered/batch={id}/``  (newly-discovered URLs)
        ``{out_dir}/seen/batch={id}/``        ((run_id, url_key) delta)

    with ``mode=overwrite`` keyed by ``batch_id`` — a replayed batch (crash
    between sink write and checkpoint commit) rewrites the same directories,
    so the sink is effectively exactly-once without a transactional store.
    The anti-join reads only batches ``< batch_id``, so a replay cannot
    suppress its own rows.

    Returns the started StreamingQuery; with ``available_now`` the caller
    should ``awaitTermination()`` and then read ``{out_dir}/discovered``.
    """
    from ..operators.seen import anti_join_seen, first_occurrence

    spark = pages_stream.sparkSession
    ckpt = checkpoint_dir or os.path.join(out_dir, "_checkpoint")
    seen_root = os.path.join(out_dir, "seen")
    disc_root = os.path.join(out_dir, "discovered")
    seen_key_schema = "run_id string, url_key string"

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        cand = extract_links_stream(batch_df, config, seed, run_id=run_id, robots=robots)
        firsts = first_occurrence(cand.filter(F.col("emit_ok")))
        prev = [
            os.path.join(seen_root, d)
            for d in (os.listdir(seen_root) if os.path.isdir(seen_root) else [])
            if d.startswith("batch=") and int(d.split("=", 1)[1]) < batch_id
        ]
        if prev:
            seen = spark.read.schema(seen_key_schema).parquet(*prev)
            new = anti_join_seen(firsts, seen)
        else:
            new = firsts
        # host of the DISCOVERED url (candidates' own `host` field is the
        # politeness host, set only for in-scope/enqueueable URLs)
        out = _with_host(new.drop("host"), url_col="uri").select(
            "run_id", "url_key", F.col("uri"), F.col("host"), F.lit(batch_id).alias("batch_id")
        )
        # localCheckpoint: one pass computes both writes (extraction is the
        # expensive stage; without the cut the second write re-runs it).
        out = out.localCheckpoint(eager=True)
        out.write.mode("overwrite").parquet(os.path.join(disc_root, f"batch={batch_id}"))
        out.select("run_id", "url_key").write.mode("overwrite").parquet(
            os.path.join(seen_root, f"batch={batch_id}")
        )

    w = pages_stream.writeStream.foreachBatch(handle).option("checkpointLocation", ckpt)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


PACED_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("rank", T.LongType()),
        T.StructField("slot", T.LongType()),
        T.StructField("fetch_after_ms", T.LongType()),
    ]
)

_PACE_STATE_SCHEMA = T.StructType([T.StructField("last_slot", T.LongType())])


def pace_fetches(
    pages: DataFrame, delay_ms: int = 1000, rank_col=None
) -> DataFrame:
    """Per-host politeness pacing as a stateful streaming operator (Q2's
    streaming twin). Each host's fetches get consecutive slots 0,1,2,…
    CONTINUING ACROSS MICRO-BATCHES — the last assigned slot per host lives
    in the streaming state store (one long per host, checkpointed, restored
    on restart). ``fetch_after_ms = slot * delay_ms`` is the schedule the
    politeness budget implies (reference: one request per host per delay).

    Within a batch, a host's rows are ordered by ``(rank, url)`` — with the
    default ``rank_col`` (monotonic per-file arrival is not exposed by the
    file source, so the caller picks the canonical rank; tests use the
    corpus's page number) the slot assignment is deterministic and
    batch-split-invariant: slots depend only on each row's rank order, not
    on where micro-batch boundaries fall, provided batches arrive in rank
    order (file drops are sequenced by the fetch tier)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    rank = rank_col if rank_col is not None else F.xxhash64(F.col("url"))
    prep = _with_host(pages).select(
        "host", "url", rank.cast("long").alias("rank")
    )

    def fn(key, pdfs, state):
        import pandas as pd

        last = state.get[0] if state.exists else -1
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["rank", "url"], kind="mergesort").reset_index(drop=True)
        slots = list(range(last + 1, last + 1 + len(pdf)))
        pdf["slot"] = slots
        pdf["fetch_after_ms"] = pdf["slot"] * delay_ms
        if slots:
            state.update((int(slots[-1]),))
        yield pdf[["host", "url", "rank", "slot", "fetch_after_ms"]]

    return prep.groupBy("host").applyInPandasWithState(
        fn, PACED_SCHEMA, _PACE_STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )


def host_window_metrics(
    pages: DataFrame,
    window: str = "60 seconds",
    watermark: str = "120 seconds",
    event_col: str = "warc_ts",
) -> DataFrame:
    """Watermarked tumbling-window per-host fetch metrics (S2's streaming
    twin): pages and bytes fetched per host per event-time window. The
    watermark bounds window state — hosts × active windows, with closed
    windows evicted — instead of unbounded accumulation."""
    return (
        _with_host(pages)
        .withWatermark(event_col, watermark)
        .groupBy(F.window(F.col(event_col), window).alias("win"), F.col("host"))
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.length(F.col("html"))).alias("n_bytes"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("host"),
            F.col("n_pages"),
            F.col("n_bytes"),
        )
    )
