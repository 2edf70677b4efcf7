"""Anchor-text aggregation: per-target link-text signals over a crawled
corpus.

For every URL the crawl discovered, what do other pages *call* it? The
per-target anchor-text profile is the classic web-search signal (BM25F's
anchor field; also the topical prior crawl frontiers rank with) and a
standard webtext-pipeline feature. The reference emits bare URLs only;
this operator runs the anchor kernel (kernels/anchorx.py) over the page
corpus and aggregates per target.

Scale shape (100 TB): extraction is one Arrow-batched pass over the pages
scan (the engine's extraction shape — html never crosses an exchange; the
kernel output rows are (url, short text) pairs). Aggregation is two
map-side-combined shuffles on (target, text) then target, both carrying
counts; the top-text argmax is a window over the *distinct-text* table
(bounded: one row per (target, text), not per anchor occurrence), ordered
(count DESC, text ASC) for a deterministic winner. Per-key state is
scalars — deliberately no collect_list of anchor texts.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PAIR_SCHEMA = "target_url string, anchor_text string"


def extract_anchor_pairs(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(target_url, anchor_text) rows from every page — one Arrow pass,
    hrefs resolved against each page's own URL via the engine's clean_url
    (frontier-identical URL set)."""
    from crawley_spark.kernels.anchorx import extract_anchors
    from crawley_spark.kernels.gourl import URLError, parse

    sel = df.select(F.col(url_col).alias("url"), F.col(html_col).alias("html"))

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            urls = batch.column("url").to_pylist()
            htmls = batch.column("html").to_pylist()
            rows = []
            for u, h in zip(urls, htmls):
                if h is None:
                    continue
                if isinstance(h, bytes):
                    h = h.decode("utf-8", "surrogateescape")
                try:
                    base = parse(u)
                except URLError:
                    continue
                rows.extend(
                    {"target_url": t, "anchor_text": txt}
                    for t, txt in extract_anchors(h, base)
                )
            if rows:
                yield pa.RecordBatch.from_pylist(
                    rows,
                    schema=pa.schema(
                        [("target_url", pa.string()), ("anchor_text", pa.string())]
                    ),
                )

    return sel.mapInArrow(run, _PAIR_SCHEMA)


def anchor_text_agg(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Per-target anchor profile: (target_url, n_anchors, n_unique_texts,
    top_text, top_text_count) with top_text = most frequent anchor text,
    ties broken bytewise-ascending (deterministic across partitionings)."""
    pairs = extract_anchor_pairs(df, url_col=url_col, html_col=html_col)
    per_text = pairs.groupBy("target_url", "anchor_text").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("target_url").orderBy(
        F.col("cnt").desc(), F.col("anchor_text").asc()
    )
    ranked = per_text.withColumn("rn", F.row_number().over(w))
    totals = per_text.groupBy("target_url").agg(
        F.sum("cnt").alias("n_anchors"),
        F.count(F.lit(1)).alias("n_unique_texts"),
    )
    top = ranked.filter(F.col("rn") == 1).select(
        "target_url",
        F.col("anchor_text").alias("top_text"),
        F.col("cnt").alias("top_text_count"),
    )
    return totals.join(top, "target_url").select(
        "target_url",
        F.col("n_anchors").cast("long").alias("n_anchors"),
        F.col("n_unique_texts").cast("long").alias("n_unique_texts"),
        "top_text",
        F.col("top_text_count").cast("long").alias("top_text_count"),
    )
