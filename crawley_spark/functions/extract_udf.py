"""Arrow-batched page-extraction UDF (X1-X6 + N1-N3 + P1-P10 in one pass).

``mapInPandas`` over the fetch join's output: each batch of (run_id, rank,
url, html, content_type) rows becomes a batch of classified link candidates.
One Python stage per iteration — extraction, canonicalization, hashing-key
projection and all per-candidate predicates happen here so everything else
in the iteration stays JVM-side (joins, windows, writes).

Config + robots rules are closure-captured (driver-known, static per crawl —
no per-row config columns crossing Arrow).
"""

from __future__ import annotations

from pyspark.sql import types as T

CANDIDATES_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("parent_rank", T.LongType()),
        T.StructField("ord", T.IntegerType()),
        T.StructField("uri", T.StringType()),
        T.StructField("url_key", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("enqueue_ok", T.BooleanType()),
        T.StructField("can_fetch", T.BooleanType()),
        T.StructField("emit_ok", T.BooleanType()),
        T.StructField("src_pid", T.IntegerType()),
    ]
)

_COLS = [f.name for f in CANDIDATES_SCHEMA.fields]


def build_extract_candidates(cfgs: dict, seeds: dict, robots: dict):
    """Returns a mapInPandas function. cfgs: run_id → CrawlConfig (validated);
    seeds: run_id → raw seed string; robots: run_id → RobotsTXT."""

    def fn(batches):
        import pandas as pd
        from pyspark import TaskContext

        from ..functions.tags import prepare_filter
        from ..kernels import gourl
        from ..kernels.extract import (
            classify_candidate,
            effective_content_type,
            fetch_gate,
            page_candidates,
        )
        from ..kernels.gourl import URLError

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else -1
        bases: dict = {}
        filters: dict = {}

        def run_ctx(run_id):
            if run_id not in bases:
                bases[run_id] = gourl.parse(seeds[run_id])
                filters[run_id] = prepare_filter(cfgs[run_id].tags)
            return cfgs[run_id], bases[run_id], filters[run_id]

        for pdf in batches:
            rows: list = []
            it = zip(
                pdf["run_id"].values,
                pdf["rank"].values,
                pdf["url"].values,
                pdf["html"].values,
                pdf["content_type"].values,
            )
            for run_id, rank, url, html, ctype in it:
                cfg, base, tag_filter = run_ctx(run_id)
                try:
                    u = gourl.parse(url)
                except URLError:
                    continue
                ct = effective_content_type(url, None if ctype is None or ctype != ctype else ctype)
                if html is None or not fetch_gate(u, url, ct, cfg):
                    continue
                body = bytes(html).decode("utf-8", "surrogateescape")
                rb = robots[run_id]
                for ordi, (tag, uri) in enumerate(page_candidates(url, u, body, ct, cfg, tag_filter)):
                    c = classify_candidate(cfg, rb, base, tag, uri)
                    rows.append(
                        (
                            run_id,
                            int(rank),
                            ordi,
                            c.uri,
                            c.url_key,
                            c.host,
                            c.enqueue_ok,
                            c.can_fetch,
                            c.emit_ok,
                            pid,
                        )
                    )
            yield pd.DataFrame(rows, columns=_COLS)

    return fn
