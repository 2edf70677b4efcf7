"""Interleaved warm A/B: mapInArrow vs mapInPandas extraction (VERDICT r04
"next" #1 evidence). One Spark session, the two variants alternate run-by-run
on the SAME materialized wave input (run_id, rank, url, html, content_type
over the bench synth corpus), per-run steal% from /proc/stat, medians
reported — the same methodology as tools/warm_ab.py, but isolating exactly
the stage that changed (the extraction UDF), not the whole crawl.

The pandas baseline below is a frozen copy of the r04 implementation
(functions/extract_udf.py as of commit 263e6da^ — kernel calls identical,
only the batch-boundary marshalling differs), so the A/B measures the
marshalling alone.

Usage: python tools/arrow_ab.py [--pages 20000] [--reps 7] [--cores 32]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _cpu_sample():
    with open("/proc/stat") as f:
        vals = list(map(int, f.readline().split()[1:]))
    return (vals[7] if len(vals) > 7 else 0), sum(vals)


def build_extract_candidates_pandas_r04(cfgs: dict, seeds: dict, robots: dict):
    """FROZEN r04 baseline (mapInPandas) — do not optimize; the point is to
    measure the old marshalling against the new."""
    from crawley_spark.functions.extract_udf import _COLS, _COMBINE_FLUSH, _MEMO_MAX

    def fn(batches):
        import pandas as pd
        from pyspark import TaskContext

        from crawley_spark.functions.tags import prepare_filter
        from crawley_spark.kernels import gourl
        from crawley_spark.kernels.extract import (
            classify_candidate,
            effective_content_type,
            fetch_gate,
            page_candidates,
        )
        from crawley_spark.kernels.gourl import URLError

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else -1
        bases: dict = {}
        filters: dict = {}

        def run_ctx(run_id):
            if run_id not in bases:
                bases[run_id] = gourl.parse(seeds[run_id])
                filters[run_id] = prepare_filter(cfgs[run_id].tags)
            return cfgs[run_id], bases[run_id], filters[run_id]

        memo: dict = {}
        best: dict = {}

        def flush():
            rows = [e[2] for e in best.values()]
            best.clear()
            return pd.DataFrame(rows, columns=_COLS)

        for pdf in batches:
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
                rank = int(rank)
                scan_js, scan_css = cfg.scan_js, cfg.scan_css
                for ordi, (tag, uri) in enumerate(page_candidates(url, u, body, ct, cfg, tag_filter)):
                    fetch_cls = (
                        tag in ("a", "iframe")
                        or (scan_js and tag == "script")
                        or (scan_css and tag == "link")
                    )
                    mkey = (run_id, fetch_cls, uri)
                    c = memo.get(mkey)
                    if c is None:
                        if len(memo) >= _MEMO_MAX:
                            memo.clear()
                        c = classify_candidate(
                            cfg, rb, base, "a" if fetch_cls else "style", uri
                        )
                        memo[mkey] = c
                    bkey = (run_id, c.url_key)
                    prev = best.get(bkey)
                    if prev is None:
                        if len(best) >= _COMBINE_FLUSH:
                            yield flush()
                        best[bkey] = [
                            rank,
                            ordi,
                            [run_id, rank, ordi, c.uri, c.url_key, c.host,
                             c.enqueue_ok, c.can_fetch, c.emit_ok, pid, 1],
                        ]
                    else:
                        row = prev[2]
                        row[10] += 1
                        if rank < prev[0] or (rank == prev[0] and ordi < prev[1]):
                            dup = row[10]
                            best[bkey] = [
                                rank,
                                ordi,
                                [run_id, rank, ordi, c.uri, c.url_key, c.host,
                                 c.enqueue_ok, c.can_fetch, c.emit_ok, pid, dup],
                            ]
        yield flush()

    return fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=20000)
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--links", type=int, default=8, help="links/page (40 = scaling-corpus shape)")
    ap.add_argument("--words", type=int, default=24, help="body words/page (200 = scaling shape)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from crawley_spark.config import CrawlConfig
    from crawley_spark.corpus import synth_corpus
    from crawley_spark.functions.extract_udf import (
        CANDIDATES_SCHEMA,
        build_extract_candidates,
    )
    from crawley_spark.kernels import robotsx
    from crawley_spark.session import get_spark
    from crawley_spark.sources.pages import normalize_pages

    spark = get_spark(app_name="arrow-ab", cores=args.cores, shuffle_partitions=args.cores)
    run_id = "ab"
    seed = "http://h0.test/"
    cfg = CrawlConfig(depth=-1).validated()
    rules = robotsx.allow_all()

    # one wave-shaped input: every corpus page, rank = stable hash (the
    # streaming prep), materialized once so both variants read identical
    # cached blocks and ONLY the Python stage is timed
    pages = normalize_pages(
        synth_corpus(
            spark,
            n_pages=args.pages,
            n_hosts=20,
            links_per_page=args.links,
            body_words=args.words,
        )
    )
    wave = (
        pages.select(
            F.lit(run_id).alias("run_id"),
            F.xxhash64("url").alias("rank"),
            "url",
            "html",
            "content_type",
        )
        .repartition(args.cores)
        .persist()
    )
    n = wave.count()

    fn_arrow = build_extract_candidates({run_id: cfg}, {run_id: seed}, {run_id: rules})
    fn_pandas = build_extract_candidates_pandas_r04(
        {run_id: cfg}, {run_id: seed}, {run_id: rules}
    )
    variants = {
        "arrow": lambda: wave.mapInArrow(fn_arrow, CANDIDATES_SCHEMA).count(),
        "pandas_r04": lambda: wave.mapInPandas(fn_pandas, CANDIDATES_SCHEMA).count(),
    }

    # untimed warmup (codegen, Python worker reuse, page cache)
    counts = {k: v() for k, v in variants.items()}
    assert counts["arrow"] == counts["pandas_r04"], counts  # identical outputs

    runs = {k: [] for k in variants}
    steals = {k: [] for k in variants}
    for rep in range(args.reps):
        for k, v in variants.items():
            s0, t0 = _cpu_sample()
            w0 = time.time()
            v()
            wall = time.time() - w0
            s1, t1 = _cpu_sample()
            runs[k].append(wall)
            steals[k].append(100.0 * (s1 - s0) / max(t1 - t0, 1))
            print(f"rep {rep} {k:<10} {wall:6.3f}s steal={steals[k][-1]:.2f}%", flush=True)

    med = {k: statistics.median(v) for k, v in runs.items()}
    out = {
        "pages": n,
        "candidates": counts["arrow"],
        "reps": args.reps,
        "cores": args.cores,
        "median_sec": med,
        "pages_per_sec": {k: round(n / m, 1) for k, m in med.items()},
        "speedup_arrow_over_pandas": round(med["pandas_r04"] / med["arrow"], 3),
        "max_steal_pct": {k: round(max(v), 2) for k, v in steals.items()},
        "all_runs": {k: [round(x, 3) for x in v] for k, v in runs.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
