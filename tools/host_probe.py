"""Host compute-scaling probe, isolated OUTSIDE Spark (the BENCH.md
"decomposition" methodology, now a reusable tool): run the engine's real
per-page extraction work — gourl.parse + fetch gate + page_candidates
(HTML tokenizer) + classify_candidate (canonicalizer) — in K plain Python
processes doing IDENTICAL work, for K = 1, 2, 4, 8, and report per-process
throughput efficiency vs K=1.

This measures what the single socket (memory bus / L3 / SMT / co-tenant
bandwidth contention) does to perfectly parallel copies of the hot kernel
before any Spark code runs. A same-day probe next to a scaling campaign
separates "the engine stopped scaling" from "the host stopped scaling":
Spark cannot beat this ceiling in local mode, because its executor threads
run the same kernel on the same socket. Per-run steal% is sampled from
/proc/stat, but note co-tenant *bandwidth* contention does NOT show up as
steal — that is exactly why this probe exists.

Pages use the scaling-corpus shape (40 links, ~200 body words) so the
object-churn profile matches what the campaign's crawl actually tokenizes.

Usage: python tools/host_probe.py [--pages 1500] [--procs 1,2,4,8]
Prints one JSON line: {"probe": "host_extract_scaling", "results": {...}}
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _cpu_sample():
    with open("/proc/stat") as f:
        vals = list(map(int, f.readline().split()[1:]))
    return (vals[7] if len(vals) > 7 else 0), sum(vals)


def _worker(n_pages: int, out_q) -> None:
    # identical deterministic work in every process: build the bodies, then
    # run the real extraction + classification kernels over them
    from crawley_spark.config import CrawlConfig
    from crawley_spark.corpus import _page_body
    from crawley_spark.functions.tags import prepare_filter
    from crawley_spark.kernels import gourl
    from crawley_spark.kernels.extract import (
        classify_candidate,
        effective_content_type,
        fetch_gate,
        page_candidates,
    )
    from crawley_spark.kernels.robotsx import allow_all

    cfg = CrawlConfig(depth=-1, no_head=True).validated()
    tag_filter = prepare_filter(cfg.tags)
    rb = allow_all()
    base = gourl.parse("http://h0.test")
    pages = [
        _page_body(pid, n_pages, 16, 40, 42, body_words=200)
        for pid in range(n_pages)
    ]
    t0 = time.perf_counter()
    n_cands = 0
    for url, body in pages:
        u = gourl.parse(url)
        ct = effective_content_type(url, "text/html")
        if not fetch_gate(u, url, ct, cfg):
            continue
        for tag, uri in page_candidates(url, u, body, ct, cfg, tag_filter):
            c = classify_candidate(cfg, rb, base, tag, uri)
            n_cands += 1 if c.enqueue_ok else 0
    out_q.put((time.perf_counter() - t0, n_cands))


def run_at(procs: int, n_pages: int) -> dict:
    ctx = mp.get_context("spawn")  # no inherited interpreter state
    q = ctx.Queue()
    s0, t0 = _cpu_sample()
    ps = [ctx.Process(target=_worker, args=(n_pages, q)) for _ in range(procs)]
    wall0 = time.perf_counter()
    for p in ps:
        p.start()
    samples = [q.get() for _ in ps]
    for p in ps:
        p.join()
    wall = time.perf_counter() - wall0
    s1, t1 = _cpu_sample()
    per_proc = [n_pages / s for s, _ in samples]
    return {
        "procs": procs,
        "pages_per_sec_per_proc_mean": round(sum(per_proc) / len(per_proc), 1),
        "pages_per_sec_per_proc_min": round(min(per_proc), 1),
        "wall_sec": round(wall, 2),
        "steal_pct": round(100 * (s1 - s0) / max(1, t1 - t0), 2),
        "cands_enqueue_ok": samples[0][1],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=1500)
    ap.add_argument("--procs", default="1,2,4,8")
    args = ap.parse_args()
    counts = [int(c) for c in args.procs.split(",")]
    results = {}
    base = None
    for k in counts:
        r = run_at(k, args.pages)
        if base is None:
            base = r["pages_per_sec_per_proc_mean"]
        r["per_proc_efficiency_vs_1"] = round(
            r["pages_per_sec_per_proc_mean"] / base, 3
        )
        results[str(k)] = r
        print(
            f"procs={k}: {r['pages_per_sec_per_proc_mean']} pages/s/proc "
            f"(eff {r['per_proc_efficiency_vs_1']}) steal={r['steal_pct']}%",
            file=sys.stderr,
            flush=True,
        )
    print(json.dumps({"probe": "host_extract_scaling", "pages": args.pages, "results": results}))


if __name__ == "__main__":
    main()
