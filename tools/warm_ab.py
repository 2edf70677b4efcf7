"""Warm interleaved A/B timing for headline queries (VERDICT r03 "next"
#3): one Spark session, N warm repetitions of each named query in
round-robin order (so a host steal episode hits all queries, not one
query's whole block), per-run steal% from /proc/stat, medians reported.

Usage: python tools/warm_ab.py [--sf-dir D] [--reps N] [query ...]
Defaults: sf0.1, 7 reps, simhash ann_lsh minhash_dedup ann_brute (the r03
nominal regressions, the warm-methodology control, and — per VERDICT r04
"what's wrong" #1 — ann_brute, whose +1.05 s driver-bench move was never
attributed) plus the two r05 heavyweights decontam_13gram and
near_dup_clusters, so future timing moves on them get the same
attribution machinery.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument(
        "queries", nargs="*",
        default=["simhash", "ann_lsh", "minhash_dedup", "ann_brute", "decontam_13gram", "near_dup_clusters", "pagerank", "frontier_priority", "lm_perplexity", "line_dedup"],
    )
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from bench import BENCH_OVERRIDES
    from crawley_spark.session import get_spark

    spark = get_spark(app_name="warm-ab", cores=args.cores, shuffle_partitions=args.cores)
    qs = entrymod.queries()
    fns = {q: BENCH_OVERRIDES.get(q, qs[q]) for q in args.queries}

    # one untimed warmup pass (JVM/codegen/Arrow/paths)
    for q, fn in fns.items():
        fn(spark, args.sf_dir).count()

    runs = {q: [] for q in fns}
    steals = {q: [] for q in fns}
    for rep in range(args.reps):
        for q, fn in fns.items():
            s0, t0 = _cpu_sample()
            w0 = time.time()
            fn(spark, args.sf_dir).count()
            wall = time.time() - w0
            s1, t1 = _cpu_sample()
            st = 100.0 * (s1 - s0) / max(t1 - t0, 1)
            runs[q].append(wall)
            steals[q].append(st)
            print(f"rep{rep} {q:15s} {wall:6.2f}s steal {st:4.1f}%", file=sys.stderr)

    out = {
        q: {
            "median_sec": round(statistics.median(v), 3),
            "min_sec": round(min(v), 3),
            "max_sec": round(max(v), 3),
            "spread": round(max(v) / min(v), 2),
            "median_steal_pct": round(statistics.median(steals[q]), 1),
            "runs": [round(x, 3) for x in v],
        }
        for q, v in runs.items()
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
