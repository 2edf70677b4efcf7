"""Crawler-trap detection (operators/traps.py) — Heritrix-rule signals,
host rollup, plan shape, and brute parity against a straight-line Python
mirror of the documented rules."""

import random

import pytest
from pyspark.sql import functions as F

from crawley_spark.operators.traps import (
    MAX_PATH_SEGMENTS,
    MAX_QUERY_PARAMS,
    MAX_SEG_REPEATS,
    host_trap_stats,
    url_trap_signals,
)


def _mirror(url):
    rest = url.split("://", 1)[1]
    hostpart, _, pq = rest.partition("/")
    path, _, query = ("/" + pq).partition("?")
    segs = [s for s in path.split("/") if s]
    best = cur = 0
    prev = None
    for s in segs:
        cur = cur + 1 if s == prev else 1
        best = max(best, cur)
        prev = s
    n_params = 0 if not query else len(query.split("&"))
    return (
        hostpart,
        best,
        len(segs),
        n_params,
        best > MAX_SEG_REPEATS
        or len(segs) > MAX_PATH_SEGMENTS
        or n_params > MAX_QUERY_PARAMS,
    )


def _run(spark, urls, **kw):
    df = spark.createDataFrame(list(enumerate(urls)), "doc_id long, url string")
    return {
        r["doc_id"]: (r["host"], r["max_seg_run"], r["n_segments"], r["n_params"], r["is_trap"])
        for r in url_trap_signals(df, **kw).collect()
    }


def test_planted_rules(spark):
    urls = [
        "https://a.test/cal/cal/cal/page",        # run 3 > 2 → trap
        "https://a.test/a/b/c/page",              # clean
        "https://b.test/" + "d/" * 21 + "x",      # 22 segments → trap (run too)
        "https://b.test/p?a=1&b=2&c=3",           # 3 params, clean
        "https://b.test/p?" + "&".join(f"k{i}=v" for i in range(11)),  # → trap
        "https://c.test/",                        # empty path: all-zero, clean
        "https://c.test/x/x",                     # run 2 == threshold, clean
        "https://c.test/x/y/x",                   # same seg NON-consecutive, clean
    ]
    got = _run(spark, urls)
    assert got == {i: _mirror(u) for i, u in enumerate(urls)}
    assert [got[i][4] for i in range(8)] == [True, False, True, False, True, False, False, False]


def test_brute_parity_random(spark):
    rng = random.Random(5)
    segs = ["a", "b", "cal", "x"]
    urls = []
    for _ in range(60):
        path = "/".join(rng.choice(segs) for _ in range(rng.randint(0, 25)))
        q = "&".join(f"p{i}=1" for i in range(rng.randint(0, 13)))
        urls.append(f"https://h{rng.randint(0,2)}.test/{path}" + (f"?{q}" if q else ""))
    assert _run(spark, urls) == {i: _mirror(u) for i, u in enumerate(urls)}


def test_host_rollup_and_ppm(spark):
    urls = [
        "https://h.test/cal/cal/cal",
        "https://h.test/ok",
        "https://h.test/also/ok",
        "https://i.test/ok",
    ]
    df = spark.createDataFrame(list(enumerate(urls)), "doc_id long, url string")
    got = {r["host"]: (r["n_urls"], r["n_traps"], r["trap_ppm"])
           for r in host_trap_stats(url_trap_signals(df)).collect()}
    assert got == {"h.test": (3, 1, 333333), "i.test": (1, 0, 0)}


def test_zero_shuffle_plan_and_validation(spark):
    df = spark.createDataFrame([(0, "https://a.test/x")], "doc_id long, url string")
    plan = url_trap_signals(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    with pytest.raises(ValueError):
        url_trap_signals(df, max_seg_repeats=0)


def test_custom_thresholds(spark):
    urls = ["https://a.test/x/x", "https://a.test/a/b/c/d"]
    got = _run(spark, urls, max_seg_repeats=1, max_path_segments=3)
    assert got[0][4] is True   # run 2 > 1
    assert got[1][4] is True   # 4 segments > 3
