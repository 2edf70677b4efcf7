"""CDX / SURT index tests (operators/cdx.py)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from crawley_spark.operators.cdx import (
    PROXY_BYTES,
    build_cdx_index,
    surt_key,
    surt_proxy_long,
)


def _surts(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["s"] for r in df.select(surt_key("url").alias("s")).collect()]


def test_surt_fixtures(spark):
    got = _surts(
        spark,
        [
            "http://www.Example.com/Path?b=2&a=1",
            "http://example.com",
            "http://sub.www.example.com/x",  # only a LEADING www. strips
            "http://www.example.com/?",
            "http://a.b.c.d/p/q?z=1&y=2&y=1",
        ],
    )
    assert got == [
        "com,example)/path?a=1&b=2",
        "com,example)/",
        "com,example,www,sub)/x",
        "com,example)/",
        "d,c,b,a)/p/q?y=1&y=2&z=1",
    ]


def test_surt_proxy_is_prefix_order(spark):
    """The 7-byte proxy is monotone w.r.t. SURT string order on ASCII, and
    ties only occur on shared 7-byte prefixes."""
    urls = [f"http://h{i}.t{j}/p" for i in range(9) for j in range(4)]
    df = spark.createDataFrame([(u,) for u in urls], "url string").select(
        surt_key("url").alias("s")
    )
    rows = df.select("s", surt_proxy_long("s").alias("p")).collect()
    by_s = sorted(rows, key=lambda r: r["s"])
    for a, b in zip(by_s, by_s[1:]):
        assert a["p"] <= b["p"]
        if a["p"] == b["p"]:
            assert a["s"][:PROXY_BYTES] == b["s"][:PROXY_BYTES]


def test_build_cdx_index_brute_parity(spark):
    """Shard layout vs a straight-line Python mirror: same boundaries
    (exact order statistics of the proxy), same shard per record, shards
    contiguous in proxy order, global (shard, line) order is a true SURT
    line order."""
    n_shards = 4
    rows = [
        (
            f"http://www.s{i % 13}.t{i % 5}/D{i}" + ("?b=1&A=2" if i % 3 == 0 else ""),
            f"2026010100{i:04d}",
            hashlib.md5(str(i).encode()).hexdigest(),
        )
        for i in range(97)
    ]
    df = spark.createDataFrame(rows, "url string, ts string, digest string")
    out = build_cdx_index(df, n_shards=n_shards).collect()

    # python mirror
    def surt(u):
        rest = u.split("://", 1)[1]
        hostpath = rest.split("/", 1)
        host = hostpath[0].lower()
        if host.startswith("www."):
            host = host[4:]
        pq = ("/" + hostpath[1]) if len(hostpath) > 1 else "/"
        path, _, q = pq.partition("?")
        qs = "&".join(sorted(p for p in q.lower().split("&") if p))
        return ",".join(reversed(host.split("."))) + ")" + path.lower() + (
            "?" + qs if qs else ""
        )

    def proxy(s):
        b = s.encode()[:PROXY_BYTES].ljust(PROXY_BYTES, b"\0")
        return int.from_bytes(b, "big")

    surts = {u: surt(u) for u, _, _ in rows}
    proxies = sorted(proxy(s) for s in surts.values())
    n = len(proxies)
    bounds = sorted(
        proxies[(n - 1) * p // 1000] for p in {i * 1000 // n_shards for i in range(1, n_shards)}
    )
    expect = {
        u: sum(1 for b in bounds if proxy(surts[u]) > b) for u, _, _ in rows
    }
    assert len(out) == len(rows)
    for r in out:
        assert r["surt"] == surts[r["url"]]
        assert r["shard"] == expect[r["url"]]
        assert r["line"] == f"{r['surt']} {r['ts']} {r['url']} {r['digest']}"
    # contiguity: max proxy of shard k <= min proxy of shard k+1
    per = {}
    for r in out:
        per.setdefault(r["shard"], []).append(proxy(r["surt"]))
    ks = sorted(per)
    for a, b in zip(ks, ks[1:]):
        assert max(per[a]) <= min(per[b])


def test_build_cdx_index_single_shard_and_validation(spark):
    df = spark.createDataFrame(
        [("http://a.b/x", "20260101000000", "d")], "url string, ts string, digest string"
    )
    out = build_cdx_index(df, n_shards=1).collect()
    assert [r["shard"] for r in out] == [0]
    with pytest.raises(ValueError):
        build_cdx_index(df, n_shards=0)
