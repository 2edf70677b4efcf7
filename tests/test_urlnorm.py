"""URL canonicalization / duplicate-URL clustering (operators/urlnorm.py)."""

from pyspark.sql import functions as F

from crawley_spark.operators.urlnorm import (
    canonicalize_url,
    url_canonical_clusters,
    url_canonical_map,
)


def _canon(spark, urls, **kw):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    rows = df.select(
        "url", canonicalize_url(F.col("url"), **kw).alias("c")
    ).collect()
    return {r["url"]: r["c"] for r in rows}


def test_canonical_fixtures(spark):
    got = _canon(
        spark,
        [
            "HTTP://WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag",
            "https://example.com:443/",
            "https://example.com",
            "http://example.com:8080/x/",  # non-default port kept
            "https://www.example.com/a?gclid=123",
            "https://example.com/a?z=1&a=2&fbclid=abc&ref=tw",
            "https://example.com/a/b.html",
            "ftp://Example.com/File",  # non-http scheme: port rules skip
        ],
    )
    assert (
        got["HTTP://WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag"]
        == "http://example.com/a/b?a=1&b=2"
    )
    assert got["https://example.com:443/"] == "https://example.com/"
    assert got["https://example.com"] == "https://example.com/"
    assert got["http://example.com:8080/x/"] == "http://example.com:8080/x"
    assert got["https://www.example.com/a?gclid=123"] == "https://example.com/a"
    assert (
        got["https://example.com/a?z=1&a=2&fbclid=abc&ref=tw"]
        == "https://example.com/a?a=2&z=1"
    )
    assert got["https://example.com/a/b.html"] == "https://example.com/a/b.html"
    # case preserved in path, not host; ftp has no default-port rule
    assert got["ftp://Example.com/File"] == "ftp://example.com/File"


def test_canonical_keeps_www_when_disabled(spark):
    got = _canon(spark, ["https://www.example.com/a"], strip_www=False)
    assert got["https://www.example.com/a"] == "https://www.example.com/a"


def test_canonical_tracking_name_without_value(spark):
    got = _canon(spark, ["https://example.com/a?utm_medium&x=1"])
    assert got["https://example.com/a?utm_medium&x=1"] == "https://example.com/a?x=1"


def test_canonical_preserves_percent_encoding_and_plus(spark):
    u = "https://example.com/p%20q?a=b+c%26d"
    assert _canon(spark, [u])[u] == "https://example.com/p%20q?a=b+c%26d"


def test_canonical_idempotent_fuzz(spark):
    """canonicalize(canonicalize(u)) == canonicalize(u) over a generated
    grid of scheme/www/port/slash/param/fragment combinations."""
    urls = []
    for scheme in ("http", "https"):
        for www in ("", "www.", "WWW."):
            for port in ("", ":80", ":443", ":8443"):
                for path in ("", "/", "/a/", "/a/b"):
                    for q in ("", "?b=2&a=1", "?utm_source=t&k=v", "?utm_source=t"):
                        for frag in ("", "#top"):
                            urls.append(
                                f"{scheme}://{www}Example.com{port}{path}{q}{frag}"
                            )
    first = _canon(spark, urls)
    second = _canon(spark, sorted(set(first.values())))
    for c in first.values():
        assert second[c] == c, (c, second[c])


def test_cluster_agg_and_map(spark):
    urls = [
        "https://www.example.com/a/?utm_source=x&b=2&a=1",
        "https://example.com/a?a=1&b=2",
        "https://example.com/a?a=1&b=2",  # exact dup row
        "https://example.com/other",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    m = {r["url"]: r["canon_url"] for r in url_canonical_map(df).collect()}
    assert m[urls[0]] == m[urls[1]] == "https://example.com/a?a=1&b=2"
    clusters = {
        r["canon_url"]: r for r in url_canonical_clusters(df).collect()
    }
    big = clusters["https://example.com/a?a=1&b=2"]
    assert big["n_urls"] == 3 and big["n_distinct_urls"] == 2
    assert big["rep_url"] == "https://example.com/a?a=1&b=2"
    assert clusters["https://example.com/other"]["n_urls"] == 1


def test_map_is_zero_shuffle(spark):
    df = spark.createDataFrame([("https://example.com/a",)], ["url"])
    plan = (
        url_canonical_map(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
