"""Sitemap XML sink + distributed re-read (sources/sitemap_sink.py)."""

import glob
import os

import pytest

from crawley_spark.sources.sitemap_sink import (
    MAX_URLS_PER_FILE,
    read_sitemaps,
    write_sitemaps,
)


def _urls_df(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], ["url"])


def test_roundtrip_multi_host_chunked(spark, tmp_path):
    urls = [f"http://a.test/p{i}" for i in range(7)] + [
        f"http://b.test/q{i}" for i in range(2)
    ]
    out = str(tmp_path / "sm")
    manifest = write_sitemaps(
        _urls_df(spark, urls), out, max_urls_per_file=3
    ).collect()
    # host a: 7 urls -> 3 files; host b: 2 urls -> 1 file
    by_host = {}
    for r in manifest:
        by_host.setdefault(r["host"], []).append(r)
    assert len(by_host["a.test"]) == 3
    assert sorted(r["n_urls"] for r in by_host["a.test"]) == [1, 3, 3]
    assert len(by_host["b.test"]) == 1 and by_host["b.test"][0]["n_urls"] == 2
    got = {r["url"] for r in read_sitemaps(spark, out).collect()}
    assert got == set(urls)


def test_files_sorted_and_within_cap(spark, tmp_path):
    urls = [f"http://h.test/{c}" for c in "zyxwvu"]
    out = str(tmp_path / "sm")
    write_sitemaps(_urls_df(spark, urls), out, max_urls_per_file=4).collect()
    files = sorted(glob.glob(os.path.join(out, "sitemap-*.xml")))
    assert len(files) == 2
    seen = []
    for f in files:
        body = open(f).read()
        locs = [
            ln.split("<loc>")[1].split("</loc>")[0]
            for ln in body.splitlines()
            if "<loc>" in ln
        ]
        assert len(locs) <= 4
        seen.extend(locs)
    # chunking is by bytewise url order: concatenated files are sorted
    assert seen == sorted(urls)


def test_xml_escaping_roundtrips(spark, tmp_path):
    u = "http://h.test/p?a=1&b=2"
    out = str(tmp_path / "sm")
    write_sitemaps(_urls_df(spark, [u]), out).collect()
    (f,) = glob.glob(os.path.join(out, "sitemap-*.xml"))
    body = open(f).read()
    assert "&amp;" in body and "&b=2" not in body
    got = [r["url"] for r in read_sitemaps(spark, out).collect()]
    assert got == [u]


def test_lastmod_rendered(spark, tmp_path):
    import datetime

    df = spark.createDataFrame(
        [("http://h.test/p", datetime.datetime(2026, 3, 4, 5, 6, 7))],
        ["url", "ts"],
    )
    out = str(tmp_path / "sm")
    write_sitemaps(df, out, lastmod_col="ts").collect()
    (f,) = glob.glob(os.path.join(out, "sitemap-*.xml"))
    assert "<lastmod>2026-03-04</lastmod>" in open(f).read()


def test_index_lists_every_file(spark, tmp_path):
    urls = [f"http://a.test/p{i}" for i in range(5)] + ["http://b.test/q"]
    out = str(tmp_path / "sm")
    write_sitemaps(_urls_df(spark, urls), out, max_urls_per_file=2).collect()
    idx = open(os.path.join(out, "sitemapindex.xml")).read()
    files = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(out, "sitemap-*.xml"))
    )
    assert len(files) == 4  # 3 for a.test + 1 for b.test
    for name in files:
        assert f"<loc>{name}</loc>" in idx


def test_no_index_flag(spark, tmp_path):
    out = str(tmp_path / "sm")
    write_sitemaps(
        _urls_df(spark, ["http://h.test/p"]), out, index=False
    ).collect()
    assert not os.path.exists(os.path.join(out, "sitemapindex.xml"))


def test_deterministic_reexport(spark, tmp_path):
    urls = [f"http://h.test/p{i}" for i in range(10)]
    outs = []
    for d in ("sm1", "sm2"):
        out = str(tmp_path / d)
        write_sitemaps(
            _urls_df(spark, urls), out, max_urls_per_file=4
        ).collect()
        blobs = {
            os.path.basename(p): open(p, "rb").read()
            for p in glob.glob(os.path.join(out, "*.xml"))
        }
        outs.append(blobs)
    assert outs[0] == outs[1]


def test_default_cap_is_protocol_limit():
    assert MAX_URLS_PER_FILE == 50_000


def test_no_global_sort_in_plan(spark, tmp_path):
    """Chunk assignment must hash-partition by host — never a global
    range sort."""
    df = _urls_df(spark, [f"http://h{i}.test/p" for i in range(8)])
    out = str(tmp_path / "sm")
    manifest = write_sitemaps(df, out, index=False)
    plan = manifest._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "rangepartitioning" not in plan.lower()
