"""JSONL pages source (sources/pages.pages_from_jsonl): pinned-schema read,
html encoding paths, corrupt-line handling, and crawl parity vs the same
pages from a parquet-shaped frame."""

import base64
import json

from crawley_spark.sources.pages import JSONL_PAGES_SCHEMA, pages_from_jsonl


def _write_jsonl(tmp_path, lines, name="pages.jsonl"):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_jsonl_read_pinned_schema(spark, tmp_path):
    lines = [
        json.dumps(
            {
                "url": "http://j.test/",
                "warc_ts": "2026-01-01T00:00:00Z",
                "html": "<html><a href='/x'>x</a></html>",
                "text": "x",
                "lang": "en",
                "content_type": "text/html",
                "status": 200,
                "extra_field_not_in_schema": [1, 2, 3],
            }
        ),
        json.dumps({"url": "http://j.test/x", "html": "<html></html>"}),
    ]
    df = pages_from_jsonl(spark, _write_jsonl(tmp_path, lines))
    rows = {r.url: r for r in df.collect()}
    assert set(rows) == {"http://j.test/", "http://j.test/x"}
    r = rows["http://j.test/"]
    assert bytes(r.html) == b"<html><a href='/x'>x</a></html>"
    assert r.content_type == "text/html" and r.status == 200
    assert r.warc_ts is not None and r.warc_ts.year == 2026
    # missing optional fields -> nulls, not errors
    r2 = rows["http://j.test/x"]
    assert r2.status is None and r2.warc_ts is None
    # schema is the pinned one (no inference): extra fields never appear
    assert df.columns == [f.name for f in JSONL_PAGES_SCHEMA.fields]


def test_jsonl_base64_and_corrupt_lines(spark, tmp_path):
    raw = bytes(range(256))  # not valid UTF-8 as a whole
    lines = [
        json.dumps(
            {"url": "http://j.test/bin", "html": base64.b64encode(raw).decode()}
        ),
        "{this is not json",  # corrupt -> all-null row under pinned schema
        json.dumps({"status": 200}),  # parseable but url-less -> dropped too
    ]
    path = _write_jsonl(tmp_path, lines)
    df = pages_from_jsonl(spark, path, html_base64=True)
    rows = df.collect()
    assert len(rows) == 1
    assert bytes(rows[0].html) == raw
    kept = pages_from_jsonl(spark, path, html_base64=True, drop_corrupt=False)
    assert kept.count() == 3  # opt-out keeps the null rows


def test_crawl_parity_jsonl_vs_parquet(spark, tmp_path):
    """Crawling a JSONL-sourced corpus is byte-identical to crawling the
    same pages from the in-memory (parquet-shape) frame — the WARC parity
    pattern (tests/test_warc.py)."""
    from crawley_spark.config import CrawlConfig
    from crawley_spark.engine import crawl as spark_crawl
    from crawley_spark.interp import Page

    from .conftest import pages_to_df

    pages = {
        "http://h.test/": Page(
            body='<html><a href="/a">a</a><a href="/b">b</a>'
            '<img src="/i.png"/></html>',
            status=200,
            content_type="text/html",
        ),
        "http://h.test/a": Page(
            body='<html><a href="/b">b</a><a href="/c">c</a></html>',
            status=200,
            content_type="text/html",
        ),
        "http://h.test/b": Page(
            body="<html></html>", status=404, content_type="text/html"
        ),
        "http://h.test/c": Page(
            body="<html></html>", status=200, content_type="text/html"
        ),
    }
    lines = [
        json.dumps(
            {
                "url": u,
                "warc_ts": "2026-01-01T00:00:00Z",
                "html": p.body,
                "content_type": p.content_type,
                "status": p.status,
            }
        )
        for u, p in pages.items()
    ]
    jdf = pages_from_jsonl(spark, _write_jsonl(tmp_path, lines))
    cfg = CrawlConfig(depth=-1, no_head=True)
    r1 = spark_crawl(spark, pages_to_df(spark, pages), "http://h.test/", cfg,
                     driver_wave_rows=0)
    r2 = spark_crawl(spark, jdf, "http://h.test/", cfg, driver_wave_rows=0)
    assert r1.result_urls("run0") == r2.result_urls("run0")
    s1 = {r["url_key"]: r["url"] for r in r1.seen("run0").collect()}
    s2 = {r["url_key"]: r["url"] for r in r2.seen("run0").collect()}
    assert s1 == s2
    r1.state.cleanup()
    r2.state.cleanup()
