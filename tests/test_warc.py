"""WARC 1.1 source/sink (sources/warc.py).

Covers: spec-shape record parsing (version lines, folded headers,
inter-record slack), strict malformed-record errors, write->read roundtrip
(plain + per-record gzip, payloads containing CRLFCRLF / empty / binary),
HTTP-envelope splitting, multi-file distribution, and the JVM-side
warc_ts derivation.
"""

import datetime
import gzip
import os

import pytest
from pyspark.sql import functions as F

from crawley_spark.sources.warc import (
    _build_record,
    _parse_warc_stream,
    pages_from_warc,
    read_warc,
    write_warc,
)


def _rec(rec_type=b"resource", url=b"http://a.test/x", date=b"2024-01-01T00:00:05Z",
         ctype=b"text/plain", block=b"hello", version=b"WARC/1.1", extra=b""):
    hdr = (
        version + b"\r\n"
        + b"WARC-Type: " + rec_type + b"\r\n"
        + b"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-000000000001>\r\n"
        + b"WARC-Date: " + date + b"\r\n"
        + b"WARC-Target-URI: " + url + b"\r\n"
        + b"Content-Type: " + ctype + b"\r\n"
        + extra
        + b"Content-Length: " + str(len(block)).encode() + b"\r\n\r\n"
    )
    return hdr + block + b"\r\n\r\n"


class TestParse:
    def test_basic_record(self):
        rows = list(_parse_warc_stream(_rec(), "f", False))
        assert len(rows) == 1
        r = rows[0]
        assert r["rec_type"] == "resource"
        assert r["url"] == "http://a.test/x"
        assert r["warc_date"] == "2024-01-01T00:00:05Z"
        assert r["payload"] == b"hello"
        assert r["n_bytes"] == 5
        assert r["rec_offset"] == 0

    def test_warc_10_version_and_slack(self):
        # WARC/1.0 accepted; extra CRLF slack between records tolerated
        data = _rec(version=b"WARC/1.0") + b"\r\n\r\n" + _rec(block=b"second")
        rows = list(_parse_warc_stream(data, "f", False))
        assert [r["payload"] for r in rows] == [b"hello", b"second"]
        assert rows[1]["rec_offset"] > 0

    def test_folded_header(self):
        # continuation lines (leading SP/TAB) append to the previous field
        data = _rec(extra=b"WARC-Concurrent-To: <urn:a>\r\n \t<urn:b>\r\n")
        rows = list(_parse_warc_stream(data, "f", False))
        assert rows[0]["payload"] == b"hello"

    def test_payload_containing_crlfcrlf(self):
        # Content-Length framing, not delimiter search, bounds the block
        block = b"a\r\n\r\nb\r\n\r\nc"
        rows = list(_parse_warc_stream(_rec(block=block), "f", False))
        assert rows[0]["payload"] == block

    def test_angle_bracket_uri_stripped(self):
        # WARC 1.0 wrote <uri>; 1.1 writes bare — both must read back equal
        data = _rec(url=b"<http://a.test/x>")
        rows = list(_parse_warc_stream(data, "f", False))
        assert rows[0]["url"] == "http://a.test/x"

    def test_http_envelope_split(self):
        body = b"<html>hi</html>"
        env = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        data = _rec(rec_type=b"response", ctype=b"application/http;msgtype=response", block=env)
        on = list(_parse_warc_stream(data, "f", True))[0]
        assert on["http_status"] == 200 and on["payload"] == body
        off = list(_parse_warc_stream(data, "f", False))[0]
        assert off["http_status"] is None and off["payload"] == env

    def test_http_envelope_malformed_status_kept_whole(self):
        env = b"HTTP/1.1 NOTANUM OK\r\n\r\nbody"
        data = _rec(rec_type=b"response", ctype=b"application/http", block=env)
        r = list(_parse_warc_stream(data, "f", True))[0]
        assert r["http_status"] is None and r["payload"] == env

    @pytest.mark.parametrize(
        "data,msg",
        [
            (b"WARC/2.9\r\nContent-Length: 0\r\n\r\n\r\n\r\n", "bad WARC version"),
            (_rec()[:-6], "truncated block"),
            (b"WARC/1.1\r\nWARC-Type: resource\r\n\r\n\r\n\r\n", "Content-Length"),
            (b"WARC/1.1\r\nNOCOLON\r\nContent-Length: 0\r\n\r\n\r\n\r\n", "malformed header"),
            (b"WARC/1.1\r\nWARC-Type: x", "truncated WARC header"),
        ],
    )
    def test_strict_errors(self, data, msg):
        with pytest.raises(ValueError, match=msg):
            list(_parse_warc_stream(data, "f", False))


class TestRoundtrip:
    def _frame(self, spark):
        rows = [
            ("http://w.test/0", b"plain", datetime.datetime(2024, 1, 1, 0, 0, 0)),
            ("http://w.test/1", b"a\r\n\r\nb", datetime.datetime(2024, 1, 1, 0, 0, 1)),
            ("http://w.test/2", b"", datetime.datetime(2024, 1, 1, 0, 0, 2)),
            ("http://w.test/3", bytes(range(256)), datetime.datetime(2024, 1, 1, 0, 0, 3)),
            ("http://w.test/é", b"unicode-url", datetime.datetime(2024, 1, 1, 0, 0, 4)),
        ]
        return spark.createDataFrame(rows, "url string, payload binary, ts timestamp")

    @pytest.mark.parametrize("compress", [False, True])
    def test_write_read(self, spark, tmp_path, compress):
        out = str(tmp_path / ("gz" if compress else "plain"))
        man = write_warc(
            self._frame(spark), out, payload_col="payload", ts_col="ts",
            compress=compress, num_files=2,
        ).collect()
        assert sum(r.n_records for r in man) == 5
        assert len(man) == 2 and all(os.path.exists(r.path) for r in man)
        got = read_warc(spark, out).filter(F.col("rec_type") == "resource").collect()
        assert {(r.url, bytes(r.payload)) for r in got} == {
            (u, p) for u, p, _ in [tuple(x) for x in self._frame(spark).collect()]
        }
        # warc_ts derived JVM-side from the formatted WARC-Date string
        by_url = {r.url: r for r in got}
        assert by_url["http://w.test/1"].warc_ts == datetime.datetime(2024, 1, 1, 0, 0, 1)
        assert by_url["http://w.test/2"].n_bytes == 0

    def test_per_record_gzip_members(self, spark, tmp_path):
        out = str(tmp_path / "members")
        write_warc(self._frame(spark), out, payload_col="payload", ts_col="ts",
                   num_files=1).collect()
        path = os.path.join(out, os.listdir(out)[0])
        raw = open(path, "rb").read()
        # one gzip member per record (incl. warcinfo): 6 magics
        assert raw.count(b"\x1f\x8b\x08") == 6
        # stdlib multi-member decompress sees every record
        assert gzip.decompress(raw).count(b"WARC/1.1\r\n") == 6

    def test_warcinfo_and_determinism(self, spark, tmp_path):
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        for out in (a, b):
            write_warc(self._frame(spark), out, payload_col="payload", ts_col="ts",
                       num_files=1).collect()
        fa = open(os.path.join(a, os.listdir(a)[0]), "rb").read()
        fb = open(os.path.join(b, os.listdir(b)[0]), "rb").read()
        assert fa == fb  # deterministic ids + mtime=0 => byte-identical export
        info = read_warc(spark, a).filter(F.col("rec_type") == "warcinfo").collect()
        assert len(info) == 1 and b"crawley-spark" in bytes(info[0].payload)

    def test_empty_partitions_write_no_files(self, spark, tmp_path):
        out = str(tmp_path / "sparse")
        df = self._frame(spark).repartition(8, "url")
        man = write_warc(df, out, payload_col="payload", ts_col="ts").collect()
        assert sum(r.n_records for r in man) == 5
        assert len(os.listdir(out)) == len(man) <= 5

    def test_read_parallelism_is_file_level(self, spark, tmp_path):
        out = str(tmp_path / "wide")
        write_warc(self._frame(spark), out, payload_col="payload", ts_col="ts",
                   num_files=3).collect()
        assert len(read_warc(spark, out).inputFiles()) == 3

    def test_response_records_roundtrip_envelope(self, spark, tmp_path):
        out = str(tmp_path / "resp")
        rows = [
            ("http://w.test/ok", b"<html>ok</html>", 200, "text/html"),
            ("http://w.test/gone", b"nope", 404, "text/plain"),
            ("http://w.test/nul", b"", None, "text/html"),  # status null -> 200
        ]
        df = spark.createDataFrame(
            rows, "url string, html binary, status int, content_type string"
        )
        write_warc(
            df, out, payload_col="html", record_type="response",
            status_col="status", content_type_col="content_type",
        ).collect()
        got = {
            r.url: r
            for r in read_warc(spark, out, http_parse=True)
            .filter(F.col("rec_type") == "response").collect()
        }
        assert got["http://w.test/ok"].http_status == 200
        assert got["http://w.test/ok"].http_content_type == "text/html"
        assert bytes(got["http://w.test/ok"].payload) == b"<html>ok</html>"
        assert got["http://w.test/gone"].http_status == 404
        assert got["http://w.test/nul"].http_status == 200
        # WARC-level content type carries the envelope marker
        assert got["http://w.test/ok"].content_type.startswith("application/http")
        # without http_parse the whole envelope is the payload
        raw = read_warc(spark, out).filter(F.col("url") == "http://w.test/ok").collect()[0]
        assert bytes(raw.payload).startswith(b"HTTP/1.1 200 OK\r\n")

    def test_crawl_parity_warc_vs_parquet(self, spark, tmp_path):
        """Crawling a WARC-sourced corpus is byte-identical to crawling the
        same pages from the in-memory (parquet-shape) frame."""
        from crawley_spark.config import CrawlConfig
        from crawley_spark.engine import crawl as spark_crawl
        from crawley_spark.interp import Page

        from .conftest import pages_to_df

        pages = {
            "http://h.test/": Page(
                body='<html><a href="/a">a</a><a href="/b">b</a>'
                     '<img src="/i.png"/></html>',
                status=200, content_type="text/html"),
            "http://h.test/a": Page(
                body='<html><a href="/b">b</a><a href="/c">c</a></html>',
                status=200, content_type="text/html"),
            "http://h.test/b": Page(body="<html></html>", status=404,
                                    content_type="text/html"),
            "http://h.test/c": Page(body="<html></html>", status=200,
                                    content_type="text/html"),
        }
        corpus = pages_to_df(spark, pages)
        out = str(tmp_path / "cc")
        write_warc(
            corpus, out, payload_col="html", ts_col="warc_ts",
            record_type="response", status_col="status",
            content_type_col="content_type",
        ).collect()
        cfg = CrawlConfig(depth=-1, no_head=True)
        r1 = spark_crawl(spark, corpus, "http://h.test/", cfg, driver_wave_rows=0)
        got1 = r1.result_urls("run0")
        seen1 = {r["url_key"]: r["url"] for r in r1.seen("run0").collect()}
        r1.state.cleanup()
        r2 = spark_crawl(
            spark, pages_from_warc(spark, out), "http://h.test/", cfg,
            driver_wave_rows=0,
        )
        got2 = r2.result_urls("run0")
        seen2 = {r["url_key"]: r["url"] for r in r2.seen("run0").collect()}
        r2.state.cleanup()
        assert got1 == got2 and got1  # same emission order, non-empty
        assert seen1 == seen2

    def test_build_record_framing(self):
        rec = _build_record("resource", [("WARC-Target-URI", "http://x")], b"abc")
        assert rec.startswith(b"WARC/1.1\r\n")
        assert b"Content-Length: 3\r\n\r\nabc\r\n\r\n" in rec
        assert rec.endswith(b"\r\n\r\n")


def test_wet_export_roundtrip(spark, tmp_path):
    """WET (conversion/text-plain) records roundtrip through the strict
    parser with the content type intact; re-export is byte-identical."""
    import glob
    import os

    from pyspark.sql import functions as F

    from crawley_spark.sources.warc import export_wet, read_warc

    df = spark.createDataFrame(
        [(0, "http://w.test/a", "hello plain text"), (1, "http://w.test/b", "unicode é ☃")],
        "doc_id long, url string, text string",
    )
    out = str(tmp_path / "wet1")
    m = export_wet(df.select("url", "text"), out, num_files=1).collect()
    assert sum(r["n_records"] for r in m) == 2
    got = {r["url"]: r for r in read_warc(spark, out).filter(F.col("rec_type") == "conversion").collect()}
    assert got["http://w.test/a"]["payload"] == b"hello plain text"
    assert got["http://w.test/b"]["payload"].decode() == "unicode é ☃"
    assert all(r["content_type"] == "text/plain; charset=utf-8" for r in got.values())
    out2 = str(tmp_path / "wet2")
    export_wet(df.select("url", "text"), out2, num_files=1).collect()
    a = sorted(glob.glob(os.path.join(out, "*")))
    b = sorted(glob.glob(os.path.join(out2, "*")))
    assert [open(x, "rb").read() for x in a] == [open(y, "rb").read() for y in b]


def test_export_warc_deduped_revisits(spark, tmp_path):
    """Digest dedup (export_warc_deduped): one resource per distinct
    payload (bytewise-min url), every other capture an empty-block revisit
    with the identical-payload-digest profile headers; re-read covers the
    new refers_to/payload_digest parser columns; re-export is
    deterministic (byte-identical files)."""
    from crawley_spark.sources.warc import (
        REVISIT_PROFILE,
        export_warc_deduped,
        read_warc,
    )

    rows = [
        ("http://a.test/1", b"same"),
        ("http://a.test/2", b"same"),
        ("http://a.test/0", b"same"),
        ("http://a.test/3", b"uniq"),
    ]
    df = spark.createDataFrame(rows, "url string, payload binary")
    out1 = str(tmp_path / "w1")
    export_warc_deduped(df, out1, num_files=2).collect()
    got = {
        r["url"]: r
        for r in read_warc(spark, out1 + "/*")
        .filter("rec_type != 'warcinfo'")
        .collect()
    }
    assert len(got) == 4
    assert got["http://a.test/0"]["rec_type"] == "resource"
    assert got["http://a.test/0"]["refers_to"] is None
    assert got["http://a.test/3"]["rec_type"] == "resource"
    for u in ("http://a.test/1", "http://a.test/2"):
        r = got[u]
        assert r["rec_type"] == "revisit" and r["n_bytes"] == 0
        assert r["refers_to"] == "http://a.test/0"
        assert r["payload_digest"] == got["http://a.test/0"]["payload_digest"]
        assert r["payload_digest"].startswith("md5:")
    # profile header present in raw bytes of the revisit leg
    import gzip as _gz
    import pathlib

    raw = b"".join(
        _gz.decompress(p.read_bytes()[:0]) or _gz.open(p, "rb").read()
        for p in sorted(pathlib.Path(out1, "revisits").glob("*.warc.gz"))
    )
    assert REVISIT_PROFILE.encode() in raw

    # determinism: re-export byte-identical
    out2 = str(tmp_path / "w2")
    export_warc_deduped(df, out2, num_files=2).collect()
    for sub in ("originals", "revisits"):
        a = sorted(pathlib.Path(out1, sub).glob("*"))
        b = sorted(pathlib.Path(out2, sub).glob("*"))
        assert [p.name for p in a] == [p.name for p in b]
        for pa_, pb_ in zip(a, b):
            assert pa_.read_bytes() == pb_.read_bytes()
