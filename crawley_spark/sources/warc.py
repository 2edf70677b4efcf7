"""WARC 1.1 source/sink (ISO 28500) — the container Common Crawl actually
ships, so the BASELINE.json "Common-Crawl-style web pages" corpus can be
ingested from / exported to its native format, not just parquet.

Scale model (the real-world Common Crawl layout): a crawl is tens of
thousands of ~1 GB ``.warc.gz`` files, each a stream of per-record gzip
members. The distribution unit is the FILE — ``binaryFile`` scan, one task
per file — which is exactly how production Spark WARC readers work
(per-record members make the stream seekable, but whole-file tasks are the
throughput shape; a 1 GB member-stream inflates to ~5 GB, well inside task
memory). The parse itself is a single pass over bytes in an Arrow-batched
worker; everything downstream (timestamp parse, filtering, the fetch join)
is JVM column expressions.

Writer determinism: record ids are ``urn:uuid`` values derived from
md5(url, date, payload) and gzip members are written with ``mtime=0``, so
re-exporting the same frame yields byte-identical records — which is what
lets the ``warc_roundtrip`` driver oracle be hash-exact.

Strictness: a malformed record (bad version line, missing Content-Length,
truncated block) raises ``ValueError`` with file + stream offset — a crawl
archive with undetected torn records silently corrupts every downstream
count, so there is no skip-bad-records mode.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os
import uuid
from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF = b"\r\n"
_VERSIONS = (b"WARC/1.1", b"WARC/1.0")
_WARC_DATE_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"


# ---------------------------------------------------------------------------
# record building (writer side)
# ---------------------------------------------------------------------------


def _record_id(*parts: bytes) -> str:
    h = hashlib.md5(b"\x00".join(parts)).digest()
    return f"<urn:uuid:{uuid.UUID(bytes=h)}>"


def _build_record(rec_type: str, headers: list, block: bytes) -> bytes:
    """One WARC 1.1 record: version line, named fields, blank line,
    Content-Length octets of block, two CRLF separators."""
    buf = io.BytesIO()
    buf.write(_VERSIONS[0] + _CRLF)
    buf.write(b"WARC-Type: %s\r\n" % rec_type.encode("ascii"))
    for k, v in headers:
        buf.write(("%s: %s\r\n" % (k, v)).encode("utf-8"))
    buf.write(b"Content-Length: %d\r\n" % len(block))
    buf.write(_CRLF)
    buf.write(block)
    buf.write(_CRLF + _CRLF)
    return buf.getvalue()


def _warcinfo_record(filename: str) -> bytes:
    block = b"software: crawley-spark\r\nformat: WARC File Format 1.1\r\n"
    headers = [
        ("WARC-Record-ID", _record_id(b"warcinfo", filename.encode("utf-8"))),
        ("WARC-Date", "1970-01-01T00:00:00Z"),
        ("WARC-Filename", filename),
        ("Content-Type", "application/warc-fields"),
    ]
    return _build_record("warcinfo", headers, block)


# ---------------------------------------------------------------------------
# sink
# ---------------------------------------------------------------------------

_MANIFEST_SCHEMA = "path string, n_records long, n_payload_bytes long"


def write_warc(
    df: DataFrame,
    out_dir: str,
    *,
    url_col: str = "url",
    payload_col: str = "payload",
    ts_col: str | None = None,
    content_type_col: str | None = None,
    default_content_type: str = "application/octet-stream",
    record_type: str = "resource",
    status_col: str | None = None,
    compress: bool = True,
    num_files: int | None = None,
    warcinfo: bool = True,
    extra_header_cols: list | None = None,
) -> DataFrame:
    """Export a frame as WARC files, one per partition, returning a manifest
    DataFrame (path, n_records, n_payload_bytes).

    ``record_type="response"`` writes capture-shaped records (the Common
    Crawl layout): the block is an HTTP response envelope — status line
    from ``status_col`` (null -> 200) + a Content-Type header — followed by
    the payload, and the WARC-level Content-Type becomes
    ``application/http;msgtype=response`` so ``read_warc(http_parse=True)``
    splits it back out.

    The WARC-Date string is formatted JVM-side (``date_format``) so the
    Python worker never touches Arrow timestamps — it sees only strings and
    bytes. ``num_files`` hash-repartitions on the url so the file <-> record
    assignment is deterministic across retries; omitted, the input's own
    partitioning is kept (the 100 TB case: the upstream stage already chose
    a sensible width, don't add a shuffle).

    Executors write to ``out_dir`` directly — local-mode semantics; on a
    real cluster point it at shared storage (the same contract as any
    Hadoop OutputFormat side-file sink).

    ``extra_header_cols``: optional ``[(warc_header_name, column_name)]``
    — per-record WARC headers sourced from string columns; null values
    omit the header for that record (how revisit-specific headers ride
    the shared writer).
    """
    if ts_col is not None:
        wdate = F.date_format(F.col(ts_col), _WARC_DATE_FMT)
    else:
        wdate = F.lit("1970-01-01T00:00:00Z")
    ctype = F.col(content_type_col) if content_type_col else F.lit(default_content_type)
    envelope = record_type == "response"
    status = (
        F.coalesce(F.col(status_col).cast("int"), F.lit(200))
        if status_col
        else F.lit(200)
    )
    extra = list(extra_header_cols or [])
    sel = df.select(
        F.col(url_col).alias("url"),
        F.col(payload_col).cast("binary").alias("payload"),
        wdate.alias("wdate"),
        ctype.alias("ctype"),
        status.alias("status"),
        *[
            F.col(col).cast("string").alias(f"_xh{i}")
            for i, (_h, col) in enumerate(extra)
        ],
    )
    if num_files is not None:
        sel = sel.repartition(num_files, F.col("url"))
    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if compress else ".warc"

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        name = f"part-{pid:05d}{ext}"
        path = os.path.join(out_dir, name)
        fh = None
        n_records = 0
        n_payload = 0

        def emit(rec: bytes):
            fh.write(gzip.compress(rec, mtime=0) if compress else rec)

        for batch in batches:
            urls = batch.column("url").to_pylist()
            payloads = batch.column("payload").to_pylist()
            wdates = batch.column("wdate").to_pylist()
            ctypes = batch.column("ctype").to_pylist()
            statuses = batch.column("status").to_pylist()
            extras = [
                (h, batch.column(f"_xh{i}").to_pylist())
                for i, (h, _c) in enumerate(extra)
            ]
            if fh is None and urls:
                fh = open(path, "wb")
                if warcinfo:
                    emit(_warcinfo_record(name))
            for row_i, (u, p, d, c, st) in enumerate(
                zip(urls, payloads, wdates, ctypes, statuses)
            ):
                p = p or b""
                if envelope:
                    block = (
                        b"HTTP/1.1 %d OK\r\nContent-Type: %s\r\n\r\n"
                        % (st, c.encode("utf-8"))
                    ) + p
                    rec_ctype = "application/http;msgtype=response"
                else:
                    block, rec_ctype = p, c
                headers = [
                    ("WARC-Record-ID", _record_id(u.encode("utf-8"), d.encode("ascii"), block)),
                    ("WARC-Date", d),
                    ("WARC-Target-URI", u),
                    ("Content-Type", rec_ctype),
                ]
                for h, vals in extras:
                    if vals[row_i] is not None:
                        headers.append((h, vals[row_i]))
                emit(_build_record(record_type, headers, block))
                n_records += 1
                n_payload += len(p)
        if fh is None:  # empty partition: no file
            return
        fh.close()
        yield pa.RecordBatch.from_pylist(
            [{"path": path, "n_records": n_records, "n_payload_bytes": n_payload}],
            schema=pa.schema(
                [("path", pa.string()), ("n_records", pa.int64()), ("n_payload_bytes", pa.int64())]
            ),
        )

    return sel.mapInArrow(run, _MANIFEST_SCHEMA)


# ---------------------------------------------------------------------------
# source
# ---------------------------------------------------------------------------

_READ_DDL = (
    "file string, rec_offset long, rec_type string, url string, warc_date string, "
    "content_type string, http_status int, http_content_type string, "
    "payload binary, n_bytes long, refers_to string, payload_digest string"
)
_READ_ARROW_SCHEMA = pa.schema(
    [
        ("file", pa.string()),
        ("rec_offset", pa.int64()),
        ("rec_type", pa.string()),
        ("url", pa.string()),
        ("warc_date", pa.string()),
        ("content_type", pa.string()),
        ("http_status", pa.int32()),
        ("http_content_type", pa.string()),
        ("payload", pa.binary()),
        ("n_bytes", pa.int64()),
        ("refers_to", pa.string()),
        ("payload_digest", pa.string()),
    ]
)


def _parse_warc_stream(data: bytes, fname: str, http_parse: bool) -> Iterator[dict]:
    """Single pass over an uncompressed WARC byte stream. Offsets reported
    are positions in the UNCOMPRESSED stream (stable across gzip framing)."""
    pos = 0
    n = len(data)
    while pos < n:
        while data.startswith(_CRLF, pos):  # inter-record slack
            pos += 2
        if pos >= n:
            break
        rec_off = pos
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            raise ValueError(f"{fname}: truncated WARC header at offset {rec_off}")
        lines = data[pos:hdr_end].split(_CRLF)
        if lines[0] not in _VERSIONS:
            raise ValueError(f"{fname}: bad WARC version line at offset {rec_off}: {lines[0]!r}")
        fields: dict = {}
        last_key = None
        for raw in lines[1:]:
            if raw[:1] in (b" ", b"\t"):  # folded continuation (spec 4)
                if last_key is None:
                    raise ValueError(f"{fname}: continuation before any field at offset {rec_off}")
                fields[last_key] += b" " + raw.strip()
                continue
            k, sep, v = raw.partition(b":")
            if not sep:
                raise ValueError(f"{fname}: malformed header line at offset {rec_off}: {raw!r}")
            last_key = k.strip().lower()
            fields[last_key] = v.strip()
        try:
            clen = int(fields[b"content-length"])
        except (KeyError, ValueError):
            raise ValueError(f"{fname}: missing/bad Content-Length at offset {rec_off}") from None
        block_start = hdr_end + 4
        if block_start + clen > n:
            raise ValueError(
                f"{fname}: truncated block at offset {rec_off} "
                f"(need {clen} bytes, have {n - block_start})"
            )
        block = data[block_start : block_start + clen]
        pos = block_start + clen
        rec_type = fields.get(b"warc-type", b"").decode("utf-8", "replace")
        ctype = fields.get(b"content-type", b"").decode("utf-8", "replace") or None
        url_raw = fields.get(b"warc-target-uri", b"").strip(b"<>")
        payload, status, http_ctype = block, None, None
        if http_parse and rec_type == "response" and (ctype or "").startswith("application/http"):
            env_end = block.find(_CRLF + _CRLF)
            if env_end >= 0:
                env_lines = block[:env_end].split(_CRLF)
                status_line = env_lines[0].split(b" ")
                if len(status_line) >= 2 and status_line[0].startswith(b"HTTP/"):
                    try:
                        status = int(status_line[1])
                        payload = block[env_end + 4 :]
                    except ValueError:
                        pass
                if status is not None:
                    for ln in env_lines[1:]:
                        k, sep, v = ln.partition(b":")
                        if sep and k.strip().lower() == b"content-type":
                            http_ctype = v.strip().decode("utf-8", "replace")
                            break
        yield {
            "file": fname,
            "rec_offset": rec_off,
            "rec_type": rec_type,
            "url": url_raw.decode("utf-8", "replace") or None,
            "warc_date": fields.get(b"warc-date", b"").decode("ascii", "replace") or None,
            "content_type": ctype,
            "http_status": status,
            "http_content_type": http_ctype,
            "payload": payload,
            "n_bytes": len(payload),
            "refers_to": (
                fields.get(b"warc-refers-to-target-uri", b"")
                .strip(b"<>")
                .decode("utf-8", "replace")
                or None
            ),
            "payload_digest": (
                fields.get(b"warc-payload-digest", b"").decode("ascii", "replace")
                or None
            ),
        }


def read_warc(spark: SparkSession, path: str, *, http_parse: bool = False) -> DataFrame:
    """Distributed WARC read: ``binaryFile`` scan (one task per file) ->
    Arrow-batched parse. Handles plain ``.warc`` and multi-member
    ``.warc.gz`` (stdlib gzip decodes concatenated members in one call).

    With ``http_parse=True``, ``response`` records carrying an
    ``application/http`` envelope are split: ``http_status`` is filled and
    ``payload`` becomes the HTTP body (the Common Crawl shape — body is the
    HTML the fetch join wants). ``warc_ts`` is derived JVM-side from the
    raw WARC-Date string.
    """
    bf = spark.read.format("binaryFile").load(path).select("path", "content")

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            paths = batch.column("path").to_pylist()
            contents = batch.column("content").to_pylist()
            for fname, data in zip(paths, contents):
                if data[:2] == b"\x1f\x8b":
                    data = gzip.decompress(data)
                rows = list(_parse_warc_stream(data, fname, http_parse))
                if rows:
                    yield pa.RecordBatch.from_pylist(rows, schema=_READ_ARROW_SCHEMA)

    parsed = bf.mapInArrow(run, _READ_DDL)
    return parsed.withColumn("warc_ts", F.to_timestamp("warc_date", _WARC_DATE_FMT))


def pages_from_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC capture files -> the engine's corpus schema: ``response``
    records become (url, warc_ts, html, content_type, status) rows, ready
    for ``engine.crawl`` / ``sources.pages.prepare_pages``. Crawling a
    WARC-sourced corpus is byte-identical to crawling the same pages from
    parquet (pinned by tests/test_warc.py::test_crawl_parity)."""
    w = read_warc(spark, path, http_parse=True)
    return w.filter(
        (F.col("rec_type") == "response") & F.col("http_status").isNotNull()
    ).select(
        "url",
        "warc_ts",
        F.col("payload").alias("html"),
        F.col("http_content_type").alias("content_type"),
        F.col("http_status").alias("status"),
    )


def export_wet(
    df: DataFrame,
    out_dir: str,
    *,
    url_col: str = "url",
    text_col: str = "text",
    ts_col: str | None = None,
    compress: bool = True,
    num_files: int | None = None,
) -> DataFrame:
    """WET export — Common Crawl's extracted-plain-text sibling of the
    capture WARC (public format: WET files are WARC containers whose
    records are ``WARC-Type: conversion`` with a ``text/plain`` block,
    one per source URL). Thin, deliberately: the writer is
    :func:`write_warc` with the conversion record type, so the format,
    determinism (byte-identical re-export), gzip member layout, and the
    num_files contract are all the already-tested WARC machinery; the
    reader is plain :func:`read_warc` filtered on ``rec_type =
    'conversion'``. Returns the manifest frame."""
    frame = df.select(
        F.col(url_col).alias("url"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        *([F.col(ts_col).alias("_ts")] if ts_col else []),
    )
    return write_warc(
        frame,
        out_dir,
        payload_col="payload",
        ts_col="_ts" if ts_col else None,
        default_content_type="text/plain; charset=utf-8",
        record_type="conversion",
        compress=compress,
        num_files=num_files,
    )


REVISIT_PROFILE = "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest"


def export_warc_deduped(
    df: DataFrame,
    out_dir: str,
    *,
    url_col: str = "url",
    payload_col: str = "payload",
    ts_col: str | None = None,
    content_type_col: str | None = None,
    default_content_type: str = "application/octet-stream",
    compress: bool = True,
    num_files: int | None = None,
) -> DataFrame:
    """Digest-deduplicated WARC export — the Common Crawl / Wayback
    practice (public WARC 1.1 spec §6.7.2): the FIRST capture of each
    distinct payload is written as a full ``resource`` record; every other
    capture becomes a ``revisit`` record with the identical-payload-digest
    profile, an empty block, ``WARC-Refers-To-Target-URI`` pointing at the
    canonical capture, and ``WARC-Payload-Digest`` carrying the digest.
    "First" is deterministic: the bytewise-smallest URL per digest (wall
    clocks are not reproducible; URL order is).

    Scale shape: digests are computed map-side (md5 of the payload, JVM);
    the canonical-capture choice is ONE hash exchange clustering rows by
    digest (the same unavoidable content shuffle every exact-dedup carries
    — c4_span_dedup's documented shape), after which originals and
    revisits are written by the shared :func:`write_warc` (revisit blocks
    are empty, so the revisit leg shuffles scalars only at write width).

    Writes ``originals/`` and ``revisits/`` subdirectories (the two record
    shapes get separate manifest rows; read them back together with
    ``read_warc(spark, out_dir + "/*")``). Returns the union of the two
    manifests."""
    from pyspark.sql import Window

    base = df.select(
        F.col(url_col).alias("url"),
        F.col(payload_col).cast("binary").alias("payload"),
        *([F.col(ts_col).alias("_ts")] if ts_col else []),
        *([F.col(content_type_col).alias("_ct")] if content_type_col else []),
    ).withColumn("digest", F.md5(F.col("payload")))
    w = Window.partitionBy("digest").orderBy("url")
    marked = base.withColumn("_canon", F.first("url").over(w)).localCheckpoint(
        eager=False
    )
    kw = dict(
        ts_col="_ts" if ts_col else None,
        content_type_col="_ct" if content_type_col else None,
        default_content_type=default_content_type,
        compress=compress,
        num_files=num_files,
    )
    # digest header carries an algorithm label (spec: labelled digest)
    originals = marked.filter(F.col("url") == F.col("_canon")).withColumn(
        "_dg", F.concat(F.lit("md5:"), "digest")
    )
    man_o = write_warc(
        originals,
        os.path.join(out_dir, "originals"),
        record_type="resource",
        extra_header_cols=[("WARC-Payload-Digest", "_dg")],
        **kw,
    )
    revisits = (
        marked.filter(F.col("url") != F.col("_canon"))
        .withColumn("payload", F.lit(b""))
        .withColumn("_dg", F.concat(F.lit("md5:"), "digest"))
        .withColumn("_prof", F.lit(REVISIT_PROFILE))
    )
    man_r = write_warc(
        revisits,
        os.path.join(out_dir, "revisits"),
        record_type="revisit",
        extra_header_cols=[
            ("WARC-Payload-Digest", "_dg"),
            ("WARC-Refers-To-Target-URI", "_canon"),
            ("WARC-Profile", "_prof"),
        ],
        **kw,
    )
    return man_o.unionByName(man_r)
