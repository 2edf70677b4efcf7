"""Sitemap XML sink (and distributed re-reader) — the inverse of the
reference's sitemap *parser* (kernels/sitemapx.py, reproducing
internal/links/sitemap.go:19-53).

A crawler that discovers a site should also be able to publish one: the
sitemaps.org protocol caps a ``<urlset>`` file at 50,000 URLs, above
which a site ships many files plus a ``<sitemapindex>``. This sink writes
that layout from a crawl result frame, deterministically: URLs are
grouped per host, sorted bytewise, and chunked into files of
``max_urls_per_file``, so re-exporting the same frame yields
byte-identical files (the property that lets the ``sitemap_roundtrip``
driver oracle be hash-exact, same discipline as sources/warc.py).

Scale shape: host and chunk are assigned JVM-side (one hash shuffle on
host + an in-partition sort — no global sort; the window is
host-partitioned exactly like operators/snapshot.change_rate), then the
writer is one Arrow-batched pass that opens a new file at every
(host, chunk) boundary. File names embed md5(host) so two hosts can
never collide after sanitization. The optional ``sitemapindex.xml`` is
driver-written from the collected manifest — bounded: one entry per
50k-URL file, i.e. ~200k entries even at 10^10 URLs.

Reading back uses the engine's own extraction kernel
(kernels/sitemapx.extract_sitemap) over a ``binaryFile`` scan — one task
per file, the WARC-reader shape — so the roundtrip exercises the exact
code path a crawl over a sitemap source runs.
"""

from __future__ import annotations

import hashlib
import os
import re
from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SITEMAP_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"
MAX_URLS_PER_FILE = 50_000  # sitemaps.org protocol limit

_MANIFEST_SCHEMA = "path string, host string, chunk long, n_urls long"
_HOST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
        .replace("'", "&apos;")
    )


def _host_slug(host: str) -> str:
    safe = re.sub(r"[^A-Za-z0-9.-]", "_", host)[:40]
    return f"{safe}-{hashlib.md5(host.encode('utf-8')).hexdigest()[:8]}"


def write_sitemaps(
    df: DataFrame,
    out_dir: str,
    *,
    url_col: str = "url",
    lastmod_col: str | None = None,
    max_urls_per_file: int = MAX_URLS_PER_FILE,
    index: bool = True,
) -> DataFrame:
    """Export a URL frame as per-host sitemap XML files; returns the
    manifest (path, host, chunk, n_urls) — an action on it materializes
    the files (the write_warc contract).

    ``lastmod_col`` (timestamp) adds ``<lastmod>`` in W3C date format,
    rendered JVM-side with ``date_format`` so the Arrow worker only sees
    strings. Executors write to ``out_dir`` directly — local-mode
    semantics; point it at shared storage on a real cluster.

    When ``index`` is set, a ``sitemapindex.xml`` referencing every
    written file (relative names, bytewise-sorted) is driver-written
    after the manifest is collected; call pattern:
    ``write_sitemaps(...).collect()`` materializes files + index.
    """
    host = F.regexp_extract(F.col(url_col), _HOST_RE, 1)
    sel = df.select(
        F.col(url_col).alias("url"),
        host.alias("host"),
        (
            F.date_format(F.col(lastmod_col), "yyyy-MM-dd")
            if lastmod_col
            else F.lit(None).cast("string")
        ).alias("lastmod"),
    )
    w = Window.partitionBy("host").orderBy("url")
    chunked = sel.withColumn(
        "chunk",
        ((F.row_number().over(w) - F.lit(1)) / F.lit(max_urls_per_file))
        .cast("long"),
    )
    # co-locate each (host, chunk) in one task, ordered; the repartition
    # key includes chunk so a 50k+ host spreads across tasks
    arranged = chunked.repartition(F.col("host"), F.col("chunk")).sortWithinPartitions(
        "host", "chunk", "url"
    )
    os.makedirs(out_dir, exist_ok=True)

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        manifest: list[dict] = []
        cur_key: tuple[str, int] | None = None
        fh = None
        n_urls = 0
        path = ""

        def close():
            nonlocal fh, n_urls
            if fh is not None:
                fh.write(b"</urlset>\n")
                fh.close()
                manifest.append(
                    {
                        "path": path,
                        "host": cur_key[0],
                        "chunk": cur_key[1],
                        "n_urls": n_urls,
                    }
                )
                fh = None
                n_urls = 0

        for batch in batches:
            urls = batch.column("url").to_pylist()
            hosts = batch.column("host").to_pylist()
            lastmods = batch.column("lastmod").to_pylist()
            chunks = batch.column("chunk").to_pylist()
            for u, h, lm, c in zip(urls, hosts, lastmods, chunks):
                key = (h, c)
                if key != cur_key:
                    close()
                    cur_key = key
                    path = os.path.join(
                        out_dir, f"sitemap-{_host_slug(h)}-{c:05d}.xml"
                    )
                    fh = open(path, "wb")
                    fh.write(
                        b'<?xml version="1.0" encoding="UTF-8"?>\n'
                        b'<urlset xmlns="' + SITEMAP_NS.encode() + b'">\n'
                    )
                entry = f"<url><loc>{_xml_escape(u)}</loc>"
                if lm is not None:
                    entry += f"<lastmod>{lm}</lastmod>"
                entry += "</url>\n"
                fh.write(entry.encode("utf-8"))
                n_urls += 1
        close()
        if manifest:
            yield pa.RecordBatch.from_pylist(
                manifest,
                schema=pa.schema(
                    [
                        ("path", pa.string()),
                        ("host", pa.string()),
                        ("chunk", pa.int64()),
                        ("n_urls", pa.int64()),
                    ]
                ),
            )

    out = arranged.mapInArrow(run, _MANIFEST_SCHEMA)
    if not index:
        return out
    # index is a driver-side finalize over the bounded manifest
    rows = out.collect()
    names = sorted(os.path.basename(r["path"]) for r in rows)
    with open(os.path.join(out_dir, "sitemapindex.xml"), "wb") as fh:
        fh.write(
            b'<?xml version="1.0" encoding="UTF-8"?>\n'
            b'<sitemapindex xmlns="' + SITEMAP_NS.encode() + b'">\n'
        )
        for n in names:
            fh.write(
                f"<sitemap><loc>{_xml_escape(n)}</loc></sitemap>\n".encode()
            )
        fh.write(b"</sitemapindex>\n")
    return df.sparkSession.createDataFrame(rows, schema=_MANIFEST_SCHEMA)


def read_sitemaps(
    spark: SparkSession, path: str, *, base_url: str = "http://localhost/"
) -> DataFrame:
    """Distributed sitemap parse: binaryFile scan (one task per file) ->
    the engine's own extract_sitemap kernel -> (path, url) rows. ``url``
    is post-clean_url canonical form, exactly what a crawl over a sitemap
    source feeds the frontier."""
    from crawley_spark.kernels.gourl import URLError, parse
    from crawley_spark.kernels.sitemapx import extract_sitemap

    bf = (
        spark.read.format("binaryFile")
        .load(os.path.join(path, "sitemap-*.xml"))
        .select("path", "content")
    )

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        try:
            base = parse(base_url)
        except URLError as exc:
            raise ValueError(f"bad base_url: {base_url!r}") from exc
        for batch in batches:
            paths = batch.column("path").to_pylist()
            blobs = batch.column("content").to_pylist()
            rows = []
            for p, blob in zip(paths, blobs):
                found: list[str] = []
                extract_sitemap(
                    blob.decode("utf-8", "surrogateescape"), base, found.append
                )
                rows.extend({"path": p, "url": u} for u in found)
            if rows:
                yield pa.RecordBatch.from_pylist(
                    rows,
                    schema=pa.schema([("path", pa.string()), ("url", pa.string())]),
                )

    return bf.mapInArrow(run, "path string, url string")
