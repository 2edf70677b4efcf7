"""Deterministic synthetic pages-corpus generation.

Two generators:

* ``synth_corpus`` — distributed (mapInPandas over spark.range): an n-page
  multi-host web graph with html/js/css/sitemap/robots content classes, a
  power-law-ish host size distribution (hot-host skew for the politeness /
  salting paths) and deterministic bodies (pure function of page id, seed).
  Scales to bench-size corpora without driver materialization.

* ``corpus_from_documents`` — derives a crawlable corpus from the driver's
  ``documents`` testdata table (TESTDATA.md), embedding each doc's text in
  the page body; used by ``__spark_entry__.entry``.

The ``text`` column is produced by the same ``extract_text`` kernel the
engine's text-extraction UDF uses, so the per-URL byte-identical-text
invariant (BASELINE.json input_hint) is checkable end-to-end.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sources.pages import PAGES_SCHEMA

_WORDS = (
    "the quick brown fox jumps over lazy dog crawl frontier spark shuffle "
    "partition bloom filter robots sitemap depth politeness host anchor link "
    "page index data web graph queue batch arrow kernel parse token"
).split()


def _h(seed: int, *parts: int) -> int:
    b = hashlib.blake2b(digest_size=8)
    b.update(repr((seed, parts)).encode())
    return int.from_bytes(b.digest(), "big")


def _host_of(pid: int, n_hosts: int, seed: int) -> int:
    """Host assignment with deliberate hot-host skew: host 0 owns ~half the
    pages (exercises the politeness window + salting paths)."""
    if pid < n_hosts:
        return pid  # page ids < n_hosts are the host root pages
    if n_hosts == 1 or pid % 2 == 0:
        return 0
    return 1 + (_h(seed, pid) % (n_hosts - 1))


def _page_url(pid: int, n_hosts: int, seed: int) -> str:
    host = _host_of(pid, n_hosts, seed)
    if pid < n_hosts:
        return f"http://h{host}.test"
    return f"http://h{host}.test/p{pid}"


def _page_body(pid: int, n_pages: int, n_hosts: int, links_per_page: int, seed: int, body_words: int = 24) -> tuple:
    url = _page_url(pid, n_hosts, seed)
    parts = [f"<html><head><title>page {pid}</title></head><body>"]
    for k in range(links_per_page):
        tgt = _h(seed, pid, k) % n_pages
        t_url = _page_url(tgt, n_hosts, seed)
        if k % 4 == 3 or tgt < n_hosts:
            parts.append(f'<a href="{t_url}">x{k}</a>')  # absolute (maybe cross-host)
        else:
            parts.append(f'<a href="/p{tgt}">l{k}</a>')  # same-host-relative form
    parts.append(f'<img src="/img/{pid % 97}.png"/>')
    words = " ".join(_WORDS[_h(seed, pid, 100 + i) % len(_WORDS)] for i in range(body_words))
    parts.append(f"<p>{words}</p>")
    parts.append("</body></html>")
    return url, "".join(parts)


def synth_corpus(
    spark: SparkSession,
    n_pages: int = 10_000,
    n_hosts: int = 20,
    links_per_page: int = 8,
    seed: int = 42,
    body_words: int = 24,
) -> DataFrame:
    params = (n_pages, n_hosts, links_per_page, seed, body_words)

    def gen(batches):
        import datetime

        import pandas as pd

        from .kernels.htmlx import extract_text

        n_pages, n_hosts, links_per_page, seed, body_words = params
        ts = datetime.datetime(2026, 1, 1)
        for pdf in batches:
            rows = []
            for pid in pdf["id"].values:
                url, body = _page_body(int(pid), n_pages, n_hosts, links_per_page, seed, body_words)
                rows.append((url, ts, body.encode(), extract_text(body), "en"))
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    return spark.range(n_pages).mapInPandas(gen, PAGES_SCHEMA)


def corpus_from_documents(documents: DataFrame, n_hosts: int = 7, links_per_page: int = 6) -> DataFrame:
    """Derive a crawlable pages corpus from the testdata ``documents`` table:
    url = http://h{doc_id % n_hosts}.test/d{doc_id}; each page links to the
    next ``links_per_page`` documents (same-host relative + cross-host
    absolute), body embeds the document text."""
    spark = documents.sparkSession
    n_docs = documents.count()
    params = (n_hosts, links_per_page, n_docs)

    # per-host root pages (the crawl seeds): link to that host's first docs
    import datetime

    root_rows = []
    ts = datetime.datetime(2026, 1, 1)
    from .kernels.htmlx import extract_text as _xt

    for h in range(n_hosts):
        links = "".join(
            f'<a href="/d{h + k * n_hosts}">d{h + k * n_hosts}</a>'
            for k in range(8)
            if h + k * n_hosts < n_docs
        )
        body = f"<html><body><h1>host h{h}</h1>{links}</body></html>"
        root_rows.append((f"http://h{h}.test", ts, body.encode(), _xt(body), "en"))
    roots = spark.createDataFrame(root_rows, PAGES_SCHEMA)

    def gen(batches):
        import datetime

        import pandas as pd

        from .kernels.htmlx import extract_text

        n_hosts, links_per_page, n_docs = params
        ts = datetime.datetime(2026, 1, 1)
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"].values, pdf["text"].values):
                doc_id = int(doc_id)
                host = doc_id % n_hosts
                url = f"http://h{host}.test/d{doc_id}"
                parts = ["<html><body>"]
                for k in range(1, links_per_page + 1):
                    tgt = (doc_id + k * k) % n_docs
                    t_host = tgt % n_hosts
                    if t_host == host:
                        parts.append(f'<a href="/d{tgt}">d{tgt}</a>')
                    else:
                        parts.append(f'<a href="http://h{t_host}.test/d{tgt}">d{tgt}</a>')
                parts.append(f"<p>{text}</p></body></html>")
                body = "".join(parts)
                rows.append((url, ts, body.encode(), extract_text(body), "en"))
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    return documents.select("doc_id", "text").mapInPandas(gen, PAGES_SCHEMA).unionByName(roots)
