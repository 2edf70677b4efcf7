"""``<link rel="canonical">`` extraction + alias grouping — the in-page
dedup signal webtext pipelines consume next to URL canonicalization
(operators/urlnorm.py handles the *lossy string* transform; this operator
reads the page's own declared canonical, the rel=canonical convention of
RFC 6596).

Semantics (documented, mirrored by the driver oracle):

- a ``link`` tag whose ``rel`` attribute — a case-insensitive
  space-separated token list (the HTML spec rule) — contains
  ``canonical`` and whose href resolves via the engine's own clean_url
  (same canonicalization and rejects as the crawl frontier);
- the FIRST such tag wins (the browser/search-engine rule for duplicate
  declarations);
- pages without a usable canonical declaration are self-canonical
  (``canonical_url = url``, ``had_tag = false``) — the consumer treats
  every page as its own cluster representative by default.

Scale shape: one Arrow-batched pass over the pages scan (html never
crosses an exchange; output rows are (url, canonical_url, flags) scalars);
:func:`canonical_groups` is one map-side-combined shuffle on the canonical
key carrying counts/mins only — bounded per-key state, no collect_set of
members (the urlnorm.url_canonical_clusters discipline).
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TARGET_SCHEMA = "url string, canonical_url string, had_tag boolean, is_self boolean"
_TARGET_ARROW = pa.schema(
    [
        ("url", pa.string()),
        ("canonical_url", pa.string()),
        ("had_tag", pa.bool_()),
        ("is_self", pa.bool_()),
    ]
)


def _find_canonical(html: str, base) -> str | None:
    """First resolving rel=canonical href in document order, else None."""
    from html.parser import HTMLParser

    from ..kernels.clean import clean_url

    class _P(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.found: str | None = None

        def handle_starttag(self, tag, attrs):
            if self.found is not None or tag != "link":
                return
            a = dict(attrs)
            rel = (a.get("rel") or "").lower().split()
            href = a.get("href")
            if "canonical" not in rel or not href:
                return
            uri, ok = clean_url(base, href)
            if ok:
                self.found = uri

    p = _P()
    try:
        p.feed(html)
        p.close()
    except Exception:
        return None
    return p.found


def canonical_targets(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, canonical_url, had_tag, is_self) per page."""
    from ..kernels.gourl import URLError, parse

    sel = df.select(F.col(url_col).alias("url"), F.col(html_col).alias("html"))

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            urls = batch.column("url").to_pylist()
            htmls = batch.column("html").to_pylist()
            rows = []
            for u, h in zip(urls, htmls):
                if isinstance(h, bytes):
                    h = h.decode("utf-8", "surrogateescape")
                canon = None
                if h is not None:
                    try:
                        canon = _find_canonical(h, parse(u))
                    except URLError:
                        canon = None
                had = canon is not None
                if canon is None:
                    canon = u
                rows.append(
                    {
                        "url": u,
                        "canonical_url": canon,
                        "had_tag": had,
                        "is_self": canon == u,
                    }
                )
            if rows:
                yield pa.RecordBatch.from_pylist(rows, schema=_TARGET_ARROW)

    return sel.mapInArrow(run, _TARGET_SCHEMA)


def canonical_groups(targets: DataFrame) -> DataFrame:
    """Alias-group rollup over :func:`canonical_targets` output:
    (canonical_url, n_members, n_declared, first_member). Counts/mins
    only — bounded per-key state at any group size."""
    return targets.groupBy("canonical_url").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum(F.when(F.col("had_tag"), 1).otherwise(0))
        .cast("long")
        .alias("n_declared"),
        F.min("url").alias("first_member"),
    )
