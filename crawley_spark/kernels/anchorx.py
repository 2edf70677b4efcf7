"""Anchor-text extraction kernel: (resolved href, link text) pairs.

The reference's HTML extractor (internal/links/html.go, re-derived in
kernels/htmlx.py) emits bare URLs and drops the anchor text; for search
and training-data pipelines the text *inside* ``<a>`` is the classic
relevance/link-graph signal (it is what anchors BM25F fields and what
crawl frontiers use as a topical prior). This kernel walks the HTML once
with the stdlib parser and yields ``(url, text)`` for every ``<a href>``
whose href resolves via the engine's own clean_url (so the URL set is
exactly what the crawl frontier would see — same canonicalization, same
rejects).

Semantics (documented, mirrored by the driver oracle):

- anchor text = character data + decoded entity/char refs between the
  ``<a>`` start tag and its ``</a>``, whitespace-collapsed and trimmed
- nested ``<a>`` is invalid HTML; a new ``<a>`` implicitly closes the
  open one (the browser rule)
- an unclosed ``<a>`` at EOF still emits (with whatever text accumulated)
- ``<a>`` without a usable href (missing, or clean_url rejects) emits
  nothing
- empty anchor text emits with ``text = ''`` (image links etc. — the
  caller decides whether to filter)
"""

from __future__ import annotations

from html.parser import HTMLParser

from .clean import clean_url
from .gourl import GoURL


class _AnchorParser(HTMLParser):
    def __init__(self, base: GoURL, out: list):
        super().__init__(convert_charrefs=True)
        self.base = base
        self.out = out
        self.cur_url: str | None = None
        self.cur_text: list[str] = []

    def _flush(self):
        if self.cur_url is not None:
            text = " ".join("".join(self.cur_text).split())
            self.out.append((self.cur_url, text))
        self.cur_url = None
        self.cur_text = []

    def handle_starttag(self, tag, attrs):
        if tag != "a":
            return
        self._flush()  # implicit close of a dangling <a>
        href = next((v for k, v in attrs if k == "href" and v), None)
        if href is None:
            return
        uri, ok = clean_url(self.base, href)
        if ok:
            self.cur_url = uri

    def handle_endtag(self, tag):
        if tag == "a":
            self._flush()

    def handle_data(self, data):
        if self.cur_url is not None:
            self.cur_text.append(data)


def extract_anchors(body: str, base: GoURL) -> list[tuple[str, str]]:
    """All (resolved url, collapsed anchor text) pairs in document order."""
    out: list[tuple[str, str]] = []
    p = _AnchorParser(base, out)
    p.feed(body)
    p.close()
    p._flush()  # unclosed <a> at EOF
    return out
