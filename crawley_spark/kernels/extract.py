"""Per-page candidate extraction + per-candidate classification.

This is the single source of truth for the reference's worker/driver row
semantics (crawler.go:119-196, 265-362), shared by the pure-Python reference
interpreter (crawley_spark.interp) and the Spark engine's Arrow-batched UDF
(crawley_spark.functions.extract_udf). The golden-vector tests in tests/
anchor it to the Go behavior; Spark-vs-interpreter parity tests then verify
the distributed orchestration (ordering, dedup, iteration) independently.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

from . import gourl
from .clean import handle_static
from .cssx import extract_css
from .gourl import GoURL, URLError
from .htmlx import HTMLParams, extract_html
from .jsx import extract_js
from .paths import (
    can_crawl,
    can_parse,
    content_class,
    is_css,
    is_html,
    is_js,
    is_resource,
    is_sitemap,
    url_seen_key,
)
from .sitemapx import extract_sitemap

_CT_BY_CLASS = {"html": "text/html", "js": "application/javascript", "css": "text/css"}


def effective_content_type(url: str, content_type: str | None, path: str | None = None) -> str:
    """Corpus content type: explicit column if present, else derived from the
    URL per the corpus rule (FIXTURES.md §1)."""
    if content_type is not None:
        return content_type
    return _CT_BY_CLASS.get(content_class(url, path), "")


def fetch_gate(u: GoURL, url: str, ct: str, cfg) -> bool:
    """Worker pre-parse gate (crawler.go:375-390): headless → canParse on the
    path; otherwise the HEAD content-type dispatch check."""
    if cfg.no_head:
        return can_parse(u.path)
    return (
        is_html(ct)
        or is_sitemap(url)
        or (cfg.scan_js and is_js(ct, url))
        or (cfg.scan_css and is_css(ct, url))
    )


def page_candidates(url: str, u: GoURL, body: str, ct: str, cfg, tag_filter) -> list:
    """process() dispatch (crawler.go:306-362) → ordered [(tag, uri), ...]."""
    cands: list = []

    def link_handler(tag: str, s: str) -> None:
        cands.append((tag, s))

    def hstatic(s: str) -> None:
        rv, ok = handle_static(url, u.scheme, s)
        if ok:
            link_handler("link", rv)

    def crawl_handler(s: str) -> None:
        link_handler("a", s)

    if is_html(ct):
        extract_html(
            body,
            u,
            HTMLParams(
                filter=tag_filter,
                handle_html=link_handler,
                handle_static=hstatic,
                brute=cfg.brute,
                scan_js=cfg.scan_js,
                scan_css=cfg.scan_css,
            ),
        )
    elif is_sitemap(url):
        extract_sitemap(body, u, crawl_handler)
    elif cfg.scan_js and is_js(ct, url):
        extract_js(body, hstatic)
    elif cfg.scan_css and is_css(ct, url):
        extract_css(body, hstatic)
    return cands


@dataclass
class Candidate:
    uri: str
    url_key: str
    host: str
    enqueue_ok: bool
    can_fetch: bool
    emit_ok: bool


@lru_cache(maxsize=65536)
def _parse_ro(uri: str):
    """Memoized parse for READ-ONLY use (candidate URLs repeat heavily
    across pages). Callers must never mutate the returned GoURL."""
    try:
        return gourl.parse(uri)
    except URLError:
        return None


def classify_candidate(cfg, robots, base: GoURL, tag: str, uri: str) -> Candidate:
    """Driver-loop per-candidate decisions: crawl class (crawler.go:275-296),
    ignore filter (265-273), tryEnqueue predicates (172-194), tryHandle
    emission policy (144-170)."""
    fetch_cls = (
        tag in ("a", "iframe")
        or (cfg.scan_js and tag == "script")
        or (cfg.scan_css and tag == "link")
    )
    ignored = bool(cfg.ignored) and any(s in uri for s in cfg.ignored)
    enqueue_ok = False
    can_fetch = True
    host = ""
    if fetch_cls and not ignored:
        u = _parse_ro(uri)
        if u is not None and (
            can_crawl(base, u, cfg.depth, cfg.subdomains)
            and not robots.forbidden(u.path)
            and not (cfg.dirs_policy == "only" and is_resource(u.path))
        ):
            enqueue_ok = True
            host = u.host
            if cfg.no_head:
                can_fetch = can_parse(u.path)
    # tryHandle (crawler.go:144-170) — on the raw URL *string*
    idx = uri.rfind("/")
    if idx == -1:
        emit = False
    elif cfg.dirs_policy == "hide":
        emit = is_resource(uri[idx:])
    elif cfg.dirs_policy == "only":
        emit = not is_resource(uri[idx:])
    else:
        emit = True
    return Candidate(uri, url_seen_key(uri), host, enqueue_ok, can_fetch, emit)
