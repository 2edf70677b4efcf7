"""Pure-Python reference interpreter (parity oracle).

A sequential, single-threaded implementation of the reference's crawl loop
(/root/reference/internal/crawler/crawler.go:81-400) in its canonical
deterministic configuration (workers=1 FIFO BFS — SURVEY.md §3.4). The Spark
engine must produce the same emitted-URL sequence and final URL-seen set.

The live HTTP fetch is replaced by a corpus lookup (BASELINE.json input_hint):
missing pages behave like transport-404s (body still "crawled", no links).

Anchored to the Go behavior by the ported unit-test vectors in tests/ — this
interpreter generates golden outputs for arbitrary synthetic corpora.

Canonical-order notes (divergences documented in SURVEY.md §3.4 / §2.6):
* robots.txt links/sitemaps are injected in *sorted* order (the reference
  iterates an unordered Go map there);
* the reference's drop-on-channel-overflow (crawler.go:163-193) is not
  reproduced (lossless semantics).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from .config import (
    DIRS_HIDE,
    DIRS_ONLY,
    ROBOTS_IGNORE,
    CrawlConfig,
)
from .kernels import gourl
from .kernels.clean import handle_static
from .kernels.gourl import URLError
from .kernels.htmlx import HTMLParams, extract_html
from .kernels.jsx import extract_js
from .kernels.cssx import extract_css
from .kernels.sitemapx import extract_sitemap
from .kernels.paths import (
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
from .kernels import robotsx
from .functions.tags import prepare_filter


@dataclass
class Page:
    """One corpus row. body=None + status>=400 models fetch errors; an
    explicit content_type overrides the URL-derived corpus content class
    (for fixtures ported from the Go test servers that set headers)."""

    body: str | None = None
    status: int = 200
    content_type: str | None = None


@dataclass
class CrawlOutput:
    results: list = field(default_factory=list)  # emitted URLs, canonical order
    seen: dict = field(default_factory=dict)  # seen_key -> first URL string
    fetched: list = field(default_factory=list)  # pages dequeued, FIFO order


_CT_BY_CLASS = {"html": "text/html", "js": "application/javascript", "css": "text/css"}


def effective_content_type(url: str, page: Page | None) -> str:
    if page is not None and page.content_type is not None:
        return page.content_type
    return _CT_BY_CLASS.get(content_class(url), "")


def crawl(pages: dict, seed: str, cfg: CrawlConfig) -> CrawlOutput:
    cfg = cfg.validated()
    base = gourl.parse(seed)  # raises URLError like Run (crawler.go:84-86)
    out = CrawlOutput()
    out.seen[url_seen_key(seed)] = seed  # crawler.go:97-98 (raw seed string)

    tag_filter = prepare_filter(cfg.tags)
    robots = robotsx.allow_all()
    queue: deque = deque()
    candidates: list = []  # (tag, uri) in arrival order

    def is_ignored(v: str) -> bool:
        return any(s in v for s in cfg.ignored)

    def link_handler(tag: str, s: str) -> None:
        # crawler.go:275-296
        candidates.append((tag, s))

    def static_handler(s: str) -> None:
        link_handler("link", s)

    def crawl_handler(s: str) -> None:
        link_handler("a", s)

    def try_enqueue(uri: str) -> bool:
        # crawler.go:172-194
        try:
            u = gourl.parse(uri)
        except URLError:
            return False
        if not can_crawl(base, u, cfg.depth, cfg.subdomains):
            return False
        if robots.forbidden(u.path):
            return False
        if cfg.dirs_policy == DIRS_ONLY and is_resource(u.path):
            return False
        queue.append(uri)
        return True

    def try_handle(u: str) -> None:
        # crawler.go:144-170
        idx = u.rfind("/")
        if idx == -1:
            return
        show = True
        if cfg.dirs_policy == DIRS_HIDE:
            show = is_resource(u[idx:])
        elif cfg.dirs_policy == DIRS_ONLY:
            show = not is_resource(u[idx:])
        if show:
            out.results.append(u)

    def drain_candidates() -> None:
        # the driver loop, crawler.go:119-135
        for tag, s in candidates:
            key = url_seen_key(s)
            if key in out.seen:
                continue
            out.seen[key] = s
            fetch = (
                tag in ("a", "iframe")
                or (cfg.scan_js and tag == "script")
                or (cfg.scan_css and tag == "link")
            )
            if fetch and not is_ignored(s):
                try_enqueue(s)
            try_handle(s)
        candidates.clear()

    # --- robots phase (crawler.go:101, 207-263) ---
    if cfg.robots_policy != ROBOTS_IGNORE:
        r_url = robotsx.robots_url(base.scheme, base.host)
        r_page = pages.get(r_url)
        if r_page is None:
            pass  # transport/4xx-equivalent → AllowALL
        elif r_page.status >= 500:
            robots = robotsx.deny_all()
        elif r_page.status >= 400 or r_page.body is None:
            pass
        else:
            robots = robotsx.from_text(cfg.user_agent, r_page.body)
            # crawlRobots (crawler.go:246-263): links re-rooted on the seed
            # host (query+fragment cleared), then sitemaps
            rbase = base.copy()
            rbase.fragment = ""
            rbase.raw_fragment = ""
            rbase.raw_query = ""
            rbase.force_query = False
            for path in robots.links_sorted():
                t = rbase.copy()
                t.path = path
                t.raw_path = ""
                link_handler("a", t.string())
            for sm in robots.sitemaps_sorted():
                try:
                    gourl.parse(sm)
                except URLError:
                    continue
                crawl_handler(sm)
        drain_candidates()

    # --- seed enters the queue unconditionally (crawler.go:117) ---
    queue.appendleft(seed)

    # --- FIFO BFS (worker loop, crawler.go:364-400) ---
    while queue:
        uri = queue.popleft()
        out.fetched.append(uri)
        try:
            u = gourl.parse(uri)
        except URLError:
            continue
        page = pages.get(uri)
        ct = effective_content_type(uri, page)
        if cfg.no_head:
            can_process = can_parse(u.path)
        else:
            can_process = (
                is_html(ct)
                or is_sitemap(uri)
                or (cfg.scan_js and is_js(ct, uri))
                or (cfg.scan_css and is_css(ct, uri))
            )
        if can_process and page is not None and page.body is not None:
            _process(uri, u, page.body, ct, cfg, tag_filter, link_handler, static_handler, crawl_handler)
        drain_candidates()

    return out


def _process(uri, u, body, ct, cfg, tag_filter, link_handler, static_handler, crawl_handler):
    # crawler.go:306-362 — dispatch on content class
    def hstatic(s: str) -> None:
        rv, ok = handle_static(uri, u.scheme, s)
        if ok:
            static_handler(rv)

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
    elif is_sitemap(uri):
        extract_sitemap(body, u, crawl_handler)
    elif cfg.scan_js and is_js(ct, uri):
        extract_js(body, hstatic)
    elif cfg.scan_css and is_css(ct, uri):
        extract_css(body, hstatic)
