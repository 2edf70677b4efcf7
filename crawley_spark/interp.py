"""Pure-Python reference interpreter (parity oracle).

A sequential, single-threaded implementation of the reference's crawl loop
(/root/reference/internal/crawler/crawler.go:81-400) in its canonical
deterministic configuration (workers=1 FIFO BFS — SURVEY.md §3.4). The Spark
engine must produce the same emitted-URL sequence and final URL-seen set.

The live HTTP fetch is replaced by a corpus lookup (BASELINE.json input_hint):
missing pages behave like transport-404s (page "crawled", no links).

Per-row semantics live in crawley_spark.kernels.extract (shared with the
Spark engine and anchored to Go by the ported unit-test vectors in tests/);
this module contributes only the canonical sequential orchestration.

Canonical-order notes (divergences documented in SURVEY.md §3.4 / §2.6):
* robots.txt links/sitemaps are injected in *sorted* order (the reference
  iterates an unordered Go map there);
* the reference's drop-on-channel-overflow (crawler.go:163-193) is not
  reproduced (lossless semantics).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from .config import ROBOTS_IGNORE, CrawlConfig
from .functions.tags import prepare_filter
from .kernels import gourl, robotsx
from .kernels.extract import (
    classify_candidate,
    effective_content_type,
    fetch_gate,
    page_candidates,
)
from .kernels.gourl import URLError
from .kernels.paths import url_seen_key


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


def seed_robots(pages: dict, seed_base, cfg: CrawlConfig):
    """initRobots + crawlRobots (crawler.go:207-263): returns (rules,
    candidate injections [(tag, uri), ...] in canonical sorted order)."""
    if cfg.robots_policy == ROBOTS_IGNORE:
        return robotsx.allow_all(), []
    r_url = robotsx.robots_url(seed_base.scheme, seed_base.host)
    r_page = pages.get(r_url)
    if r_page is None:
        return robotsx.allow_all(), []  # transport-error-equivalent
    if r_page.status >= 500:
        return robotsx.deny_all(), []
    if r_page.status >= 400 or r_page.body is None:
        return robotsx.allow_all(), []
    robots = robotsx.from_text(cfg.user_agent, r_page.body)
    injections = []
    rbase = seed_base.copy()
    rbase.fragment = ""
    rbase.raw_fragment = ""
    rbase.raw_query = ""
    rbase.force_query = False
    for path in robots.links_sorted():
        t = rbase.copy()
        t.path = path
        t.raw_path = ""
        injections.append(("a", t.string()))
    for sm in robots.sitemaps_sorted():
        try:
            gourl.parse(sm)
        except URLError:
            continue
        injections.append(("a", sm))
    return robots, injections


def crawl(pages: dict, seed: str, cfg: CrawlConfig) -> CrawlOutput:
    cfg = cfg.validated()
    base = gourl.parse(seed)  # raises URLError like Run (crawler.go:84-86)
    out = CrawlOutput()
    out.seen[url_seen_key(seed)] = seed  # crawler.go:97-98 (raw seed string)

    tag_filter = prepare_filter(cfg.tags)
    queue: deque = deque()
    candidates: list = []  # (tag, uri) in arrival order

    robots, injections = seed_robots(pages, base, cfg)
    candidates.extend(injections)

    def drain_candidates() -> None:
        # the driver loop, crawler.go:119-135
        for tag, s in candidates:
            key = url_seen_key(s)
            if key in out.seen:
                continue
            out.seen[key] = s
            c = classify_candidate(cfg, robots, base, tag, s)
            if c.enqueue_ok:
                queue.append(s)
            if c.emit_ok:
                out.results.append(s)
        candidates.clear()

    drain_candidates()
    # seed enters the queue first (crawler.go:117 — pushed before the driver
    # loop drains any robots candidates)
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
        ct = effective_content_type(uri, page.content_type if page else None)
        if fetch_gate(u, uri, ct, cfg) and page is not None and page.body is not None:
            candidates.extend(page_candidates(uri, u, page.body, ct, cfg, tag_filter))
        drain_candidates()

    return out
