"""Crawl configuration.

Mirrors the reference's ``config`` struct + validation clamps
(/root/reference/internal/crawler/config.go:11-68) and the CLI flag surface
(/root/reference/cmd/crawley/main.go:173-208).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

ROBOTS_IGNORE = "ignore"
ROBOTS_CRAWL = "crawl"
ROBOTS_RESPECT = "respect"

DIRS_SHOW = "show"
DIRS_HIDE = "hide"
DIRS_ONLY = "only"

MIN_DEPTH = -1
MIN_WORKERS, MAX_WORKERS = 1, 64
MIN_TIMEOUT_MS, MAX_TIMEOUT_MS = 1_000, 600_000

DEFAULT_DELAY_MS = 150
DEFAULT_TIMEOUT_MS = 5_000
DEFAULT_UA = "Mozilla/5.0 (compatible; Win64; x64) Mr.Crawley/-"


class UnknownPolicyError(ValueError):
    """policies.go:16."""


def parse_robots_policy(s: str) -> str:
    if s.lower() in (ROBOTS_IGNORE, ROBOTS_CRAWL, ROBOTS_RESPECT):
        return s.lower()
    raise UnknownPolicyError(f"unknown robots policy: {s}")


def parse_dirs_policy(s: str) -> str:
    if s.lower() in (DIRS_SHOW, DIRS_HIDE, DIRS_ONLY):
        return s.lower()
    raise UnknownPolicyError(f"unknown dirs policy: {s}")


@dataclass(frozen=True)
class CrawlConfig:
    depth: int = 0
    workers: int = 4
    delay_ms: int = DEFAULT_DELAY_MS
    timeout_ms: int = DEFAULT_TIMEOUT_MS
    robots_policy: str = ROBOTS_IGNORE
    dirs_policy: str = DIRS_SHOW
    brute: bool = False
    scan_js: bool = False
    scan_css: bool = False
    subdomains: bool = False
    no_head: bool = True  # corpus mode is the reference's headless path
    tags: tuple = ()
    ignored: tuple = ()
    user_agent: str = DEFAULT_UA
    # client-config surface (client.Config, config.go:23; corpus mode sends
    # no HTTP requests — carried for flag/config parity and dump inspection)
    skip_ssl: bool = False  # WithSkipSSL (options.go:56-60)
    headers: tuple = ()  # raw "Key: value" strings, WithExtraHeaders
    cookies: tuple = ()  # raw "k=v; ..." strings, WithExtraCookies

    def with_proxy_auth(self, v: str) -> "CrawlConfig":
        """WithProxyAuth (options.go:108-115): non-empty credentials become a
        Proxy-Authorization basic header appended to the client headers."""
        if not v:
            return self
        from .functions.clientconf import proxy_auth_header

        return replace(self, headers=tuple(self.headers) + (proxy_auth_header(v),))

    def validated(self) -> "CrawlConfig":
        """config.go:63-68 clamps."""
        return replace(
            self,
            workers=min(MAX_WORKERS, max(MIN_WORKERS, self.workers)),
            timeout_ms=min(MAX_TIMEOUT_MS, max(MIN_TIMEOUT_MS, self.timeout_ms)),
            delay_ms=max(0, self.delay_ms),
            depth=max(MIN_DEPTH, self.depth),
            robots_policy=parse_robots_policy(self.robots_policy),
            dirs_policy=parse_dirs_policy(self.dirs_policy),
            tags=tuple(self.tags),
            ignored=tuple(self.ignored),
            headers=tuple(self.headers),
            cookies=tuple(self.cookies),
        )

    def dump(self) -> str:
        """DumpConfig parity (config.go:35-61)."""
        rv = f"workers: {self.workers} depth: {self.depth} timeout: {self.timeout_ms}ms"
        if self.brute:
            rv += " brute: on"
        if self.delay_ms > 0:
            rv += f" delay: {self.delay_ms}ms"
        if self.scan_js:
            rv += " +js"
        if self.scan_css:
            rv += " +css"
        if self.subdomains:
            rv += " +subdomains"
        return rv
