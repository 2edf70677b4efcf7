"""Shared crawl scenarios (pages, seed, config) ported from the reference's
crawler_test.go fixture bodies (FIXTURES.md §5). Used both by the
interpreter tests (Go-anchored assertions) and the Spark engine parity tests
(engine output ≡ interpreter output, byte-exact)."""

from crawley_spark.config import CrawlConfig
from crawley_spark.interp import Page

SEED = "http://test.host:8080"

_OK_BODY = """
<html>
<a href="result">here</a>
<img src="http://other.host/image.bmp"/>
<iframe src="some/deep/path"/>
</html>"""

ROBOTS_BODY = """useragent: a
disallow: /a
disallow: /c
user-agent: b
disallow: /b
sitemap: http://other.host/sitemap.xml"""


def _html(body):
    return Page(body=body, content_type="text/html")


def _robots_pages():
    body = '<html><a href="/a">a</a><a href="/b">b</a><a href="/c">c</a></html>'
    return {
        SEED: _html(body),
        f"{SEED}/robots.txt": Page(body=ROBOTS_BODY),
        f"{SEED}/a": _html('<html><a href="http://a">a</a></html>'),
        f"{SEED}/b": _html('<html><a href="http://b">b</a></html>'),
        f"{SEED}/c": _html('<html><a href="http://c">c</a></html>'),
    }


SITEMAP_XML = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
\t<loc>http://hello/foo</loc>
  </url>
</urlset>"""


def build_scenarios() -> dict:
    s = {}
    s["ok_basic"] = (
        {
            SEED: _html(_OK_BODY),
            f"{SEED}/result": _html(_OK_BODY),
            f"{SEED}/some/deep/path": _html(_OK_BODY),
        },
        SEED,
        CrawlConfig(depth=1, no_head=False),
    )
    s["robots_ua_a"] = (
        _robots_pages(),
        SEED,
        CrawlConfig(user_agent="a", robots_policy="respect", depth=1, no_head=False),
    )
    s["robots_ua_b"] = (
        _robots_pages(),
        SEED,
        CrawlConfig(user_agent="b", robots_policy="respect", depth=1, no_head=False),
    )
    s["robots_500"] = (
        {
            SEED: _html('<a href="/x">x</a>'),
            f"{SEED}/robots.txt": Page(body=None, status=500),
        },
        SEED,
        CrawlConfig(depth=1, robots_policy="respect", no_head=False),
    )
    s["robots_400"] = (
        {
            SEED: _html('<a href="/x">x</a>'),
            f"{SEED}/robots.txt": Page(body=None, status=403),
        },
        SEED,
        CrawlConfig(depth=1, robots_policy="respect", no_head=False),
    )
    s["dirs_hide"] = (
        {SEED: _html('<html><a href="/a">a</a><a href="/b">b</a><a href="/c.jpg"/>c.jpg</a></html>')},
        SEED,
        CrawlConfig(depth=0, dirs_policy="hide", no_head=False),
    )
    s["dirs_only"] = (
        {
            SEED: _html('<html><a href="/a">a</a><a href="/b.gif">b.gif</a><a href="/c.jpg">c.jpg</a></html>'),
            f"{SEED}/a": _html("<html></html>"),
        },
        SEED,
        CrawlConfig(depth=2, dirs_policy="only", no_head=False),
    )
    s["no_heads"] = (
        {
            SEED: _html('<html><a href="/a">a</a><a href="/b.gif">b.gif</a></html>'),
            f"{SEED}/a": _html("<html></html>"),
        },
        SEED,
        CrawlConfig(depth=0, no_head=True, dirs_policy="only"),
    )
    s["sitemap"] = (
        {
            SEED: _html('<html><a href="/a">a</a></html>'),
            f"{SEED}/robots.txt": Page(
                body=f"useragent: a\ndisallow: /a\nuser-agent: b\ndisallow: /b\nsitemap: {SEED}/sitemap.xml"
            ),
            f"{SEED}/sitemap.xml": Page(body=SITEMAP_XML),
            f"{SEED}/a": _html('<html><a href="/a">a</a></html>'),
        },
        SEED,
        CrawlConfig(user_agent="a", no_head=True, depth=1, robots_policy="crawl"),
    )
    s["tag_filter"] = (
        {SEED: _html('<html><a href="link">ok</a><img src="bad"/><iframe src="ok"/></html>')},
        SEED,
        CrawlConfig(no_head=True, depth=1, tags=("a", "iframe")),
    )
    s["ignored"] = (
        {
            SEED: _html('<html><a href="/a">a</a><a href="/b">b</a></html>'),
            f"{SEED}/a": _html('<html><a href="http://a">a</a></html>'),
            f"{SEED}/b": _html('<html><a href="http://b">b</a></html>'),
        },
        SEED,
        CrawlConfig(depth=1, ignored=("b",), no_head=False),
    )
    s["js_external"] = (
        {
            SEED: _html('<html><script src="test.js"></script></html>'),
            f"{SEED}/test.js": Page(
                body='function() { url = "/api/v1/user"; }', content_type="application/javascript"
            ),
        },
        SEED,
        CrawlConfig(depth=1, no_head=True, scan_js=True),
    )
    s["js_inline"] = (
        {SEED: _html('<html><body><script>var foo = "http://test.me/";</script></body></html>')},
        SEED,
        CrawlConfig(depth=1, no_head=True, scan_js=True),
    )
    s["css_external"] = (
        {
            SEED: _html('<html><link href="test.css" rel="stylesheet" type="text/css"/></html>'),
            f"{SEED}/test.css": Page(body="foo {bar:url(//static/test.png);}", content_type="text/css"),
        },
        SEED,
        CrawlConfig(depth=1, no_head=True, scan_css=True),
    )
    s["css_noct"] = (
        {
            SEED: _html('<html><link href="test.css" rel="stylesheet" type="text/css"/></html>'),
            f"{SEED}/test.css": Page(body="foo {bar:url(//static/test2.png);}"),
        },
        SEED,
        CrawlConfig(depth=1, no_head=True, scan_css=True),
    )
    s["css_inline"] = (
        {SEED: _html('<html><head><style>\nbody {background: url("test.png");}\n</style></head><body></body></html>')},
        SEED,
        CrawlConfig(depth=1, no_head=True, scan_css=True),
    )
    s["brute_comments"] = (
        {SEED: _html('<html><!-- see http://hidden.example/x (and http://hidden2.example/y) --><a href="/a">a</a></html>')},
        SEED,
        CrawlConfig(depth=1, no_head=True, brute=True),
    )
    s["subdomains"] = (
        {
            "http://test": _html('<html><a href="http://sub.test/x">s</a><a href="http://other/x">o</a></html>'),
            "http://sub.test/x": _html('<html><a href="http://deep.sub.test/y">d</a></html>'),
        },
        "http://test",
        CrawlConfig(depth=-1, no_head=True, subdomains=True),
    )
    s["deep_bfs"] = (
        {
            "http://t": _html('<html><a href="/a">a</a><a href="/b">b</a></html>'),
            "http://t/a": _html('<html><a href="/a/1">1</a><a href="/b">b</a></html>'),
            "http://t/b": _html('<html><a href="/b/2">2</a><a href="/a">a</a></html>'),
            "http://t/a/1": _html('<html><a href="/a/1/x">x</a></html>'),
            "http://t/b/2": _html('<html><a href="/c">c</a></html>'),
            "http://t/c": _html("<html></html>"),
        },
        "http://t",
        CrawlConfig(depth=-1, no_head=True),
    )
    return s


SCENARIOS = build_scenarios()
