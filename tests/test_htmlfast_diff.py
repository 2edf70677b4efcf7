"""Differential test: the specialized tokenizer overrides in htmlx._Tokenizer
must produce candidate streams identical to a pristine html.parser-based
tokenizer, across all fixture bodies and seeded random HTML-ish fuzz."""

import random

from html.parser import HTMLParser

from crawley_spark.functions.tags import prepare_filter
from crawley_spark.kernels import gourl
from crawley_spark.kernels.htmlx import HTMLParams, _Tokenizer, extract_comment, extract_html
from crawley_spark.kernels.cssx import extract_css
from crawley_spark.kernels.jsx import extract_js

BASE = gourl.parse("http://test/")


class _PristineTokenizer(HTMLParser):
    """The unspecialized reference implementation (stdlib event loop)."""

    def __init__(self, base, params):
        super().__init__(convert_charrefs=False)
        self.base = base
        self.p = params
        self.key = "src"
        self.is_js = False
        self.is_css = False

    def _tag(self, tag, attrs):
        from crawley_spark.kernels.htmlx import extract_token

        if self.p.filter(tag):
            self.is_js, self.is_css, self.key = extract_token(
                self.base, tag, attrs, self.key, self.p.handle_html
            )

    def handle_starttag(self, tag, attrs):
        self._tag(tag, attrs)

    def handle_startendtag(self, tag, attrs):
        self._tag(tag, attrs)

    def handle_data(self, data):
        if self.p.scan_js and self.is_js:
            extract_js(data, self.p.handle_static)
        elif self.p.scan_css and self.is_css:
            extract_css(data, self.p.handle_static)
        self.is_js = False
        self.is_css = False

    def handle_entityref(self, name):
        self.is_js = False
        self.is_css = False

    def handle_charref(self, name):
        self.is_js = False
        self.is_css = False

    def handle_comment(self, data):
        if self.p.brute:
            extract_comment(data, self.p.handle_html)


def _collect(cls, body, **cfg):
    got = []
    params = HTMLParams(
        handle_html=lambda t, s: got.append(("h", t, s)),
        handle_static=lambda s: got.append(("s", s)),
        **cfg,
    )
    tok = cls(BASE, params)
    try:
        tok.feed(body)
        tok.close()
    except Exception:
        pass
    return got


CONFIGS = [
    {},
    {"brute": True, "scan_js": True, "scan_css": True},
    {"scan_js": True},
    {"scan_css": True},
    {"filter": prepare_filter(["a", "script"])},
]

FIXTURES = [
    '<html><a href="result">here</a><img src="http://other.host/image.bmp"/><iframe src="some/deep/path"/></html>',
    '<html><script>var url = "http://example.com";</script></html>',
    "<html><style>foo {bar:url(test.png);}</style></html>",
    "<html><!-- http://test/result --></html>",
    '<picture><source srcset="/a.webp"/></picture><video poster="/p" src="/v"></video>',
    '<a href="/x#f">1</a>&amp;<a href="/y">2</a>&#65;',
    '<script src="x.js"></script>text "http://a/b" more',
    "<script></script>var u = \"/dangling\";",
    "<a href='unterminated",
    "<a href=>empty</a><a href>none</a>",
    "< notatag <a href=ok>x</a>",
    "<!DOCTYPE html><?pi?><![CDATA[x]]><a href=1>y</a>",
    "<a href='a&amp;b'>e</a>",
    "<A HREF='UP'>case</A>",
    "<style>u { background: url( 'q.png' ) }</style",
    "text &incomplete",
    "<a href=\"/q?x=1&y=2\">q</a>",
]


def _fuzz_bodies(n=400, seed=42):
    rng = random.Random(seed)
    frags = [
        "<a href=", "<img src=", "<script", "<style>", "</script>", "</style>",
        "<!--", "-->", ">", "/>", "\"", "'", "=", "&amp;", "&#65;", "&bogus",
        "http://x/y", "/rel", "//h/p", "url(a.png)", "var x = \"/s\";",
        " ", "\n", "text", "<", "&", "<video><source srcset=", "<picture>",
        "<iframe src=", "<form action=", "<track src=", "<object data=",
        "<audio src=", "z.w", "#f", "?q=1", "é", "]]>", "<![CDATA[",
        # irrelevant tags (attribute scan skipped when js/css flags are
        # clear) — with clean, junk, and self-closing ends, to pin the
        # skip path against the pristine loop in every flag state
        "<div class=", "<p>", "<span data-x='1'>", "<br/>", "<b !junk>",
        "</div>", "<div a=1 b=2>",
    ]
    out = []
    for _ in range(n):
        k = rng.randint(3, 25)
        out.append("".join(rng.choice(frags) for _ in range(k)))
    return out


def test_differential_fixtures_and_fuzz():
    bodies = FIXTURES + _fuzz_bodies()
    for body in bodies:
        for cfg in CONFIGS:
            fast = _collect(_Tokenizer, body, **cfg)
            ref = _collect(_PristineTokenizer, body, **cfg)
            assert fast == ref, f"divergence on {body!r} cfg={cfg}"


def test_differential_corpus_pages():
    from crawley_spark.corpus import _page_body

    for pid in range(120, 220):
        _, body = _page_body(pid, 10000, 20, 12, 42, 60)
        for cfg in CONFIGS:
            assert _collect(_Tokenizer, body, **cfg) == _collect(_PristineTokenizer, body, **cfg)
