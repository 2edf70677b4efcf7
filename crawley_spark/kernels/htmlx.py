"""HTML link extraction kernel.

Reproduces the reference's SAX-tokenizer walk
(``/root/reference/internal/links/html.go``) on top of Python's
``html.parser`` token stream:

* per-tag attribute dispatch incl. the stateful ``key`` switching for
  video/audio/picture/source (html.go:119-170)
* inline <script>/<style> text routing to the JS/CSS scanners when the
  preceding start tag set the corresponding flag (html.go:61-69) — flags
  persist across end tags and reset on the next text token, bug-compatibly
* brute-mode comment scanning (html.go:79-117)

Emitted links are canonicalized via ``clean_url`` (links/clean.go) exactly as
``extractTag`` does; comment-mode URLs bypass canonicalization (html.go:112).
"""

from __future__ import annotations

from html.parser import HTMLParser

from .clean import clean_url, handle_static
from .cssx import extract_css
from .gourl import GoURL, URLError, parse as gourl_parse
from .jsx import extract_js

KEY_SRC = "src"
KEY_SRCS = "srcset"
KEY_HREF = "href"
KEY_DATA = "data"
KEY_ACTION = "action"

_COMMENT_CUTSET = "<(')>\""


def extract_comment(s: str, handle) -> None:
    """html.go:79-117 — word-split comment text, find http(s):// prefix
    case-insensitively, cut at any of ``<(')>"``, keep if parseable with a
    non-empty host; emitted with original case, uncanonicalized."""
    for word in s.split():
        low = word.lower()
        pos = low.find("http://")
        if pos == -1:
            pos = low.find("https://")
        if pos == -1:
            continue
        end = -1
        for i, c in enumerate(low[pos:]):
            if c in _COMMENT_CUTSET:
                end = i
                break
        buf = word[: pos + end] if end > -1 else word
        uri = buf[pos:].strip()
        if not uri:
            continue
        try:
            u = gourl_parse(uri)
        except URLError:
            continue
        if u.host != "":
            handle("a", uri)


def _extract_tag(base: GoURL, attrs, key: str) -> str:
    """html.go:178-192 — first attribute matching key that cleans OK."""
    for k, v in attrs:
        if k == key:
            res, ok = clean_url(base, v or "")
            if ok:
                return res
    return ""


def extract_token(base: GoURL, tag: str, attrs, key: str, handle) -> tuple[bool, bool, str]:
    """html.go:119-170 — per-tag attribute dispatch. Returns (js, css,
    new_key); calls handle(tag, url) for non-empty extractions."""
    js = css = False
    uri = ""
    poster = ""
    if tag in ("a", "link"):
        uri = _extract_tag(base, attrs, KEY_HREF)
    elif tag in ("img", "image", "iframe", "track"):
        uri = _extract_tag(base, attrs, KEY_SRC)
    elif tag == "script":
        uri = _extract_tag(base, attrs, KEY_SRC)
        js = uri == ""
    elif tag == "style":
        css = True
    elif tag == "form":
        uri = _extract_tag(base, attrs, KEY_ACTION)
    elif tag == "object":
        uri = _extract_tag(base, attrs, KEY_DATA)
    elif tag == "video":
        poster = _extract_tag(base, attrs, KEY_POSTER)
        key = KEY_SRC
        uri = _extract_tag(base, attrs, KEY_SRC)
    elif tag == "audio":
        key = KEY_SRC
        uri = _extract_tag(base, attrs, KEY_SRC)
    elif tag == "picture":
        key = KEY_SRCS
    elif tag == "source":
        uri = _extract_tag(base, attrs, key)
    if uri != "":
        handle(tag, uri)
    if poster != "":
        handle(tag, poster)
    return js, css, key


KEY_POSTER = "poster"


# tags whose attributes the extractor actually reads (html.go:119-170)
_RELEVANT_TAGS = frozenset(
    {"a", "link", "img", "image", "iframe", "track", "script", "style",
     "form", "object", "video", "audio", "picture", "source"}
)

# stdlib html.parser internals reused by the specialized parse_starttag
from html import unescape as _unescape  # noqa: E402
from html import parser as _hp  # noqa: E402

import re as _re  # noqa: E402

# Fast-path token search: '<' plus '&#'. Plain entity refs ('&amp;') cannot
# consume a following '<' (the optional final char is backed off when it is
# not ';'), but numeric charrefs CAN — charref's trailing [^0-9a-fA-F]* may
# swallow '<tag ...' wholesale — so '&#' must stay interesting even when the
# js/css flags are clear and text events are otherwise unobservable.
_FAST_INTERESTING = _re.compile(r"<|&#")

# Whole-start-tag fast path: one match replaces check_for_whole_start_tag +
# tagfind_tolerant + the attrfind_tolerant loop + the end-junk check for the
# overwhelmingly common shape — lowercase tag name, zero or more
# ASCII-whitespace-separated lowercase attributes with double-quoted,
# entity-free values, closed by '>' or '/>'. Every restriction (case,
# quoting, no '&', no '/' between attrs, no valueless attrs, ASCII
# whitespace only) makes the regex FAIL to match and fall back to the
# stock-copy path below, so the fast path can only ever handle inputs on
# which its events are provably identical to the stock scan:
# * quoted values may contain '<' and '>' exactly like locatestarttagend;
# * no '&' in values means html.unescape is the identity and can be
#   skipped; attr names are already lowercase so .lower() is a no-op;
# * the residue after the last attr is '\s*/?>' so the stock junk-end
#   handle_data fallback is unreachable on matched input.
# Equivalence is pinned by tests/test_htmlfast_diff.py (fixtures + fuzz).
_FAST_START = _re.compile(
    r"<([a-z][a-z0-9]*)"
    r"((?:[\t\n\r\f ]+[a-z][a-z0-9_-]*=\"[^\"&]*\")*)"
    r"[\t\n\r\f ]*(/?)>"
)
_FAST_ATTR = _re.compile(r"([a-z][a-z0-9_-]*)=\"([^\"]*)\"")


class _Tokenizer(HTMLParser):
    """Bridges html.parser events to the reference's token switch
    (html.go:51-76). convert_charrefs=False so script/style text arrives as
    single raw-text runs (cdata mode), matching x/net/html raw-text tokens.

    Hot-path specializations (event semantics preserved, verified by the
    differential test in tests/test_htmlfast_diff.py):
    * updatepos line-counting skipped (only used for error positions);
    * attribute lists are materialized/unescaped only for the tags the
      extractor reads (_RELEVANT_TAGS) — other start tags still scan to the
      same end position and fire the same events with attrs=[].
    """

    def __init__(self, base: GoURL, params):
        super().__init__(convert_charrefs=False)
        self.base = base
        self.p = params
        self.key = KEY_SRC
        self.is_js = False
        self.is_css = False

    def updatepos(self, i, j):
        return j

    def goahead(self, end):
        """Specialized copy of html.parser.HTMLParser.goahead (3.11, with
        convert_charrefs=False branches removed). Control flow — branch
        order, break/continue placement, position arithmetic — is verbatim,
        so token boundaries match the stock event loop exactly; the only
        transformations are:

        * text-ish handler calls (handle_data/charref/entityref) and their
          argument slices are skipped while ``is_js``/``is_css`` are both
          clear — the handlers' sole observable effect is resetting those
          flags, so with the flags clear they are no-ops and the O(text)
          ``rawdata[i:j]`` copies can be elided;
        * with the flags clear (and outside CDATA) the token search uses
          ``<|&#`` instead of ``[&<]`` (see _FAST_INTERESTING) — plain
          entityref advancement never changes which '<' is reached next;
        * tag-open dispatch compares ``rawdata[i+1]`` directly instead of
          running the startswith chain.

        Equivalence with the stock loop is pinned by the differential
        fixture+fuzz suite in tests/test_htmlfast_diff.py."""
        rawdata = self.rawdata
        i = 0
        n = len(rawdata)
        while i < n:
            flagged = self.is_js or self.is_css
            if self.cdata_elem:
                match = self.interesting.search(rawdata, i)
                if not match:
                    break
                j = match.start()
                if i < j and flagged:
                    self.handle_data(rawdata[i:j])
            elif flagged:
                match = _hp.interesting_normal.search(rawdata, i)
                j = match.start() if match else n
                if i < j:
                    self.handle_data(rawdata[i:j])
            else:
                match = _FAST_INTERESTING.search(rawdata, i)
                j = match.start() if match else n
                # data event suppressed: handlers are no-ops with flags clear
            i = j
            if i == n:
                break
            c = rawdata[i + 1] if i + 1 < n else ""
            if rawdata[i] == "<":
                if "a" <= c <= "z" or "A" <= c <= "Z":
                    k = self.parse_starttag(i)
                elif c == "/":
                    k = self.parse_endtag(i)
                elif c == "!":
                    if rawdata.startswith("<!--", i):
                        k = self.parse_comment(i)
                    else:
                        k = self.parse_html_declaration(i)
                elif c == "?":
                    k = self.parse_pi(i)
                elif c:
                    if self.is_js or self.is_css:
                        self.handle_data("<")
                    k = i + 1
                else:
                    break
                if k < 0:
                    if not end:
                        break
                    k = rawdata.find(">", i + 1)
                    if k < 0:
                        k = rawdata.find("<", i + 1)
                        if k < 0:
                            k = i + 1
                    else:
                        k += 1
                    if self.is_js or self.is_css:
                        self.handle_data(rawdata[i:k])
                i = k
            elif c == "#":  # rawdata[i] == '&'
                match = _hp.charref.match(rawdata, i)
                if match:
                    if self.is_js or self.is_css:
                        self.handle_charref(match.group()[2:-1])
                    k = match.end()
                    if not rawdata.startswith(";", k - 1):
                        k = k - 1
                    i = k
                    continue
                else:
                    if ";" in rawdata[i:]:
                        if self.is_js or self.is_css:
                            self.handle_data(rawdata[i : i + 2])
                        i = i + 2
                    break
            else:  # rawdata[i] == '&' (reachable only when flagged)
                match = _hp.entityref.match(rawdata, i)
                if match:
                    self.handle_entityref(match.group(1))
                    k = match.end()
                    if not rawdata.startswith(";", k - 1):
                        k = k - 1
                    i = k
                    continue
                match = _hp.incomplete.match(rawdata, i)
                if match:
                    if end and match.group() == rawdata[i:]:
                        k = match.end()
                        if k <= i:
                            k = n
                        i = i + 1
                    break
                elif (i + 1) < n:
                    self.handle_data("&")
                    i = i + 1
                else:
                    break
        # end while
        if end and i < n and not self.cdata_elem:
            if self.is_js or self.is_css:
                self.handle_data(rawdata[i:n])
            i = n
        self.rawdata = rawdata[i:]

    def parse_endtag(self, i):
        """Lean non-CDATA end-tag scan: our handlers ignore end tags, so all
        that matters is position advancement (first '>' + 1 on every
        name-ish path of the stock parse_endtag) and the bogus-comment event
        (`</ x>` → handle_comment, observable in brute mode). The CDATA path
        keeps the stock implementation — it controls raw-text exit and may
        emit data events."""
        if self.cdata_elem is not None:
            return super().parse_endtag(i)
        rawdata = self.rawdata
        gt = rawdata.find(">", i + 1)
        if gt < 0:
            return -1
        c = rawdata[i + 2]
        # tagfind_tolerant matches here iff the first name char is an ASCII
        # letter (pattern '[a-zA-Z][...]*'), so test that directly
        if "a" <= c <= "z" or "A" <= c <= "Z":
            return gt + 1
        if rawdata.startswith("</>", i):
            return i + 3
        self.handle_comment(rawdata[i + 2 : gt])
        return gt + 1

    def parse_starttag(self, i):
        rawdata = self.rawdata
        m = _FAST_START.match(rawdata, i)
        if m:
            tag = m.group(1)
            if tag not in _RELEVANT_TAGS:
                if not (self.is_js or self.is_css):
                    # same observable no-op argument as the stock-copy skip
                    # below; endpos comes from the match instead
                    return m.end()
                attrs = []
            else:
                attrs = _FAST_ATTR.findall(m.group(2))
            self.lasttag = tag
            if m.group(3):
                self.handle_startendtag(tag, attrs)
            else:
                self.handle_starttag(tag, attrs)
                if tag in self.CDATA_CONTENT_ELEMENTS:
                    self.set_cdata_mode(tag)
            return m.end()
        # specialized copy of html.parser.HTMLParser.parse_starttag
        endpos = self.check_for_whole_start_tag(i)
        if endpos < 0:
            return endpos
        rawdata = self.rawdata
        match = _hp.tagfind_tolerant.match(rawdata, i + 1)
        k = match.end()
        self.lasttag = tag = match.group(1).lower()
        want_attrs = tag in _RELEVANT_TAGS
        if not want_attrs and not (self.is_js or self.is_css):
            # Irrelevant tag with the js/css flags clear: every outcome of
            # the stock attribute scan is an observable no-op here — the
            # junk-end handle_data fallback only resets already-clear flags,
            # handle_starttag/startendtag leave state untouched for tags
            # extract_token ignores (all CDATA elements are relevant, so no
            # cdata-mode entry is skipped) — and every path returns endpos,
            # which check_for_whole_start_tag already computed. Real-web
            # HTML is mostly div/span soup, so this skips the per-attribute
            # regex loop for the majority of start tags there.
            return endpos
        attrs = []
        while k < endpos:
            m = _hp.attrfind_tolerant.match(rawdata, k)
            if not m:
                break
            if want_attrs:
                attrname, rest, attrvalue = m.group(1, 2, 3)
                if not rest:
                    attrvalue = None
                elif (
                    attrvalue[:1] == "'" == attrvalue[-1:]
                    or attrvalue[:1] == '"' == attrvalue[-1:]
                ):
                    attrvalue = attrvalue[1:-1]
                if attrvalue:
                    attrvalue = _unescape(attrvalue)
                attrs.append((attrname.lower(), attrvalue))
            k = m.end()
        end = rawdata[k:endpos].strip()
        if end not in (">", "/>"):
            self.handle_data(rawdata[i:endpos])
            return endpos
        if end.endswith("/>"):
            self.handle_startendtag(tag, attrs)
        else:
            self.handle_starttag(tag, attrs)
            if tag in self.CDATA_CONTENT_ELEMENTS:
                self.set_cdata_mode(tag)
        return endpos

    # start / self-closing tags
    def _tag(self, tag, attrs):
        if self.p.filter(tag):
            self.is_js, self.is_css, self.key = extract_token(
                self.base, tag, attrs, self.key, self.p.handle_html
            )

    def handle_starttag(self, tag, attrs):
        self._tag(tag, attrs)

    def handle_startendtag(self, tag, attrs):
        self._tag(tag, attrs)

    # text tokens
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


class HTMLParams:
    """html.go:30-37 — extraction config + callbacks."""

    __slots__ = ("filter", "handle_html", "handle_static", "brute", "scan_js", "scan_css")

    def __init__(self, filter=None, handle_html=None, handle_static=None, brute=False, scan_js=False, scan_css=False):
        self.filter = filter or (lambda tag: True)
        self.handle_html = handle_html or (lambda tag, s: None)
        self.handle_static = handle_static or (lambda s: None)
        self.brute = brute
        self.scan_js = scan_js
        self.scan_css = scan_css


def extract_html(body: str, base: GoURL, params: HTMLParams) -> None:
    """html.go:43-77 — walk the token stream, dispatching per token class."""
    tok = _Tokenizer(base, params)
    try:
        tok.feed(body)
        tok.close()
    except Exception:
        # x/net/html never raises; it returns ErrorToken and extraction stops
        return


def extract_text(body: str) -> str:
    """Visible-text extraction for the corpus invariant (input_hint:
    byte-identical extracted text per url): all text tokens outside
    script/style raw text, entity-decoded, concatenated in document order."""
    import html as _html

    chunks: list[str] = []

    class _T(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=False)
            self.skip = 0

        def handle_starttag(self, tag, attrs):
            if tag in ("script", "style"):
                self.skip += 1

        def handle_endtag(self, tag):
            if tag in ("script", "style") and self.skip > 0:
                self.skip -= 1

        def handle_data(self, data):
            if self.skip == 0:
                chunks.append(data)

        def handle_entityref(self, name):
            if self.skip == 0:
                chunks.append(_html.unescape(f"&{name};"))

        def handle_charref(self, name):
            if self.skip == 0:
                chunks.append(_html.unescape(f"&#{name};"))

    t = _T()
    try:
        t.feed(body)
        t.close()
    except Exception:
        pass
    return "".join(chunks)
