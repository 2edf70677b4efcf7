"""JS endpoint extraction kernel.

Reproduces ``ExtractJS`` (/root/reference/internal/links/js.go:19-40): lex the
source, and for every *string literal* token (quoted with ' or " — template
literals are a distinct token type in the reference's tdewolff lexer and are
NOT extracted), trim quotes and keep iff it starts with ``/`` or contains
``//``.

The scanner below is a minimal JS lexer covering exactly the token classes
the reference consumes: line/block comments, single/double-quoted strings,
template literals (skipped), and a regex-vs-division heuristic. On a lexing
dead-end it stops, mirroring the reference's ErrorToken early-return.
"""

from __future__ import annotations

_CODE_CLEAN = "\"'"

# characters after which a '/' starts a regex literal rather than division
_REGEX_PRECEDERS = set("=([{,;:!?&|+-*%~^<>")


def extract_js_strings(src: str):
    """Yield raw string-literal tokens (including their quotes)."""
    i, n = 0, len(src)
    prev_sig = ""  # last significant (non-space, non-comment) char
    while i < n:
        c = src[i]
        if c in "\"'":
            q = c
            j = i + 1
            ok = False
            while j < n:
                d = src[j]
                if d == "\\":
                    j += 2
                    continue
                if d == q:
                    ok = True
                    break
                if d in "\n\r":
                    break
                j += 1
            if not ok:
                return  # unterminated string → lexer error → stop
            yield src[i : j + 1]
            prev_sig = q
            i = j + 1
        elif c == "`":
            # template literal — skip (distinct token type, not extracted)
            j = i + 1
            depth = 0
            while j < n:
                d = src[j]
                if d == "\\":
                    j += 2
                    continue
                if d == "$" and j + 1 < n and src[j + 1] == "{":
                    depth += 1
                    j += 2
                    continue
                if d == "}" and depth > 0:
                    depth -= 1
                    j += 1
                    continue
                if d == "`" and depth == 0:
                    break
                j += 1
            if j >= n:
                return
            prev_sig = "`"
            i = j + 1
        elif c == "/" and i + 1 < n and src[i + 1] == "/":
            j = src.find("\n", i + 2)
            i = n if j == -1 else j + 1
        elif c == "/" and i + 1 < n and src[i + 1] == "*":
            j = src.find("*/", i + 2)
            if j == -1:
                return
            i = j + 2
        elif c == "/":
            if prev_sig == "" or prev_sig in _REGEX_PRECEDERS:
                # regex literal — skip to unescaped closing /
                j = i + 1
                in_class = False
                while j < n:
                    d = src[j]
                    if d == "\\":
                        j += 2
                        continue
                    if d == "[":
                        in_class = True
                    elif d == "]":
                        in_class = False
                    elif d == "/" and not in_class:
                        break
                    elif d == "\n":
                        break
                    j += 1
                if j >= n or src[j] != "/":
                    return
                prev_sig = "/"
                i = j + 1
            else:
                prev_sig = "/"
                i += 1
        else:
            if not c.isspace():
                prev_sig = c
            i += 1


def extract_js_url(tok: str) -> tuple[str, bool]:
    """js.go:35-40 — trim quote chars from both ends; accept iff the result
    starts with '/' or contains '//'."""
    rv = tok.strip(_CODE_CLEAN)
    return rv, rv.startswith("/") or "//" in rv


def extract_js(src: str, handle) -> None:
    """js.go:19-33."""
    for tok in extract_js_strings(src):
        rv, ok = extract_js_url(tok)
        if ok:
            handle(rv)
