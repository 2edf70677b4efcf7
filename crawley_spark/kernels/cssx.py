"""CSS url() extraction kernel.

Reproduces ``ExtractCSS`` (/root/reference/internal/links/css.go:17-39): for
every ``url(...)`` token (quoted or unquoted content, case-insensitive
function name, comments and strings respected), take the substring between
the first '(' and the last ')' of the token, trim quote chars, keep if
non-empty.
"""

from __future__ import annotations

_CODE_CLEAN = "\"'"
_IDENT_CHARS = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_-")


def extract_css_tokens(src: str):
    """Yield url(...) token texts."""
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c == "/" and i + 1 < n and src[i + 1] == "*":
            j = src.find("*/", i + 2)
            if j == -1:
                return
            i = j + 2
        elif c in "\"'":
            q = c
            j = i + 1
            while j < n:
                if src[j] == "\\":
                    j += 2
                    continue
                if src[j] == q or src[j] == "\n":
                    break
                j += 1
            i = min(j + 1, n)
        elif c.lower() == "u" and src[i : i + 4].lower().startswith("url(") and (
            i == 0 or src[i - 1] not in _IDENT_CHARS
        ):
            j = i + 4
            # consume: optional ws, then quoted string or raw until ')'
            while j < n and src[j] in " \t\r\n\f":
                j += 1
            if j < n and src[j] in "\"'":
                q = src[j]
                j += 1
                while j < n:
                    if src[j] == "\\":
                        j += 2
                        continue
                    if src[j] == q:
                        j += 1
                        break
                    j += 1
                while j < n and src[j] in " \t\r\n\f":
                    j += 1
                if j < n and src[j] == ")":
                    yield src[i : j + 1]
                    i = j + 1
                else:
                    i = j  # malformed — resume scan
            else:
                k = src.find(")", j)
                if k == -1:
                    return
                yield src[i : k + 1]
                i = k + 1
        else:
            i += 1


def extract_css_url(tok: str) -> tuple[str, bool]:
    """css.go:32-39 — substring between first '(' and last ')', quote-trimmed."""
    o = tok.find("(")
    c = tok.rfind(")")
    rv = tok[o + 1 : c].strip(_CODE_CLEAN)
    return rv, rv != ""


def extract_css(src: str, handle) -> None:
    """css.go:17-30."""
    for tok in extract_css_tokens(src):
        rv, ok = extract_css_url(tok)
        if ok:
            handle(rv)
