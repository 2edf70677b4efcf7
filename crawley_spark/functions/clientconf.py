"""Client-config utilities ported from the reference's CLI surface:

* cookie parsing   — /root/reference/internal/client/cookie.go:15-51
* header parsing   — /root/reference/internal/client/header.go:15-38
* proxy-auth       — /root/reference/internal/crawler/util.go:48-50
* List flag values — /root/reference/internal/values/list.go (CSV-expanding)
* Smart flag values — /root/reference/internal/values/smart.go (curl-style
  '@file' loading, line-per-value)

These exist for CLI/config parity (corpus mode sends no HTTP requests; the
parsed values are carried in CrawlConfig and surfaced by dump()).
"""

from __future__ import annotations

import base64
import logging
import os

log = logging.getLogger("crawley_spark")


def parse_cookies(raw: list) -> list:
    """[(name, value)] from 'k=v; k2=v2'-style strings (curl format)."""
    rv = []
    for r in raw:
        for p in r.split(";"):
            p = p.strip()
            if not p:
                continue
            pair = p.split("=", 1)
            if len(pair) != 2 or not pair[0].strip():
                log.warning("cannot parse '%s' as cookie, expected format: 'key=value;' as in curl", r)
                continue
            rv.append((pair[0].strip(), pair[1].strip()))
    return rv


def parse_headers(raw: list) -> list:
    """[(key, value)] from 'Key: value' strings; empty keys/values dropped."""
    rv = []
    for h in raw:
        pair = h.split(":", 1)
        if len(pair) != 2:
            continue
        key, val = pair[0].strip(), pair[1].strip()
        if key and val:
            rv.append((key, val))
    return rv


def proxy_auth_header(v: str) -> str:
    """util.go:48-50 — 'user:pass' → Proxy-Authorization basic header."""
    return "Proxy-Authorization: Basic " + base64.standard_b64encode(v.encode()).decode()


def list_values(vals: list) -> list:
    """values/list.go — each value may be a single name or comma-separated."""
    out = []
    for v in vals:
        if "," in v:
            out.extend(v.split(","))
        else:
            out.append(v)
    return out


def smart_values(vals: list, root: str = ".") -> list:
    """values/smart.go — '@name' loads line-per-value from a file."""
    out = []
    for v in vals:
        if v.startswith("@"):
            with open(os.path.join(root, v[1:])) as f:
                out.extend(line.rstrip("\n") for line in f.read().splitlines())
        else:
            out.append(v)
    return out
