"""Sitemap XML extraction kernel.

Reproduces ``ExtractSitemap`` (/root/reference/internal/links/sitemap.go:19-53):
stream-decode the XML; for each ``<url>`` / ``<sitemap>`` element (namespace
ignored, matching Go's Name.Local dispatch) take its ``<loc>`` child text and
canonicalize via clean_url. Malformed/truncated XML stops extraction at the
parse error, keeping whatever complete elements were already handled.
"""

from __future__ import annotations

import io
import xml.etree.ElementTree as ET

from .clean import clean_url
from .gourl import GoURL


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def extract_sitemap(body: str, base: GoURL, handle) -> None:
    src = io.BytesIO(body.encode("utf-8", "surrogateescape"))
    try:
        for _, elem in ET.iterparse(src, events=("end",)):
            name = _local(elem.tag)
            if name not in ("url", "sitemap"):
                continue
            loc = ""
            for child in elem:
                if _local(child.tag) == "loc":
                    loc = child.text or ""
                    break
            uri, ok = clean_url(base, loc)
            if ok:
                handle(uri)
            elem.clear()
    except ET.ParseError:
        return
