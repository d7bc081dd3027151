"""Sitemap XML synthesis + parsing (sitemaps.org protocol): the crawl
side of the extraction tier — a site's URL inventory rendered as
<urlset> XML and parsed back to (url, lastmod, priority) rows.

The render is a pure function of the site's doc ids (deterministic, so
the DuckDB twin re-derives every field arithmetically without touching
XML); the parser is a strict sitemaps.org reader on the stdlib
ElementTree with namespace tolerance and entity decoding. Malformed XML
returns no entries rather than raising (a crawler must survive bad
feeds). No reference-engine counterpart (ocropy is image-side)."""

from __future__ import annotations

import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"

# deterministic lastmod: 2025-01-01 + (doc_id % 365) days
_MONTH_DAYS = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]


def lastmod_for(doc_id: int) -> str:
    """day-of-year -> ISO date in 2025 (non-leap), pure arithmetic so
    the SQL twin can mirror it with date_add."""
    off = doc_id % 365
    m = 0
    while off >= _MONTH_DAYS[m]:
        off -= _MONTH_DAYS[m]
        m += 1
    return f"2025-{m + 1:02d}-{off + 1:02d}"


def url_for(site_id: int, doc_id: int) -> str:
    return f"https://site{site_id}.example/page/{doc_id}?ref=a&b=1"


def priority_for(doc_id: int) -> str:
    return f"0.{(doc_id * 37) % 10}"


def render_sitemap(site_id: int, doc_ids: list[int]) -> str:
    """Render a site's <urlset> — entries in ascending doc_id order,
    URLs XML-escaped (the &-bearing query string exercises entity
    decoding on the way back)."""
    parts = [f'<?xml version="1.0" encoding="UTF-8"?>\n<urlset xmlns="{_NS}">']
    for d in sorted(doc_ids):
        parts.append(
            "<url>"
            f"<loc>{escape(url_for(site_id, int(d)))}</loc>"
            f"<lastmod>{lastmod_for(int(d))}</lastmod>"
            f"<priority>{priority_for(int(d))}</priority>"
            "</url>")
    parts.append("</urlset>")
    return "".join(parts)


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_sitemap(xml: str) -> list[dict]:
    """<urlset> -> [{url, lastmod, priority}] in document order.
    Namespace-agnostic (matches on local tag names), skips <url>
    entries without a <loc>, returns [] on malformed XML."""
    try:
        root = ET.fromstring(xml)
    except ET.ParseError:
        return []
    if _local(root.tag) != "urlset":
        return []
    out: list[dict] = []
    for el in root:
        if _local(el.tag) != "url":
            continue
        rec = {"url": None, "lastmod": None, "priority": None}
        for ch in el:
            t = _local(ch.tag)
            if t == "loc":
                rec["url"] = (ch.text or "").strip()
            elif t == "lastmod":
                rec["lastmod"] = (ch.text or "").strip()
            elif t == "priority":
                rec["priority"] = (ch.text or "").strip()
        if rec["url"]:
            out.append(rec)
    return out
