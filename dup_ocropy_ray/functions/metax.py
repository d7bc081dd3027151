"""Structured-metadata harvesting from HTML heads: OpenGraph /
standard ``<meta>`` tags and JSON-LD ``<script type="application/ld+json">``
blocks — the metadata side-channel most web-corpus pipelines keep
alongside the extracted main text (titles, descriptions, schema.org
types) for filtering and attribution.

Pure scalar kernel over the same from-scratch DOM (functions/htmlx.py);
tolerant by contract: malformed JSON-LD or missing tags yield None
fields, never an exception — a garbage page must not kill a partition.
"""

from __future__ import annotations

import json

from .htmlx import Node, parse_html


def _iter_meta(root: Node):
    for n in root.iter():
        if n.tag == "meta":
            key = n.attrs.get("property") or n.attrs.get("name")
            content = n.attrs.get("content")
            if key and content is not None:
                yield key.lower(), content


def _first_ldjson(root: Node):
    for n in root.iter():
        if (n.tag == "script"
                and n.attrs.get("type", "").lower() == "application/ld+json"):
            raw = "".join(c for c in n.children if isinstance(c, str))
            try:
                obj = json.loads(raw)
            except (ValueError, TypeError):
                continue
            if isinstance(obj, dict):
                return obj
            # arrays of entities: take the first object
            if isinstance(obj, list):
                for item in obj:
                    if isinstance(item, dict):
                        return item
    return None


def extract_metadata(html: str) -> dict:
    """One record per page: og:title, description meta, and the JSON-LD
    entity's @type / headline / wordCount (None where absent)."""
    root = parse_html(html)
    meta = {}
    for k, v in _iter_meta(root):
        meta.setdefault(k, v)  # first occurrence wins, like crawlers do
    ld = _first_ldjson(root) or {}
    wc = ld.get("wordCount")
    return {
        "og_title": meta.get("og:title"),
        "description": meta.get("description"),
        "ld_type": ld.get("@type") if isinstance(ld.get("@type"), str) else None,
        "ld_headline": (ld.get("headline")
                        if isinstance(ld.get("headline"), str) else None),
        "word_count": int(wc) if isinstance(wc, (int, float)) and not
                      isinstance(wc, bool) else None,
    }
