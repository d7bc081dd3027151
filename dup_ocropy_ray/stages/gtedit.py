"""Correction-HTML sink + inverse extractor (reference ocropus-gtedit:
generation 171-212, extraction 223-255).

The reference emits an HTML page per book with each text line's image
base64-embedded next to a contenteditable transcript, lets a human fix
the text, then re-extracts (line image, corrected text) pairs from the
saved HTML. Here: one HTML document per doc_id via an ordered per-doc
``groupby(doc_id).map_groups`` over recognized lines that kept their
PNGs, and a pure-function inverse parser for the round trip.
"""

from __future__ import annotations

import base64
import html as _html
import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

GTEDIT_SCHEMA = pa.schema(
    [pa.field("doc_id", pa.string()), pa.field("html", pa.string())]
)

_HEADER = (
    "<!DOCTYPE html>\n<html>\n<head><meta charset=\"utf-8\"/>"
    "<title>correction</title></head>\n<body>\n"
)
_FOOTER = "</body>\n</html>\n"

_LINE_RE = re.compile(
    r"<div class='line' data-line='(?P<lid>[^']*)'>\s*"
    r"<img src='data:image/png;base64,(?P<b64>[A-Za-z0-9+/=]*)'/>\s*"
    r"<p contenteditable='true'>(?P<text>.*?)</p>",
    re.DOTALL,
)


def _doc_html(g: pd.DataFrame) -> str:
    g = g.sort_values(["span_offset", "line_order"])
    # columns once (no per-row Series boxing); the b64 encode dominates
    parts = [
        f"<div class='line' data-line='{_html.escape(f'{ref}#{order}')}'>\n"
        f"<img src='data:image/png;base64,"
        f"{base64.b64encode(lp).decode('ascii')}'/>\n"
        f"<p contenteditable='true'>{_html.escape(t or '')}</p>\n"
        "</div>"
        for ref, order, lp, t in zip(
            g["media_ref"].tolist(),
            g["line_order"].to_numpy(np.int64).tolist(),
            g["line_png"].tolist(), g["text"].tolist())
    ]
    return _HEADER + "\n".join(parts) + "\n" + _FOOTER


def correction_html_from_lines(rec_lines: rd.Dataset) -> rd.Dataset:
    """Recognized line rows (must retain ``line_png``; run the recognizer
    with ``keep_png=True``) -> (doc_id, html) rows."""

    def per_doc(g: pd.DataFrame) -> pa.Table:
        g = g[(g["line_order"] >= 0) & (g["rec_status"] == "ok")]
        if not len(g):
            return pa.Table.from_pylist([], schema=GTEDIT_SCHEMA)
        return pa.Table.from_pylist(
            [{"doc_id": g["doc_id"].iloc[0], "html": _doc_html(g)}],
            schema=GTEDIT_SCHEMA,
        )

    from .reassemble import map_docs_partitioned

    return map_docs_partitioned(rec_lines, per_doc, GTEDIT_SCHEMA)


def extract_correction_html(html_text: str) -> list[dict]:
    """Inverse parser (reference ocropus-gtedit:223-255): HTML ->
    [{line_id, png, text}], in document order. Unescapes the transcript
    and decodes the embedded PNG bytes."""
    import html as _h

    out = []
    for m in _LINE_RE.finditer(html_text):
        out.append(
            {
                "line_id": _h.unescape(m.group("lid")),
                "png": base64.b64decode(m.group("b64")),
                "text": _h.unescape(m.group("text")).strip(),
            }
        )
    return out
