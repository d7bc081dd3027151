"""Debug / results-browser HTML sink (reference ocropus-visualize-results:
46-113, SURVEY.md S11).

The reference walks a book directory and writes an ``index.html`` per
page directory: each recognized line's text (dark-blue bold) above its
line image at half width, plus a page-level section with a 1/8-scale
page thumbnail and the first few transcripts. Here: one HTML document
per doc_id assembled from recognized line rows (which keep their PNGs)
via an ordered per-doc ``groupby(doc_id).map_groups``; the page
thumbnail is decoded from the broadcast media store and downscaled 8x
inside the group UDF.
"""

from __future__ import annotations

import base64
import html as _html

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..functions import png

DEBUG_HTML_SCHEMA = pa.schema(
    [pa.field("doc_id", pa.string()), pa.field("html", pa.string())]
)

_HEADER = (
    "<!DOCTYPE html>\n<html>\n<head><meta charset=\"utf-8\"/>"
    "<title>results</title></head>\n<body>\n"
)
_FOOTER = "</body>\n</html>\n"


def _thumb_b64(page_bytes: bytes, zoom: int = 8) -> str:
    """1/zoom-scale grayscale thumbnail (reference zooms 0.125,
    ocropus-visualize-results:92-94), re-encoded as PNG base64."""
    g = png.decode_gray(page_bytes)
    th = g[::zoom, ::zoom]
    return base64.b64encode(png.encode_gray(th.astype(np.float64))).decode("ascii")


def _doc_html(g: pd.DataFrame, store=None) -> str:
    g = g.sort_values(["span_offset", "line_order"])
    parts = [f"<h1>{_html.escape(str(g['doc_id'].iloc[0]))}</h1>"]
    for ref, page in g.groupby("media_ref", sort=False):
        parts.append(f"<h2>{_html.escape(str(ref))}</h2>")
        if store is not None and ref in store:
            parts.append(
                "<img class='thumb' src='data:image/png;base64,"
                f"{_thumb_b64(store[ref])}'/><br/>"
            )
        # columns once per page (no per-row Series boxing); absent
        # columns fall back to the same defaults r.get() used
        n = len(page)
        col = lambda c, d: (page[c].tolist() if c in page.columns
                            else [d] * n)
        for order, st, t, lp, x0, x1 in zip(
                col("line_order", 0), col("page_status", ""),
                col("text", ""), col("line_png", None),
                col("x0", 0), col("x1", 0)):
            if (order if order is not None else 0) < 0:  # page marker
                st = st or ""
                if st and st != "ok":
                    parts.append(
                        f"<font color='red'>[{_html.escape(str(st))}]</font><br/>"
                    )
                continue
            parts.append(
                "<font color='#000066'><b>"
                f"{_html.escape(str(t or ''))}</b></font><br/>"
            )
            if lp is not None:
                b64 = base64.b64encode(lp).decode("ascii")
                w = max(10, (int(x1) - int(x0)) // 2)
                parts.append(
                    f"<img width='{w}' src='data:image/png;base64,{b64}'/><br/>"
                )
            parts.append("<hr/>")
    return _HEADER + "\n".join(parts) + "\n" + _FOOTER


def debug_html_from_lines(rec_lines: rd.Dataset, media_store_ref=None) -> rd.Dataset:
    """Recognized line rows (run the recognizer with ``keep_png=True``)
    -> (doc_id, html) debug pages. ``media_store_ref`` (a ``ray.put``
    broadcast) enables page thumbnails; fetched zero-copy per worker."""

    def per_doc(g: pd.DataFrame) -> pa.Table:
        store = ray.get(media_store_ref) if media_store_ref is not None else None
        return pa.Table.from_pylist(
            [{"doc_id": str(g["doc_id"].iloc[0]), "html": _doc_html(g, store)}],
            schema=DEBUG_HTML_SCHEMA,
        )

    from .reassemble import map_docs_partitioned

    return map_docs_partitioned(rec_lines, per_doc, DEBUG_HTML_SCHEMA)
