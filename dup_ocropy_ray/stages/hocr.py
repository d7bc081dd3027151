"""hOCR assembly sink (reference ocropus-hocr:65-159).

Consumes recognized line rows (doc_id, media_ref, span_offset,
line_order, bbox, text) and emits one hOCR HTML document per doc_id via
``groupby(doc_id).map_groups`` — an ordered per-doc formatting stage:

- lines render in reading order (``ocr_line`` spans with bbox titles);
- font size scales off the median line x-height, estimated from a sample
  of <=100 lines exactly like the reference (ocropus-hocr:51-63);
- paragraph breaks where the vertical gap between consecutive lines
  exceeds the median x-height (the reference's sequential-scan heuristic,
  ocropus-hocr:100-113).
"""

from __future__ import annotations

import html as _html

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

HOCR_SCHEMA = pa.schema(
    [pa.field("doc_id", pa.string()), pa.field("html", pa.string())]
)

_HEADER = (
    "<!DOCTYPE html>\n<html>\n<head>\n<meta charset=\"utf-8\"/>\n"
    "<meta name=\"ocr-system\" content=\"dup_ocropy_ray\"/>\n"
    "<meta name=\"ocr-capabilities\" content=\"ocr_page ocr_par ocr_line\"/>\n"
    "</head>\n<body>\n"
)
_FOOTER = "</body>\n</html>\n"


def estimate_xheight(heights: np.ndarray, sample: int = 100) -> float:
    """Median line-image height * 0.5 over a <=sample subset (reference
    ocropus-hocr:51-63 falls back to 0.5 * median image height)."""
    if len(heights) == 0:
        return 10.0
    sel = heights[:sample]
    return max(1.0, 0.5 * float(np.median(sel)))


def _doc_html(g: pd.DataFrame) -> str:
    g = g.sort_values(["span_offset", "line_order"])
    heights = (g["y1"] - g["y0"]).to_numpy(dtype=np.float64)
    xheight = estimate_xheight(heights)
    parts = []
    for page_off, page in g.groupby("span_offset", sort=True):
        ref = page["media_ref"].iloc[0]
        parts.append(f"<div class='ocr_page' title='image {_html.escape(str(ref))}'>")
        parts.append("<p class='ocr_par'>")
        # columns once per page (no per-row Series boxing)
        y0 = page["y0"].to_numpy(np.float64)
        y1 = page["y1"].to_numpy(np.float64)
        brk = np.zeros(len(page), bool)
        brk[1:] = (y0[1:] - y1[:-1]) > xheight
        coords = page[["x0", "y0", "x1", "y1"]].to_numpy(np.int64)
        for b, (x0, cy0, x1, cy1), t in zip(
                brk, coords.tolist(), page["text"].tolist()):
            if b:
                parts.append("</p>\n<p class='ocr_par'>")
            parts.append(
                f"<span class='ocr_line' title='bbox {x0} {cy0} {x1} {cy1}'>"
                f"{_html.escape(t or '')}</span><br/>"
            )
        parts.append("</p>\n</div>")
    return _HEADER + "\n".join(parts) + "\n" + _FOOTER


def hocr_from_lines(rec_lines: rd.Dataset) -> rd.Dataset:
    """Recognized line rows -> (doc_id, html) rows."""

    def per_doc(g: pd.DataFrame) -> pa.Table:
        g = g[(g["line_order"] >= 0) & (g["rec_status"] == "ok")]
        doc_id = g["doc_id"].iloc[0] if len(g) else None
        if doc_id is None:
            return pa.Table.from_pylist([], schema=HOCR_SCHEMA)
        return pa.Table.from_pylist(
            [{"doc_id": doc_id, "html": _doc_html(g)}], schema=HOCR_SCHEMA
        )

    from .reassemble import map_docs_partitioned

    return map_docs_partitioned(rec_lines, per_doc, HOCR_SCHEMA)
