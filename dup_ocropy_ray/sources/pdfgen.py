"""Deterministic minimal-PDF writer, from scratch (no PDF libs in the
container). Emits structurally valid PDF 1.4: catalog -> page tree ->
pages with Helvetica text content streams (optionally FlateDecode), a
correct xref table and trailer.

Purpose: synthesize layout-bearing PDFs from plain text so the from-
scratch extractor (functions/pdfx.py) can be exercised and oracle-
checked as a round-trip — ``parse(render(text)) == normalize(text)``.
Layout is a pure function of (doc_id, text): docs with odd doc_id render
in TWO balanced columns (the extractor must recover reading order:
left column top-down, then right), even doc_ids in one column; long
texts paginate.
"""

from __future__ import annotations

import zlib

PAGE_W, PAGE_H = 612, 792  # US Letter, 1/72 inch units
MARGIN = 50
LEADING = 14
FONT_SIZE = 11
LINES_PER_COL = (PAGE_H - 2 * MARGIN) // LEADING  # 49


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _wrap_words(text: str, per_line: int) -> list[str]:
    w = text.split()
    return [" ".join(w[i:i + per_line]) for i in range(0, len(w), per_line)]


def _column_stream(lines: list[str], x: int) -> str:
    if not lines:
        return ""
    parts = [f"BT /F1 {FONT_SIZE} Tf 1 0 0 1 {x} {PAGE_H - MARGIN} Tm"]
    for ln in lines:
        parts.append(f"0 -{LEADING} Td ({_esc(ln)}) Tj")
    parts.append("ET")
    return " ".join(parts)


def render_pdf(doc_id: int, text: str, compress: bool = True) -> bytes:
    """Render ``text`` into PDF bytes. doc_id odd -> two-column layout
    (5 words/line), even -> single column (9 words/line). Deterministic;
    ``pdfx.extract_pdf_text`` recovers the whitespace-normalized text."""
    two_col = doc_id % 2 == 1
    lines = _wrap_words(text, 5 if two_col else 9)

    # split lines into per-page column chunks, reading order preserved
    page_streams: list[str] = []
    if two_col:
        per_page = 2 * LINES_PER_COL
        for p in range(0, max(1, len(lines)), per_page):
            chunk = lines[p:p + per_page]
            half = (len(chunk) + 1) // 2
            left = _column_stream(chunk[:half], MARGIN)
            right = _column_stream(chunk[half:], PAGE_W // 2 + 10)
            page_streams.append((left + " " + right).strip())
    else:
        for p in range(0, max(1, len(lines)), LINES_PER_COL):
            page_streams.append(_column_stream(lines[p:p + LINES_PER_COL],
                                               MARGIN))

    # ---- object assembly: 1=catalog 2=pages 3=font, then per page
    # (page obj, content obj)
    objs: dict[int, bytes] = {}
    n_pages = len(page_streams)
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>"
               ).encode()
    objs[3] = (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for i, cs in enumerate(page_streams):
        page_no, cont_no = 4 + 2 * i, 5 + 2 * i
        objs[page_no] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W} {PAGE_H}]"
            f" /Resources << /Font << /F1 3 0 R >> >>"
            f" /Contents {cont_no} 0 R >>").encode()
        data = cs.encode("latin-1", errors="replace")
        if compress:
            data = zlib.compress(data)
            head = f"<< /Length {len(data)} /Filter /FlateDecode >>"
        else:
            head = f"<< /Length {len(data)} >>"
        objs[cont_no] = (head.encode() + b"\nstream\n" + data
                         + b"\nendstream")

    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    n_obj = max(objs) + 1
    out += f"xref\n0 {n_obj}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, n_obj):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {n_obj} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)
