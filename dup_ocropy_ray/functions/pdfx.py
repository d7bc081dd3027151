"""PDF layout parse + text extraction, from scratch (no PDF libs in the
container): object scanner, FlateDecode, a content-stream tokenizer for
the text operators (BT/ET, Tf, Td/TD/Tm/T*, Tj/TJ), and a layout pass
that recovers reading order — columns detected by x-gap clustering, each
column read top-down — the PDF leg of the north rule's main-content
extraction pipeline.

Scope: Type1/simple-font text PDFs with uncompressed or FlateDecode
content streams (exactly what sources/pdfgen.py emits, and the common
case for text-born PDFs). No xref-stream/object-stream (PDF 1.5+)
support; the object scanner is offset-table-free on purpose — it finds
``N 0 obj .. endobj`` spans directly, which also survives mildly
corrupted xref tables.
"""

from __future__ import annotations

import re
import zlib

_KIDS_RE = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+0\s+R)+)\s*\]")
_REF_RE = re.compile(rb"(\d+)\s+0\s+R")
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+0\s+R")
_NUM_RE = re.compile(r"[-+]?\d*\.?\d+")

_ESCAPES = {"n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f",
            "(": "(", ")": ")", "\\": "\\"}


_OBJ_START_RE = re.compile(rb"(\d+)\s+0\s+obj\b")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\b")


def _scan_objects(data: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """num -> (dict/body bytes, decoded stream bytes or None).

    Sequential walk, not a single regex: compressed stream bytes can
    contain ``endobj``/``N 0 obj`` lookalikes, so each stream is sliced
    by its /Length (marker fallback when absent) and the scan resumes
    AFTER the consumed object."""
    objs: dict[int, tuple[bytes, bytes | None]] = {}
    pos = 0
    while True:
        m = _OBJ_START_RE.search(data, pos)
        if m is None:
            return objs
        num, i = int(m.group(1)), m.end()
        s = data.find(b"stream", i)
        e = data.find(b"endobj", i)
        stream = None
        if s != -1 and (e == -1 or s < e):
            head = data[i:s]
            start = s + len(b"stream")
            if data[start:start + 2] == b"\r\n":
                start += 2
            elif data[start:start + 1] == b"\n":
                start += 1
            lm = _LENGTH_RE.search(head)
            if lm:
                end = start + int(lm.group(1))
            else:
                end = data.find(b"endstream", start)
                end = end if end != -1 else len(data)
            raw = data[start:end].rstrip(b"\r\n") if not lm else data[start:end]
            if b"/FlateDecode" in head:
                try:
                    raw = zlib.decompress(raw)
                except zlib.error:
                    raw = b""
            stream = raw
            body = head
            pos = data.find(b"endobj", end)
            pos = pos + 6 if pos != -1 else len(data)
        else:
            body = data[i:e] if e != -1 else data[i:]
            pos = e + 6 if e != -1 else len(data)
        objs[num] = (body, stream)


def _page_content_streams(objs) -> list[bytes]:
    """Content streams in page-tree order (falls back to object-number
    order when no /Kids page tree is found)."""
    pages: list[int] = []
    for num in sorted(objs):
        body, _ = objs[num]
        if b"/Type" in body and b"/Pages" in body:
            km = _KIDS_RE.search(body)
            if km:
                pages = [int(r.group(1)) for r in _REF_RE.finditer(km.group(1))]
                break
    if not pages:
        pages = [n for n in sorted(objs)
                 if b"/Type" in objs[n][0] and b"/Page" in objs[n][0]
                 and b"/Pages" not in objs[n][0]]
    out = []
    for p in pages:
        body, _ = objs.get(p, (b"", None))
        cm = _CONTENTS_RE.search(body)
        if cm:
            stream = objs.get(int(cm.group(1)), (b"", None))[1]
            if stream:
                out.append(stream)
    return out


def _unescape(s: str) -> str:
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            nxt = s[i + 1]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
                continue
            if nxt.isdigit():  # octal \ooo (1-3 digits)
                j = i + 1
                while j < min(i + 4, n) and s[j].isdigit():
                    j += 1
                out.append(chr(int(s[i + 1:j], 8)))
                i = j
                continue
            i += 1  # line continuation / unknown escape: drop backslash
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _tokenize(content: str):
    """Yield ('str', text) | ('num', float) | ('op', name) tokens.
    Strings honor nested parens and backslash escapes; names and array
    brackets are passed through as ops the caller can ignore."""
    i, n = 0, len(content)
    while i < n:
        c = content[i]
        if c.isspace():
            i += 1
        elif c == "(":
            depth, j, buf = 1, i + 1, []
            while j < n and depth:
                ch = content[j]
                if ch == "\\" and j + 1 < n:
                    buf.append(content[j:j + 2])
                    j += 2
                    continue
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        break
                buf.append(ch)
                j += 1
            yield ("str", _unescape("".join(buf)))
            i = j + 1
        elif c == "/":
            j = i + 1
            while j < n and not content[j].isspace() and content[j] not in "/[]()<>":
                j += 1
            yield ("name", content[i:j])
            i = j
        elif c in "[]<>":
            yield ("op", c)
            i += 1
        else:
            m = _NUM_RE.match(content, i)
            if m and m.start() == i:
                yield ("num", float(m.group()))
                i = m.end()
            else:
                j = i
                while j < n and not content[j].isspace() and content[j] not in "/[]()<>":
                    j += 1
                yield ("op", content[i:j])
                i = j if j > i else i + 1


def _nums(stack: list, k: int) -> bool:
    """Last k stack entries are numeric (corrupt streams can leave
    strings where operands belong — skip the op rather than raise)."""
    return all(isinstance(v, float) for v in stack[-k:])


def _text_runs(content: bytes) -> list[tuple[float, float, str]]:
    """Execute the text operators of one content stream, returning
    positioned runs (x, y, text)."""
    runs: list[tuple[float, float, str]] = []
    stack: list = []
    lx = ly = 0.0  # text line origin
    tl = 0.0  # leading (TL / TD)
    pending_str: list[str] = []
    in_array = False
    for kind, val in _tokenize(content.decode("latin-1", errors="replace")):
        if kind == "num":
            stack.append(val)
        elif kind == "name":
            continue
        elif kind == "str":
            if in_array:
                pending_str.append(val)
            else:
                stack.append(val)
        else:  # op
            if val == "[":
                in_array, pending_str = True, []
            elif val == "]":
                in_array = False
                stack.append("".join(pending_str))
            elif val == "BT":
                lx = ly = 0.0
                stack.clear()
            elif val == "Tm" and len(stack) >= 6 and _nums(stack, 2):
                lx, ly = float(stack[-2]), float(stack[-1])
                stack.clear()
            elif val in ("Td", "TD") and len(stack) >= 2 and _nums(stack, 2):
                tx, ty = float(stack[-2]), float(stack[-1])
                if val == "TD":
                    tl = -ty
                lx, ly = lx + tx, ly + ty
                stack.clear()
            elif val == "TL" and stack and _nums(stack, 1):
                tl = float(stack[-1])
                stack.clear()
            elif val == "T*":
                ly -= tl
                stack.clear()
            elif val in ("Tj", "TJ", "'"):
                if val == "'":
                    ly -= tl
                if stack and isinstance(stack[-1], str):
                    s = stack[-1]
                    if s:
                        runs.append((lx, ly, s))
                stack.clear()
            elif val in ("ET", "Tf", "Tc", "Tw", "Tz", "Ts", "Tr"):
                stack.clear()
    return runs


def extract_pdf_runs(pdf: bytes) -> list[list[tuple[float, float, str]]]:
    """Per-page positioned text runs, in page order."""
    objs = _scan_objects(pdf)
    return [_text_runs(cs) for cs in _page_content_streams(objs)]


def _reading_order(runs: list[tuple[float, float, str]],
                   gutter: float = 80.0) -> list[str]:
    """Layout pass: cluster run x-origins into columns (split at x gaps
    wider than ``gutter``), read each column top-down, left column
    first; runs sharing a quantized baseline join into one line."""
    if not runs:
        return []
    xs = sorted({x for x, _, _ in runs})
    col_starts = [xs[0]]
    for a, b in zip(xs, xs[1:]):
        if b - a > gutter:
            col_starts.append(b)

    def col_of(x: float) -> int:
        c = 0
        for i, s in enumerate(col_starts):
            if x >= s - 1e-6:
                c = i
        return c

    lines: list[str] = []
    for ci in range(len(col_starts)):
        col = [r for r in runs if col_of(r[0]) == ci]
        col.sort(key=lambda r: (-round(r[1], 1), r[0]))
        cur_y = None
        cur: list[str] = []
        for x, y, s in col:
            qy = round(y, 1)
            if cur_y is None or qy == cur_y:
                cur.append(s)
            else:
                lines.append(" ".join(cur))
                cur = [s]
            cur_y = qy
        if cur:
            lines.append(" ".join(cur))
    return lines


def extract_pdf_lines(pdf: bytes, gutter: float = 80.0) -> list[str]:
    out: list[str] = []
    for page in extract_pdf_runs(pdf):
        out.extend(_reading_order(page, gutter))
    return out


def extract_pdf_text(pdf: bytes, gutter: float = 80.0) -> str:
    """Whole-document text in reading order, single-space-joined and
    whitespace-normalized."""
    return re.sub(r"\s+", " ", " ".join(extract_pdf_lines(pdf, gutter))).strip()
