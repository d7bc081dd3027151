"""CETR main-content extraction via tag ratios (Weninger, Hsu & Han,
"CETR: Content Extraction via Tag Ratios", WWW 2010).

A third, independent boilerplate-removal family next to the DOM-scorer
(htmlx.extract_main_text, readability/Kohlschuetter-style) and the
block classifier (htmlx.justext_classify): CETR never builds a DOM. It
lines the raw markup, computes per-line text-to-tag ratios, smooths
them, and clusters lines into content vs boilerplate with a
deterministic 1-D k-means. Disagreement between the three families is
itself a useful quality signal (see pipelines/extract.cetr_table).

Minified pages (the synthetic corpus renders single-line HTML) get a
re-lining pass first — a '\n' is inserted before every block-level open
tag — which is the standard preprocessing when CETR meets unformatted
markup; on pretty-printed real-web HTML the re-lining is a no-op on
already-broken lines.

Pure scalar kernel: one HTML string in, content text out. Distribution
happens in pipelines/extract.py (stateless ``map_batches``, per-doc
parse, no shuffle). No reference-engine counterpart (ocropy is
image-side); this is the north rule's HTML-extraction leg.
"""

from __future__ import annotations

import html as _html
import re

import numpy as np

_SCRIPT_RE = re.compile(
    r"<(script|style|noscript|template)\b[^>]*>.*?</\1\s*>",
    re.I | re.S,
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
# Block-level open tags: a fresh visual line starts here.
_RELINE_RE = re.compile(
    r"(?=<(?:p|div|h[1-6]|li|ul|ol|td|th|tr|table|article|section|nav|"
    r"footer|header|aside|main|blockquote|pre|dd|dt|dl|form|figure|br|hr)\b)",
    re.I,
)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def line_tag_ratios(html: str) -> tuple[list[str], np.ndarray]:
    """Split ``html`` into visual lines and compute the per-line
    text-to-tag ratio TTR_i = |text chars| / max(1, |tags|).

    Returns (texts, ttr): the visible text of each non-empty line and a
    float64 ratio array of the same length. Lines with neither tags nor
    text are dropped (the paper's blank-line removal).
    """
    body = _COMMENT_RE.sub("", _SCRIPT_RE.sub("", html))
    texts: list[str] = []
    ratios: list[float] = []
    for raw in _RELINE_RE.split(body.replace("\r", "\n")):
        for line in raw.split("\n"):
            n_tags = len(_TAG_RE.findall(line))
            text = _WS_RE.sub(" ", _html.unescape(_TAG_RE.sub(" ", line))).strip()
            if n_tags == 0 and not text:
                continue
            texts.append(text)
            ratios.append(len(text) / max(1, n_tags))
    return texts, np.asarray(ratios, dtype=np.float64)


def smooth_ratios(ttr: np.ndarray, radius: int = 2) -> np.ndarray:
    """Centered moving-average smoothing (the paper's histogram pass,
    radius 2 → width-5 window), edge-truncated so short pages keep
    their mass."""
    n = ttr.shape[0]
    if n == 0:
        return ttr
    width = 2 * radius + 1
    kernel = np.ones(width)
    num = np.convolve(ttr, kernel, mode="same")
    den = np.convolve(np.ones(n), kernel, mode="same")
    return num / den


def kmeans1d_content_mask(values: np.ndarray, max_iter: int = 64) -> np.ndarray:
    """Deterministic 1-D 2-means: centroids init at (min, max), Lloyd
    iterations to a fixed point; returns a bool mask of the
    higher-centroid (content) cluster.

    CETR's clustering step with the paper's "cluster whose centroid is
    closest to the origin is boilerplate, everything else is content"
    rule specialised to k=2. All-equal input → everything is content
    (a tagless text file is all text)."""
    n = values.shape[0]
    if n == 0:
        return np.zeros(0, dtype=bool)
    lo, hi = float(values.min()), float(values.max())
    if hi <= lo:
        return np.ones(n, dtype=bool)
    c = np.array([lo, hi], dtype=np.float64)
    for _ in range(max_iter):
        assign = np.abs(values[:, None] - c[None, :]).argmin(axis=1)
        new = np.array([
            values[assign == j].mean() if np.any(assign == j) else c[j]
            for j in range(2)
        ])
        if np.allclose(new, c):
            break
        c = new
    # re-assign against the FINAL centroids: on a max_iter exit the
    # loop's last `assign` reflects the previous iterate's centroids
    assign = np.abs(values[:, None] - c[None, :]).argmin(axis=1)
    return assign == int(c.argmax())


def extract_main_text_cetr(html: str, radius: int = 2) -> str:
    """CETR end-to-end: line → TTR → smooth → 2-means → join the text
    of content lines in document order."""
    texts, ttr = line_tag_ratios(html)
    mask = kmeans1d_content_mask(smooth_ratios(ttr, radius=radius))
    return " ".join(t for t, m in zip(texts, mask) if m and t).strip()


def cetr_stats(html: str, radius: int = 2) -> dict:
    """Per-page CETR summary for the distributed table: line counts,
    content-line count, and the text the cluster kept."""
    texts, ttr = line_tag_ratios(html)
    smoothed = smooth_ratios(ttr, radius=radius)
    mask = kmeans1d_content_mask(smoothed)
    content = " ".join(t for t, m in zip(texts, mask) if m and t).strip()
    return {
        "n_lines": int(ttr.shape[0]),
        "n_content_lines": int(mask.sum()),
        "content_chars": len(content),
        "content_text": content,
    }
