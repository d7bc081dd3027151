"""Deterministic synthetic glyph font + line/page renderer.

Plays the role of the reference's synthetic line generator
(reference ocropus-linegen:128-240: render text in a TTF font into
binarized line images with ground truth) without any font files or image
libraries: every character gets a reproducible, visually-distinct stroke
glyph derived from a seeded RNG keyed on the codepoint. Pages follow the
reference's input envelope (dark ink on white, page dims within
600..10000 px, reference ocropus-nlbin:61-69).

All rendering is pure numpy and fully deterministic — same seed, same
pixels — so recognition goldens are stable across machines and rounds.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

GLYPH_H = 32  # nominal glyph cell height (ink box)
GLYPH_W = 10  # nominal ink width
ADVANCE = GLYPH_W + 4  # x advance per glyph
SPACE_ADVANCE = 10
LEADING = 56  # baseline-to-baseline distance on a page
FONT_SEED = 20240817

# charset the synthetic corpus can render (codec adds blank + '~')
CHARSET = "abcdefghijklmnopqrstuvwxyz0123456789 "


def _draw_stroke(canvas: np.ndarray, p0, p1, thickness: int) -> None:
    n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1])) * 2 + 3)
    ys = np.linspace(p0[0], p1[0], n)
    xs = np.linspace(p0[1], p1[1], n)
    r = thickness // 2
    h, w = canvas.shape
    for y, x in zip(ys, xs):
        y0, x0 = int(round(y)), int(round(x))
        canvas[max(0, y0 - r) : min(h, y0 + r + 1), max(0, x0 - r) : min(w, x0 + r + 1)] = 1


@lru_cache(maxsize=512)
def glyph(ch: str) -> np.ndarray:
    """Binary ink mask (GLYPH_H x GLYPH_W) for one character. Space returns
    an empty mask.

    The font is a deterministic band-code: a full-height stem column
    followed by three 4-px-wide columns whose vertical band (top /
    middle / bottom / full) encodes the character index in base 4. Every
    glyph is one connected component with enough area for the
    segmenter's scale estimate, and glyphs have maximally distinct
    column-intensity profiles — a machine-distinctive stand-in for a TTF
    (no font rendering libs in this environment) that keeps the whole
    binarize→segment→recognize chain honest."""
    if ch == " ":
        return np.zeros((GLYPH_H, GLYPH_W), dtype=np.uint8)
    idx = CHARSET.index(ch) if ch in CHARSET else 37 + (ord(ch) % 7)
    canvas = np.zeros((GLYPH_H, GLYPH_W), dtype=np.uint8)
    # five 2-px columns, each carrying a 20-px band whose vertical offset
    # (4 choices) encodes one base-4 digit of the char index. EVERY column
    # is class-distinctive — there is no class-invariant stem for the CTC
    # alignment to park character mass on. Offsets differ by <=12 < 20 so
    # adjacent columns always overlap vertically: one connected component
    # with area 5*2*20=200 (sqrt 14.1 > the segmenter's minscale 12).
    offsets = (0, 4, 8, 12)
    band_h = 20
    v = idx + 1  # avoid the all-zeros code so no glyph is a plain rectangle
    for c in range(5):
        o = offsets[v % 4]
        v //= 4
        canvas[o : o + band_h, 2 * c : 2 * c + 2] = 1
    return canvas


def measure_text(text: str) -> int:
    return sum(SPACE_ADVANCE if c == " " else ADVANCE for c in text)


def render_line(text: str) -> np.ndarray:
    """Render one text line as float ink-on-white: 1.0 = white background,
    0.0 = ink. Shape (GLYPH_H + 8, width)."""
    width = max(1, measure_text(text))
    img = np.ones((GLYPH_H + 8, width), dtype=np.float64)
    x = 0
    for c in text:
        if c == " ":
            x += SPACE_ADVANCE
            continue
        g = glyph(c if c in set(CHARSET) else "~"[0])
        img[4 : 4 + GLYPH_H, x : x + GLYPH_W][g > 0] = 0.0
        x += ADVANCE
    return img


def render_page(
    lines: list[str],
    margin: int = 60,
    min_width: int = 700,
    min_height: int = 700,
) -> np.ndarray:
    """Stack rendered lines into a single-column page (white background,
    dark ink), honoring the reference's 600..10000 px page envelope."""
    rendered = [render_line(t) for t in lines]
    text_w = max((r.shape[1] for r in rendered), default=0)
    width = max(min_width, text_w + 2 * margin)
    height = max(min_height, len(lines) * LEADING + 2 * margin)
    page = np.ones((height, width), dtype=np.float64)
    y = margin
    for r in rendered:
        h, w = r.shape
        page[y : y + h, margin : margin + w] = np.minimum(page[y : y + h, margin : margin + w], r)
        y += LEADING
    return page


def wrap_text(text: str, max_chars: int = 24) -> list[str]:
    """Greedy word wrap over the renderable charset (others -> dropped)."""
    clean = "".join(c if c in set(CHARSET) else " " for c in text.lower())
    words = clean.split()
    lines: list[str] = []
    cur: list[str] = []
    n = 0
    for w in words:
        add = len(w) + (1 if cur else 0)
        if cur and n + add > max_chars:
            lines.append(" ".join(cur))
            cur, n = [w], len(w)
        else:
            cur.append(w)
            n += add
    if cur:
        lines.append(" ".join(cur))
    return lines
