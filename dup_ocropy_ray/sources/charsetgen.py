"""Synthetic full-charset line corpus — the reference's default charset
(ocrolib/chars.py:7-22: ascii + xsymbols + German umlauts/ß + French +
Portuguese accents) rendered with the from-scratch TTF rasterizer
(functions/ttf.py) under linegen degradations, including Unicode
ligature glyphs (ﬁ ﬂ ﬀ ﬃ ﬄ) whose ground truth is their expanded form
per chars.py:37-59 / functions/text.py REPLACEMENTS.

Deterministic per (n, seed): the trainer (scripts/train_charset_model.py)
and the conformance query (full_charset_cer) draw from DISJOINT seed
ranges of the same generator, so the query's lines are guaranteed
held-out."""

from __future__ import annotations

import numpy as np

from ..functions.text import normalize_text
from ..stages.lineest import check_line
from . import linegen

SERIF = "/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf"

# word bank spanning the reference default charset (chars.py:14-22)
GERMAN = ("Größe Straße Übung Äpfel Öfen müssen weiß heißen Bücher "
          "Mädchen König schön für über zwölf Fluß dreißig".split())
FRENCH = ("été élève français garçon œuvre cœur Noël naïve forêt "
          "âme être hôtel çà déjà août maïs Æneas æther".split())
PORTUGUESE = ("ação São coração não está você história até órgão "
              "Índia Òbidos Ãs Ìtem Úrsula lá ímã".split())
ENGLISH = ("the quick brown fox jumps over lazy dog final offer "
           "affine effect waffle traffic office fifty".split())
SYMBOLS = ("€5 ¢99 £20 25° §12 ¶3 ©2026 ®marca †note ‡ref ¡Hola! "
           "¿Qué? «oui» ›x‹ 3÷4 a•b".split())
LIGS = {"fi": "ﬁ", "fl": "ﬂ", "ffi": "ﬃ", "ffl": "ﬄ", "ff": "ﬀ"}

# the word banks above leave roughly half the codec unseen (rare
# punctuation, most uppercase, several accents); "soup" words sample
# the FULL charset directly so every codec class gets training mass
_SOUP_RATE = 0.25


def _soup_pool() -> list[str]:
    """Renderable charset members (drop blank/space/'~' sentinel)."""
    return [c for c in default_charset()[3:]]


def _soup_word(rng: np.random.Generator, pool: list[str]) -> str:
    return "".join(pool[int(rng.integers(len(pool)))]
                   for _ in range(int(rng.integers(2, 6))))

TRAIN_SEED_BASE = 1_000_000  # + user seed; other ranges disjoint
EVAL_SEED_BASE = 9_000_000   # trainer's model-SELECTION eval stream
# the conformance query/test draws from a THIRD stream, disjoint from
# both training data and the checkpoint-selection eval — otherwise the
# gate would score the model on the very lines used to pick it
QUERY_SEED_BASE = 5_000_000


def default_charset() -> list[str]:
    """Reference chars.py `default` as a codec charset (blank + space +
    '~' + printable ascii + accents/symbols), NFC, order-stable."""
    xsymbols = "€¢£»«›‹÷©®†‡°∙•◦‣¶§¡¿▪▫"
    german = "ÄäÖöÜüß"
    french = "ÀàÂâÆæÇçÉéÈèÊêËëÎîÏïÔôŒœÙùÛûŸÿ"
    portuguese = "ÁÃÌÍÒÓÕÚáãìíòóõú"
    base = [chr(x) for x in range(33, 126)]
    extra = []
    for c in xsymbols + german + french + portuguese:
        if c not in base and c not in extra:
            extra.append(c)
    return ["", " ", "~"] + base + extra


def ligaturize(s: str, rng: np.random.Generator) -> str:
    """Randomly swap expandable letter runs for their Unicode ligature
    glyphs in the RENDER string (ground truth stays normalized)."""
    for plain, lig in LIGS.items():
        if plain in s and rng.random() < 0.5:
            s = s.replace(plain, lig)
    return s


def gen_lines(n: int, seed: int, fonts: "list[str] | None" = None,
              degradations: str = "med") -> "list[tuple[np.ndarray, str]]":
    """n deterministic (grayscale image, normalized ground truth)
    pairs; render rejects (missing glyph, blank, check_line) skipped."""
    fonts = fonts or [linegen.DEJAVU, SERIF]
    rng = np.random.default_rng(seed)
    banks = [GERMAN, FRENCH, PORTUGUESE, ENGLISH, SYMBOLS]
    pool = _soup_pool()
    out = []
    k = 0
    while len(out) < n and k < 6 * n:
        k += 1
        nw = int(rng.integers(3, 8))
        words = []
        for _ in range(nw):
            if rng.random() < _SOUP_RATE:
                words.append(_soup_word(rng, pool))
                continue
            bank = banks[int(rng.integers(len(banks)))]
            words.append(bank[int(rng.integers(len(bank)))])
        render = ligaturize(" ".join(words), rng)
        gt = normalize_text(render)
        if not gt:
            continue
        font = fonts[int(rng.integers(len(fonts)))]
        try:
            img = linegen.genline(render, seed + 31 * k, font=font,
                                  degradations=degradations)
        except KeyError:  # glyph missing in this face
            continue
        if min(img.shape) < 10 or not (img < 0.5).any():
            continue
        if check_line(1.0 - img):
            continue
        out.append((img, gt))
    return out
