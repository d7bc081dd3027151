"""Text normalization / projection kernels.

Behavioral equivalents of the reference's text handling:
- ``normalize_text``: NFC + whitespace collapse + homograph/ligature
  replacements (reference ocrolib/common.py:46-58, ocrolib/chars.py:37-59).
- ``project_text``: comparison projections exact/nospace/spletdig/letdig/
  letters/digits/lnc (reference ocrolib/common.py:60-81).
- ``requote`` / ``requote_fancy``: typographic-quote restoration
  (reference ocrolib/chars.py:61-87).

All are scalar string functions; the Ray stages apply them vectorized via
pandas ``Series.map`` / pyarrow over string columns (they are pure and
cheap; the dominant cost in the pipeline is image work).
"""

from __future__ import annotations

import re
import unicodedata

# homograph / ligature replacement table (reference ocrolib/chars.py:37-59)
REPLACEMENTS: list[tuple[str, str]] = [
    ("[_~#]", "~"),  # OCR control characters
    ('"', "''"),  # typewriter double quote
    ("`", "'"),  # grave accent
    ("[“”]", "''"),  # fancy double quotes
    ("´", "'"),  # acute accent
    ("[‘’]", "'"),  # single quotation marks
    ("„", ",,"),  # German low quotes
    ("…", "..."),  # ellipsis
    ("′", "'"),  # prime
    ("″", "''"),  # double prime
    ("‴", "'''"),  # triple prime
    ("〃", "''"),  # ditto mark
    ("µ", "μ"),  # micro sign -> greek mu
    ("[–—]", "-"),  # en/em dash
    ("ﬂ", "fl"),  # ligatures
    ("ﬁ", "fi"),
    ("ﬀ", "ff"),
    ("ﬃ", "ffi"),
    ("ﬄ", "ffl"),
]

_REPL_COMPILED = [(re.compile(p), r) for p, r in REPLACEMENTS]


def normalize_text(s: str) -> str:
    """Standard Unicode normalization for OCR output."""
    s = unicodedata.normalize("NFC", str(s))
    s = re.sub(r"\s+", " ", s)
    s = s.strip()
    for pat, rep in _REPL_COMPILED:
        s = pat.sub(rep, s)
    return s


_PROJECTIONS = {
    "nospace": lambda s: re.sub(r"\s", "", s),
    "spletdig": lambda s: re.sub(r"[^A-Za-z0-9 ]", "", s),
    "letdig": lambda s: re.sub(r"[^A-Za-z0-9]", "", s),
    "letters": lambda s: re.sub(r"[^A-Za-z]", "", s),
    "digits": lambda s: re.sub(r"[^0-9]", "", s),
    "lnc": lambda s: re.sub(r"[^A-Z]", "", s.upper()),
}


def project_text(s: str, kind: str = "exact") -> str:
    """Project text onto a smaller character subset for comparison."""
    s = normalize_text(s)
    s = re.sub(r"( *[.] *){4,}", "....", s)  # collapse dot rows
    s = re.sub(r"[~_]", "", s)
    if kind == "exact":
        return s
    try:
        return _PROJECTIONS[kind](s)
    except KeyError:
        raise ValueError(f"unknown projection: {kind}") from None


def gt_explode(s: str) -> list[str]:
    """Split a ground-truth transcription into codec symbols, where a
    multi-character symbol (ligature / digraph, 1-4 chars) is written
    ``_xx_``; ``\\001``/``\\002`` escape literal ``_`` and ``\\``
    (reference ocrolib/common.py:826-836)."""
    parts = re.split(r"_(.{1,4})_", s)
    result: list[str] = []
    for i, e in enumerate(parts):
        if i % 2 == 0:
            result.extend(e)
        else:
            result.append(e)
    result = [c.replace("\001", "_") for c in result]
    result = [c.replace("\002", "\\") for c in result]
    return result


def gt_implode(symbols: list[str]) -> str:
    """Inverse of gt_explode: symbol list -> transcription string
    (reference ocrolib/common.py:838-849)."""
    out: list[str] = []
    for c in symbols:
        if c == "_":
            out.append("___")
        elif len(c) <= 1:
            out.append(c)
        elif len(c) <= 4:
            out.append("_" + c + "_")
        else:
            raise ValueError(
                f"cannot create ground truth transcription for: {symbols!r}"
            )
    return "".join(out)


def requote(s: str) -> str:
    return re.sub(r"''", '"', str(s))


def requote_fancy(s: str, germanic: bool = False) -> str:
    s = str(s)
    if germanic:
        s = re.sub(r"\s+''", "”", s)
        s = re.sub(r"''\s+", "“", s)
        s = re.sub(r"\s+,,", "„", s)
        s = re.sub(r"\s+'", "’", s)
        s = re.sub(r"'\s+", "‘", s)
        s = re.sub(r"\s+,", "‚", s)
    else:
        s = re.sub(r"\s+''", "“", s)
        s = re.sub(r"''\s+", "”", s)
        s = re.sub(r"\s+,,", "„", s)
        s = re.sub(r"\s+'", "‘", s)
        s = re.sub(r"'\s+", "’", s)
        s = re.sub(r"\s+,", "‚", s)
    return s
