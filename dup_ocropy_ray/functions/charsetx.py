"""Charset detection + decoding for crawled HTML payloads.

Real crawls are mixed-encoding; a wrong decode silently corrupts every
downstream text operator.  Detection precedence (WHATWG encoding-sniff
order, simplified):

  1. byte-order mark (UTF-8 / UTF-16LE / UTF-16BE / UTF-32LE / UTF-32BE);
  2. ``charset=`` in the transport Content-Type header;
  3. ``<meta charset=...>`` / ``http-equiv`` declaration in the first
     1024 bytes (ASCII-superset scan, per the spec's prescan);
  4. strict UTF-8 attempt;
  5. latin-1 (never fails; the byte-preserving last resort).

Pure scalar kernel: bytes in, (text, encoding-name) out.
"""

from __future__ import annotations

import re

_BOMS = (
    (b"\x00\x00\xfe\xff", "utf-32-be"),
    (b"\xff\xfe\x00\x00", "utf-32-le"),
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
)

_CT_CHARSET_RE = re.compile(r"charset\s*=\s*[\"']?([\w.:-]+)", re.I)
_META_RE = re.compile(
    rb"<meta[^>]+charset\s*=\s*[\"']?([\w.:-]+)", re.I)

# canonical names for the encodings we emit/accept
_ALIASES = {
    "utf8": "utf-8", "utf-8": "utf-8", "utf-8-sig": "utf-8-sig",
    "utf-16le": "utf-16-le", "utf-16-le": "utf-16-le",
    "utf-16be": "utf-16-be", "utf-16-be": "utf-16-be",
    "utf-32le": "utf-32-le", "utf-32-le": "utf-32-le",
    "utf-32be": "utf-32-be", "utf-32-be": "utf-32-be",
    "latin-1": "latin-1", "latin1": "latin-1", "iso-8859-1": "latin-1",
    "us-ascii": "utf-8", "ascii": "utf-8",
}


def canonical(name: str | None) -> str | None:
    if not name:
        return None
    return _ALIASES.get(name.strip().lower(), name.strip().lower())


def sniff_bom(data: bytes) -> str | None:
    for bom, enc in _BOMS:
        if data.startswith(bom):
            return enc
    return None


def charset_from_content_type(value: str | None) -> str | None:
    if not value:
        return None
    m = _CT_CHARSET_RE.search(value)
    return canonical(m.group(1)) if m else None


def charset_from_meta(data: bytes, limit: int = 1024) -> str | None:
    m = _META_RE.search(data[:limit])
    if not m:
        return None
    return canonical(m.group(1).decode("ascii", "replace"))


def decode_html(data: bytes, content_type: str | None = None
                ) -> tuple[str, str]:
    """Decode an HTML payload, returning (text, detected-encoding).
    Never raises: undecodable bytes fall through to latin-1."""
    if not data:
        return "", "utf-8"
    body = data
    enc = sniff_bom(data)
    if enc is not None and enc != "utf-8-sig":
        # the -le/-be codecs do NOT consume a BOM (it would decode as a
        # spurious U+FEFF); utf-8-sig strips its own
        for bom, name in _BOMS:
            if name == enc:
                body = data[len(bom):]
                break
    if enc is None:
        enc = charset_from_content_type(content_type)
    if enc is None:
        enc = charset_from_meta(data)
    if enc is not None:
        try:
            return body.decode(enc), ("utf-8" if enc == "utf-8-sig" else enc)
        except (UnicodeDecodeError, LookupError):
            pass  # a lying BOM/header/meta falls through to the sniffers
    try:
        return data.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        return data.decode("latin-1"), "latin-1"
