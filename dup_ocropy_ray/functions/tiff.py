"""Minimal from-scratch baseline-TIFF reader (no external imaging libs —
same policy as functions/png.py). Covers the shapes the reference's test
fixtures actually use (reference tests/aim916.tiff, exercised by
run-test:11): single-IFD grayscale/bilevel, strip layout, compression
none (1) or zlib/AdobeDeflate (8), 1- or 8-bit samples, photometric
WhiteIsZero/BlackIsZero. Anything fancier raises — the media stages turn
that into a skip-status row (skip-don't-fail invariant)."""

from __future__ import annotations

import struct
import zlib

import numpy as np

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
              11: 4, 12: 8}


def _read_ifd(data: bytes, bo: str, off: int) -> dict[int, list[int]]:
    n = struct.unpack_from(bo + "H", data, off)[0]
    tags: dict[int, list[int]] = {}
    for i in range(n):
        base = off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(bo + "HHI", data, base)
        size = _TYPE_SIZE.get(typ, 1) * cnt
        if size <= 4:
            voff = base + 8
        else:
            voff = struct.unpack_from(bo + "I", data, base + 8)[0]
        if typ == 3:
            vals = list(struct.unpack_from(bo + f"{cnt}H", data, voff))
        elif typ == 4:
            vals = list(struct.unpack_from(bo + f"{cnt}I", data, voff))
        elif typ == 1:
            vals = list(data[voff:voff + cnt])
        else:  # rationals/ascii: unused here, keep raw offset
            vals = [voff]
        tags[tag] = vals
    return tags


def decode(data: bytes) -> np.ndarray:
    """TIFF bytes -> uint8 2-D gray array (0=black, 255=white)."""
    if data[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF file")
    bo = "<" if data[:2] == b"II" else ">"
    magic, first_ifd = struct.unpack_from(bo + "HI", data, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    t = _read_ifd(data, bo, first_ifd)
    w = t[256][0]
    h = t[257][0]
    bits = t.get(258, [1])[0]
    comp = t.get(259, [1])[0]
    photo = t.get(262, [1])[0]
    spp = t.get(277, [1])[0]
    rows_per_strip = t.get(278, [h])[0]
    offs = t[273]
    cnts = t[279]
    if spp != 1:
        raise ValueError(f"unsupported TIFF samples/pixel {spp}")
    if bits not in (1, 8):
        raise ValueError(f"unsupported TIFF bit depth {bits}")
    if comp not in (1, 8):
        raise ValueError(f"unsupported TIFF compression {comp}")
    predictor = t.get(317, [1])[0]
    if predictor != 1:
        # horizontal differencing would decode to silent garbage
        raise ValueError(f"unsupported TIFF predictor {predictor}")

    stride = (w * bits + 7) // 8
    out = np.empty((h, w), dtype=np.uint8)
    row = 0
    for so, sc in zip(offs, cnts):
        raw = data[so:so + sc]
        if comp == 8:
            raw = zlib.decompress(raw)
        nrows = min(rows_per_strip, h - row)
        buf = np.frombuffer(raw[:nrows * stride], dtype=np.uint8)
        buf = buf.reshape(nrows, stride)
        if bits == 1:
            px = np.unpackbits(buf, axis=1)[:, :w] * np.uint8(255)
        else:
            px = buf[:, :w]
        out[row:row + nrows] = px
        row += nrows
    if photo == 0:  # WhiteIsZero
        out = np.uint8(255) - out
    return out


def decode_gray(data: bytes) -> np.ndarray:
    """TIFF bytes -> float32 [0,1] white-background gray (same contract
    as png.decode_gray)."""
    return decode(data).astype(np.float32) / np.float32(255.0)
