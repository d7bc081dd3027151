"""Uncompressed AVI codec, from scratch (RIFF chunk walk — the sibling
of functions/wav.py). Raw-DIB AVI ('00db' frames, BITMAPINFOHEADER,
bottom-up BGR rows with 4-byte padding) is a real standard container
that needs NO video codec, so the multimodal video stage can decode it
for real; compressed codecs (h264 etc.) remain honestly unsupported.
"""

from __future__ import annotations

import struct

import numpy as np


def _chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) walking a RIFF chunk run."""
    while pos + 8 <= end:
        cid = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)


def encode_avi(frames, fps: int = 10) -> bytes:
    """Gray uint8 frames (n, h, w) or RGB (n, h, w, 3) -> uncompressed
    AVI bytes (one '00db' DIB per frame)."""
    f = np.asarray(frames, dtype=np.uint8)
    if f.ndim == 3:
        f = np.repeat(f[..., None], 3, axis=3)  # gray -> BGR (equal)
    n, h, w, _ = f.shape
    row_bytes = (w * 3 + 3) & ~3
    pad = row_bytes - w * 3

    def dib(frame: np.ndarray) -> bytes:
        bgr = frame[:, :, ::-1]  # RGB -> BGR
        rows = []
        for y in range(h - 1, -1, -1):  # bottom-up
            rows.append(bgr[y].tobytes() + b"\x00" * pad)
        return b"".join(rows)

    frame_blobs = [dib(fr) for fr in f]
    frame_size = row_bytes * h

    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       frame_size, 0, 0, 0, 0)  # BITMAPINFOHEADER, BI_RGB
    strh = (b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0,
            1, fps, 0, n, frame_size, 0, 0, 0) + struct.pack("<hhhh", 0, 0, w, h))
    avih = struct.pack("<IIIIIIIIIIIIII", 1000000 // fps, frame_size * fps,
                       0, 0, n, 0, 1, frame_size, w, h, 0, 0, 0, 0)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi = lst(b"movi", b"".join(chunk(b"00db", b) for b in frame_blobs))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi(data: bytes) -> tuple[np.ndarray, int]:
    """Uncompressed AVI bytes -> (frames uint8 (n, h, w, 3) RGB, fps).
    Raises ValueError on non-AVI, NotImplementedError on compressed
    streams."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    w = h = bits = 0
    fps = 0
    blobs: list[bytes] = []
    compression = 0

    def walk(pos: int, end: int) -> None:
        nonlocal w, h, bits, fps, compression
        for cid, start, size in _chunks(data, pos, end):
            if cid == b"LIST":
                walk(start + 4, start + size)
            elif cid == b"strf" and size >= 40:
                (_, w_, h_, _, bits_, comp) = struct.unpack(
                    "<IiiHHI", data[start:start + 20])
                w, h, bits, compression = w_, abs(h_), bits_, comp
            elif cid == b"strh" and size >= 32:
                scale, rate = struct.unpack("<II", data[start + 20:start + 28])
                if scale:
                    fps = rate // scale
            elif cid in (b"00db", b"00dc"):
                blobs.append(data[start:start + size])

    walk(12, len(data))
    if compression != 0:
        raise NotImplementedError(f"compressed AVI (biCompression={compression})")
    if not blobs or not w or not h or bits != 24:
        raise ValueError("no decodable uncompressed 24-bit frames")
    row_bytes = (w * 3 + 3) & ~3
    frames = []
    for b in blobs:
        if len(b) < row_bytes * h:
            raise ValueError("truncated frame")
        a = np.frombuffer(b[: row_bytes * h], dtype=np.uint8)
        a = a.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
        frames.append(a[::-1, :, ::-1])  # bottom-up BGR -> top-down RGB
    return np.stack(frames), fps
