"""PCM WAV codec + audio features, from scratch (RIFF chunk walk, no
audio libraries — the container ships none, but PCM WAV needs none).

Upgrades the multimodal audio stage from a byte-proxy stub to a REAL
decode for the uncompressed common case; compressed formats (mp3/ogg/
aac) remain honestly stubbed behind NotImplementedError in
stages/multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float samples in [-1, 1] (1-D mono or (n, ch)) -> PCM16 WAV."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
    ch = pcm.shape[1]
    data = pcm.tobytes()
    byte_rate = rate * ch * 2
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, rate,
                                   byte_rate, ch * 2, 16)
           + b"data" + struct.pack("<I", len(data)))
    return hdr + data


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes -> (float64 samples in [-1, 1], shape (n, ch);
    sample rate). Walks RIFF chunks (fmt before data, unknown chunks
    skipped); PCM 16-bit signed and 8-bit unsigned supported."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, n = 12, len(data)
    fmt = None
    raw = None
    while pos + 8 <= n:
        cid = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, ch, rate, _, _, bits = fmt
    if audio_fmt != 1:
        raise NotImplementedError(f"compressed WAV (format {audio_fmt})")
    if bits == 16:
        x = np.frombuffer(raw[: len(raw) // 2 * 2], dtype="<i2")
        x = x.astype(np.float64) / 32768.0
    elif bits == 8:
        x = np.frombuffer(raw, dtype=np.uint8)
        x = (x.astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{bits}-bit PCM")
    ch = max(1, ch)
    return x[: len(x) // ch * ch].reshape(-1, ch), rate


def wav_features(data: bytes) -> dict:
    """duration, RMS, zero-crossing rate, dominant frequency (numpy
    rFFT on the mono mix)."""
    x, rate = decode_wav(data)
    mono = x.mean(axis=1)
    n = len(mono)
    if n == 0:
        return {"duration_s": 0.0, "rms": 0.0, "zcr_per_s": 0.0,
                "dominant_hz": 0.0, "sample_rate": rate}
    rms = float(np.sqrt(np.mean(mono ** 2)))
    zc = int(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    spec = np.abs(np.fft.rfft(mono))
    spec[0] = 0.0  # ignore DC
    dom = float(np.argmax(spec) * rate / n) if len(spec) > 1 else 0.0
    return {
        "duration_s": round(n / rate, 6),
        "rms": round(rms, 6),
        "zcr_per_s": round(zc * rate / n, 3),
        "dominant_hz": round(dom, 3),
        "sample_rate": rate,
    }
