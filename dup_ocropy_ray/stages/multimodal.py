"""Multimodal column stages: opaque ``binary`` media + typed metadata.

Images are first-class here (our own PNG codec — decode, resize,
feature-extract are REAL and tested). Audio/video libraries are not in
this environment, so those decoders are STUBS behind import guards with
a deterministic fake mode: the Ray-side plumbing (schema, actor-pool
signature, batch sizing, output layout) is real and tested, and dropping
in a real decoder is a one-function change.

All stages are callable classes for ``map_batches(Cls, concurrency=N)``
actor pools — setup (codec tables, target shapes) happens once per
actor, per-batch work is vectorized where the payload allows. Batches of
large binary payloads should stay SMALL (the caller sets batch_size so
batch x concurrency fits the worker heap; see SURVEY.md §7.4 wide rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import png as _png
from ..functions.imgops import zoom_to

FEATURE_SCHEMA = pa.schema(
    [
        pa.field("media_ref", pa.string()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("mean_lum", pa.float64()),
        pa.field("ink_frac", pa.float64()),
        pa.field("aspect", pa.float64()),
        pa.field("status", pa.string()),
    ]
)


class ImageFeatures:
    """media bytes -> typed feature row (decode + reduce, per image)."""

    def __init__(self, bytes_col: str = "bytes", ref_col: str = "media_ref"):
        self.bytes_col = bytes_col
        self.ref_col = ref_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {k: [] for k in ("media_ref", "width", "height", "mean_lum",
                                "ink_frac", "aspect", "status")}
        for ref, data in zip(
            batch.column(self.ref_col).to_pylist(),
            batch.column(self.bytes_col).to_pylist(),
        ):
            rows["media_ref"].append(ref)
            try:
                g = _png.decode_gray(data)
                h, w = g.shape
                rows["width"].append(w)
                rows["height"].append(h)
                rows["mean_lum"].append(round(float(g.mean()), 6))
                rows["ink_frac"].append(round(float((g < 0.5).mean()), 6))
                rows["aspect"].append(round(w / max(h, 1), 6))
                rows["status"].append("ok")
            except Exception as e:  # malformed payload -> status row, never fail
                rows["width"].append(0)
                rows["height"].append(0)
                rows["mean_lum"].append(0.0)
                rows["ink_frac"].append(0.0)
                rows["aspect"].append(0.0)
                rows["status"].append(f"decode_error: {type(e).__name__}")
        return pa.table(
            {
                "media_ref": pa.array(rows["media_ref"], pa.string()),
                "width": pa.array(rows["width"], pa.int32()),
                "height": pa.array(rows["height"], pa.int32()),
                "mean_lum": pa.array(rows["mean_lum"], pa.float64()),
                "ink_frac": pa.array(rows["ink_frac"], pa.float64()),
                "aspect": pa.array(rows["aspect"], pa.float64()),
                "status": pa.array(rows["status"], pa.string()),
            }
        )


_DHASH_WEIGHTS = np.uint64(1) << np.arange(64, dtype=np.uint64)


def dhash64(gray: np.ndarray) -> int:
    """64-bit difference hash of a grayscale image (float array): shrink
    to 8x9, one bit per horizontal gradient sign; int64-packed (arrow
    has no uint64-friendly pandas path). Shared by the image and video
    near-dup stages."""
    small = zoom_to(gray.astype(np.float32), (8, 9))
    bits = (small[:, 1:] > small[:, :-1]).ravel()
    with np.errstate(over="ignore"):
        h = (bits.astype(np.uint64) * _DHASH_WEIGHTS).sum(dtype=np.uint64)
    return int(np.array(h, np.uint64).astype(np.int64))


class ImageDHash:
    """media bytes -> 64-bit difference hash (dHash, see ``dhash64``).
    Robust to re-encoding/rescaling; pairs within a small Hamming
    distance are near-duplicate images; feed to
    ``dedup.hamming64_dup_pairs``."""

    def __init__(self, bytes_col: str = "bytes", ref_col: str = "media_ref"):
        self.bytes_col = bytes_col
        self.ref_col = ref_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, hashes, status = [], [], []
        for ref, data in zip(
            batch.column(self.ref_col).to_pylist(),
            batch.column(self.bytes_col).to_pylist(),
        ):
            refs.append(ref)
            try:
                hashes.append(dhash64(_png.decode_gray(data)))
                status.append("ok")
            except Exception as e:
                hashes.append(0)
                status.append(f"decode_error: {type(e).__name__}")
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "dhash": pa.array(hashes, pa.int64()),
            "status": pa.array(status, pa.string()),
        })


class ImageResize:
    """media bytes -> thumbnail PNG bytes at a fixed max dimension."""

    def __init__(self, max_dim: int = 128, bytes_col: str = "bytes",
                 out_col: str = "thumb_png"):
        self.max_dim = max_dim
        self.bytes_col = bytes_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        thumbs = []
        for data in batch.column(self.bytes_col).to_pylist():
            try:
                g = _png.decode_gray(data)
                h, w = g.shape
                s = self.max_dim / max(h, w, 1)
                if s < 1.0:
                    g = zoom_to(g, (max(1, int(h * s)), max(1, int(w * s))))
                thumbs.append(_png.encode_gray(g))
            except Exception:
                thumbs.append(None)
        return batch.append_column(self.out_col, pa.array(thumbs, pa.binary()))


class AudioFeatures:
    """Audio bytes -> (duration_s, rms, zcr_per_s, dominant_hz, status).

    PCM WAV decodes FOR REAL via the in-repo RIFF codec
    (functions/wav.py — no external audio lib needed). Compressed
    formats (mp3/ogg/aac) have no codec in this container: with
    fake=True a deterministic byte-level proxy keeps the plumbing
    testable, otherwise such items get a skip-don't-fail status row."""

    def __init__(self, fake: bool = False, bytes_col: str = "bytes"):
        self.fake = fake
        self.bytes_col = bytes_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.wav import wav_features

        durs, rms, zcr, dom, status = [], [], [], [], []
        for data in batch.column(self.bytes_col).to_pylist():
            data = bytes(data or b"")
            if data[:4] == b"RIFF":
                try:
                    f = wav_features(data)
                    durs.append(f["duration_s"])
                    rms.append(f["rms"])
                    zcr.append(f["zcr_per_s"])
                    dom.append(f["dominant_hz"])
                    status.append("ok")
                    continue
                except NotImplementedError as e:
                    durs.append(0.0); rms.append(0.0)
                    zcr.append(0.0); dom.append(0.0)
                    status.append(f"unsupported: {e}")
                    continue
                except Exception as e:
                    durs.append(0.0); rms.append(0.0)
                    zcr.append(0.0); dom.append(0.0)
                    status.append(f"decode_error: {type(e).__name__}")
                    continue
            if self.fake:
                b = np.frombuffer(data, dtype=np.uint8)
                durs.append(round(len(b) / 16000.0, 6))  # fake 16kHz/8-bit
                rms.append(round(float(np.sqrt(np.mean((b / 255.0) ** 2)))
                                 if len(b) else 0.0, 6))
                zcr.append(0.0); dom.append(0.0)
                status.append("fake")
            else:
                durs.append(0.0); rms.append(0.0)
                zcr.append(0.0); dom.append(0.0)
                status.append("unsupported: no codec for non-WAV audio")
        out = batch.append_column("duration_s", pa.array(durs, pa.float64()))
        out = out.append_column("rms", pa.array(rms, pa.float64()))
        out = out.append_column("zcr_per_s", pa.array(zcr, pa.float64()))
        out = out.append_column("dominant_hz", pa.array(dom, pa.float64()))
        return out.append_column("audio_status", pa.array(status, pa.string()))


class VideoFrameSample:
    """Video bytes -> N evenly-sampled frames as PNG thumbnails.

    Uncompressed raw-DIB AVI decodes FOR REAL via the in-repo RIFF
    codec (functions/avi.py); sampled frames are re-encoded as
    grayscale PNGs (functions/png.py). Compressed codecs have no
    decoder in this container: fake mode slices the byte stream into N
    deterministic chunks (plumbing tests), otherwise such items get a
    skip-don't-fail status row. Output layout (list<binary> frames per
    row) is identical across paths."""

    def __init__(self, num_frames: int = 4, fake: bool = False,
                 bytes_col: str = "bytes"):
        self.num_frames = num_frames
        self.fake = fake
        self.bytes_col = bytes_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.avi import decode_avi

        frames_col, nf, fpss, status = [], [], [], []
        for data in batch.column(self.bytes_col).to_pylist():
            data = bytes(data or b"")
            if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
                try:
                    frames, fps = decode_avi(data)
                    n = len(frames)
                    k = min(self.num_frames, n)
                    idx = (np.arange(k) * n) // max(k, 1)
                    thumbs = []
                    for i in idx:
                        gray = frames[i].astype(np.float64).mean(axis=2) / 255.0
                        thumbs.append(_png.encode_gray(gray))
                    frames_col.append(thumbs)
                    nf.append(n)
                    fpss.append(int(fps))
                    status.append("ok")
                except NotImplementedError as e:
                    frames_col.append([]); nf.append(0); fpss.append(0)
                    status.append(f"unsupported: {e}")
                except Exception as e:
                    frames_col.append([]); nf.append(0); fpss.append(0)
                    status.append(f"decode_error: {type(e).__name__}")
                continue
            if self.fake:
                n = self.num_frames
                step = max(1, len(data) // n)
                frames_col.append(
                    [data[i * step: (i + 1) * step] for i in range(n)])
                nf.append(n)
                fpss.append(0)
                status.append("fake")
            else:
                frames_col.append([]); nf.append(0); fpss.append(0)
                status.append("unsupported: no codec for non-AVI video")
        out = batch.append_column(
            "frames", pa.array(frames_col, pa.list_(pa.binary())))
        out = out.append_column("n_frames_total", pa.array(nf, pa.int64()))
        out = out.append_column("fps", pa.array(fpss, pa.int64()))
        return out.append_column("video_status", pa.array(status, pa.string()))
