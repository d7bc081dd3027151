"""Loader for the reference's uw3-500 real-scan line corpus.

The reference ships 500 real scanned line images + ground truth in
``tests/uw3-500.tgz`` (reference run-rtrain:5-6 untars it and trains
``ocropus-rtrain 'book/*/*.bin.png'``; run-test-ci test_rtrain does the
same with -N 5). This module reads the tarball IN MEMORY with tarfile —
the reference tree stays untouched — decodes each ``*.bin.png`` with our
own PNG codec, pairs it with its ``*.gt.txt``, and exposes a
deterministic train/test split keyed by a stable hash of the line id.

These lines ground the recognizer's correctness in the reference's OWN
data (not our synthetic glyph renderer): tests/test_uw3.py pins a CER
gate on the held-out split and the ``uw3_cer`` query reports per-line
distances through the distributed pipeline.
"""

from __future__ import annotations

import hashlib
import io
import os
import tarfile

import numpy as np

from ..functions import png

DEFAULT_TGZ = "/root/reference/tests/uw3-500.tgz"


def _stable_frac(key: str) -> float:
    """Deterministic uniform [0,1) from a string key (seed-free split)."""
    h = hashlib.sha1(key.encode("utf-8")).digest()
    return int.from_bytes(h[:8], "big") / 2.0**64


def load_uw3(tgz_path: str = DEFAULT_TGZ) -> list[dict]:
    """Read uw3-500.tgz -> list of {line_id, image (float32 white-bg 0/1),
    text}. Sorted by line_id for determinism."""
    out = []
    with tarfile.open(tgz_path, "r:gz") as tf:
        members = {m.name: m for m in tf.getmembers() if m.isfile()}
        for name in sorted(members):
            if not name.endswith(".bin.png"):
                continue
            gt_name = name[: -len(".bin.png")] + ".gt.txt"
            if gt_name not in members:
                continue
            raw = tf.extractfile(members[name]).read()
            gt = tf.extractfile(members[gt_name]).read().decode("utf-8")
            img = png.decode_gray(raw)
            line_id = name[len("book/"):-len(".bin.png")].replace("/", "-")
            out.append({
                "line_id": line_id,
                "image": img.astype(np.float32),
                "text": gt.strip("\n"),
            })
    if not out:
        raise FileNotFoundError(f"no line/gt pairs found in {tgz_path}")
    return out


def load_uw3_cached(tgz_path: str = DEFAULT_TGZ,
                    cache: str | None = None) -> list[dict]:
    """load_uw3 with a /tmp pickle cache — the pure-python PNG decode of
    500 scans costs ~90 s; tests and the trainer share one decode."""
    import pickle

    if cache is None:
        # per-uid path: a shared /tmp name would collide across users
        # (EPERM on sticky-bit replace) and trust another user's pickle
        cache = f"/tmp/uw3_cache_{os.getuid()}.pkl"
    if os.path.exists(cache) and os.path.getmtime(cache) >= os.path.getmtime(
            tgz_path):
        try:
            with open(cache, "rb") as f:
                return pickle.load(f)
        except Exception:
            pass  # corrupt/partial cache: re-decode
    lines = load_uw3(tgz_path)
    tmp = cache + f".tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        pickle.dump(lines, f)
    os.replace(tmp, cache)
    return lines


def split_uw3(lines: list[dict], test_frac: float = 0.2):
    """Deterministic hash split -> (train, test). A line's split never
    depends on the rest of the corpus, so adding lines never moves
    existing ones across the boundary (same rationale as testset_split)."""
    train, test = [], []
    for rec in lines:
        (test if _stable_frac("uw3:" + rec["line_id"]) < test_frac
         else train).append(rec)
    return train, test


def uw3_charset(lines: list[dict]) -> list[str]:
    """Codec charset covering every gt character: [blank, reject] + sorted
    chars (same layout as the fixture model's charset)."""
    chars = set()
    for rec in lines:
        chars.update(rec["text"])
    chars.discard("\n")
    return ["", "~"] + sorted(chars)


def uw3_available(tgz_path: str = DEFAULT_TGZ) -> bool:
    return os.path.exists(tgz_path)
