"""Deterministic hashing / sketching kernels for the dedup + fingerprint
operators (MinHash, SimHash, rolling-hash fingerprints, shingling).

Everything here is seed-deterministic and process-stable (no Python
``hash()``), so results are reproducible across Ray workers — required for
hash-partitioned dedup at scale. Base string hashing uses
``pandas.util.hash_array`` (64-bit SipHash with a fixed key), vectorized
over numpy object arrays.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_MERSENNE61 = (1 << 61) - 1
_TOKEN_RE = re.compile(r"\w+", re.UNICODE)


def hash_strings(values) -> np.ndarray:
    """Stable 64-bit hash of an array-like of strings -> uint64 ndarray."""
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, categorize=False)


def tokens(text: str) -> list[str]:
    return _TOKEN_RE.findall(text.lower())


def word_shingles(text: str, k: int = 3) -> list[str]:
    """k-word shingles of the lowercased token stream."""
    toks = tokens(text)
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def char_ngrams(text: str, n: int = 5) -> list[str]:
    s = re.sub(r"\s+", " ", text.lower()).strip()
    if len(s) < n:
        return [s] if s else []
    return [s[i : i + n] for i in range(len(s) - n + 1)]


def minhash_params(num_perm: int, seed: int = 1234) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) parameter vectors for the universal-hash family
    h_i(x) = (a_i * x + b_i) mod p, p = 2^61 - 1."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE61, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE61, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature (uint64, len = num_perm) of a set of base hashes."""
    if len(shingle_hashes) == 0:
        return np.full(len(a), np.uint64(_MERSENNE61), dtype=np.uint64)
    x = (shingle_hashes % _MERSENNE61).astype(np.uint64)
    # (k, n) = a[:,None]*x[None,:] + b ; uint64 wraparound then mod p.
    # Use python-int matmul free approach: do it in object-free uint64 with
    # 128-bit emulation via splitting. Simpler: compute in float-safe chunks
    # with np.uint64 wraparound — the wrapped product is still a
    # deterministic universal-enough mix; take mod p afterwards.
    with np.errstate(over="ignore"):
        prod = a[:, None] * x[None, :]  # wraps mod 2^64, deterministic
        sig = (prod + b[:, None]) % np.uint64(_MERSENNE61)
    return sig.min(axis=1)


def minhash_bands(sig: np.ndarray, num_bands: int) -> np.ndarray:
    """Collapse a signature into per-band uint64 bucket keys for LSH."""
    num_perm = len(sig)
    rows = num_perm // num_bands
    assert rows * num_bands == num_perm, "num_perm must divide into bands"
    view = sig[: rows * num_bands].reshape(num_bands, rows)
    out = np.zeros(num_bands, dtype=np.uint64)
    mult = np.uint64(0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):
        for r in range(rows):
            out = (out ^ view[:, r]) * mult
    return out


def simhash64(text: str, token_hash_cache: dict | None = None) -> int:
    """64-bit SimHash over tokens weighted by frequency (Charikar 2002)."""
    toks = tokens(text)
    if not toks:
        return 0
    uniq, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
    hs = pd.util.hash_array(uniq, categorize=False)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    votes = ((2 * bits - 1) * counts[:, None]).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def hamming64(a: int, b: int) -> int:
    return bin(int(a) ^ int(b)).count("1")


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / float(len(a) + len(b) - inter)


def rolling_fingerprints(text: str, window: int = 8, keep_mod: int = 16) -> np.ndarray:
    """Winnowing-style document fingerprint: Rabin-Karp rolling hash over a
    character window, keeping hashes ≡ 0 (mod keep_mod) (Schleimer et al.,
    SIGMOD 2003). Returns sorted unique uint64 fingerprints."""
    s = re.sub(r"\s+", " ", text.lower()).strip()
    if len(s) < window:
        return np.array([], dtype=np.uint64)
    codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    base = 1000003
    powers = np.array(
        [pow(base, window - 1 - j, 1 << 64) for j in range(window)], dtype=np.uint64
    )
    n = len(codes) - window + 1
    # vectorized rolling hash: sum(codes[i+j] * base^(window-1-j)) mod 2^64
    acc = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(window):
            acc += codes[j : j + n] * powers[j]
    sel = acc[(acc % np.uint64(keep_mod)) == 0]
    return np.unique(sel)
