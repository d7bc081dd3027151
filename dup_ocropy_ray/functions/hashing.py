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


_MINHASH_EMPTY = np.uint64(0xFFFFFFFFFFFFFFFF)


def minhash_params(num_perm: int, seed: int = 1234) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) parameter vectors for the multiply-shift hash family
    h_i(x) = (a_i * x + b_i) mod 2^64 with ODD a_i — a bijection on
    uint64, so min over a set distributes like a random permutation.
    Chosen over (a*x+b) mod (2^61-1): the wraparound product is free
    while the Mersenne modulo was 8x the cost of the whole signature
    kernel (measured: 1.16s vs 0.13s per 33M hashes)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE61, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, _MERSENNE61, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature (uint64, len = num_perm) of a set of base hashes.
    Multiply-shift family (see minhash_params); empty sets get the all-max
    sentinel signature."""
    if len(shingle_hashes) == 0:
        return np.full(len(a), _MINHASH_EMPTY, dtype=np.uint64)
    x = np.asarray(shingle_hashes, dtype=np.uint64)
    with np.errstate(over="ignore"):
        sig = a[:, None] * x[None, :] + b[:, None]  # wraps mod 2^64
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
    # mask to the 64-bit pattern: signatures ride arrow as SIGNED int64,
    # and python's bin() on a negative XOR counts magnitude bits, not
    # two's-complement bits (hamming64(-1, 0) was 1, not 64)
    return bin((int(a) ^ int(b)) & 0xFFFFFFFFFFFFFFFF).count("1")


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


# ------------------------------------------------- batch (vectorized) MinHash

_SHINGLE_POLY_C = np.uint64(0x100000001B3)  # FNV-1a prime; uint64 wraparound


def batch_shingle_hashes(texts, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized k-word shingle hashing for a whole batch of documents.

    Returns ``(hashes, offsets)``: ``hashes`` is one uint64 array holding
    every doc's shingle hashes back-to-back (doc order preserved),
    ``offsets`` is int64 of length ``n_docs + 1`` delimiting each doc's
    segment. A shingle hash is a wraparound polynomial over the k token
    hashes — tokens are hashed ONCE for the whole batch (a single
    ``hash_strings`` call), never per doc, and no shingle strings are
    materialized. Docs with no tokens get zero shingles; docs with
    ``0 < n_tokens < k`` get one shingle over all their tokens (matching
    ``word_shingles`` semantics)."""
    tok_lists = [_TOKEN_RE.findall((t or "").lower()) for t in texts]
    counts = np.array([len(t) for t in tok_lists], dtype=np.int64)
    total = int(counts.sum())
    nsh = np.where(counts == 0, 0, np.maximum(counts - k + 1, 1))
    offsets = np.concatenate([[0], np.cumsum(nsh)]).astype(np.int64)
    if total == 0:
        return np.empty(0, dtype=np.uint64), offsets
    flat = np.empty(total, dtype=object)
    pos = 0
    for t in tok_lists:
        if t:
            flat[pos : pos + len(t)] = t
            pos += len(t)
    th = hash_strings(flat)
    tok_off = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    doc_of = np.repeat(np.arange(len(counts)), counts)
    local = np.arange(total, dtype=np.int64) - tok_off[doc_of]
    # valid start positions for FULL k-shingles (counts < k never qualify:
    # counts - k is negative)
    valid = local <= counts[doc_of] - k
    with np.errstate(over="ignore"):
        acc = th.copy()
        for j in range(1, k):
            nxt = np.zeros(total, dtype=np.uint64)
            nxt[: total - j] = th[j:]
            acc = acc * _SHINGLE_POLY_C + nxt
        vals = acc
        # short docs (0 < n_tokens < k): one shingle = polynomial over all
        # their tokens, planted at the doc's first token position
        for length in range(1, k):
            docs = np.flatnonzero(counts == length)
            if len(docs) == 0:
                continue
            starts = tok_off[docs]
            sacc = th[starts].copy()
            for j in range(1, length):
                sacc = sacc * _SHINGLE_POLY_C + th[starts + j]
            vals = vals.copy() if vals is acc else vals
            vals[starts] = sacc
            valid[starts] = True
    return vals[valid], offsets


def batch_minhash_signatures(
    shingle_hashes: np.ndarray, offsets: np.ndarray, a: np.ndarray,
    b: np.ndarray,
) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signatures from batched shingle
    hashes (``batch_shingle_hashes`` layout). One permutation at a time
    into PREALLOCATED 1-D buffers (hash buffer reused across all perms,
    per-doc minima via ``np.minimum.reduceat`` straight into a column
    buffer) — no per-doc loop and, critically, no multi-MB temporaries:
    the earlier (chunk, total) 2-D layout spent ~20x the kernel time
    first-touching ~60 MB pages per chunk on a worker's first batch.
    Empty docs get the all-max sentinel signature (same as
    ``minhash_signature`` on an empty set)."""
    n_docs = len(offsets) - 1
    num_perm = len(a)
    sigs = np.full((n_docs, num_perm), _MINHASH_EMPTY, dtype=np.uint64)
    total = len(shingle_hashes)
    if total == 0:
        return sigs
    x = np.asarray(shingle_hashes, dtype=np.uint64)
    nsh = np.diff(offsets)
    nonempty = nsh > 0
    starts = offsets[:-1][nonempty]
    buf = np.empty(total, dtype=np.uint64)
    col = np.empty(int(nonempty.sum()), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(num_perm):
            np.multiply(x, a[i], out=buf)  # wraps mod 2^64 (multiply-shift)
            np.add(buf, b[i], out=buf)
            np.minimum.reduceat(buf, starts, out=col)
            sigs[nonempty, i] = col
    return sigs


def batch_minhash_bands(sigs: np.ndarray, num_bands: int) -> np.ndarray:
    """(n_docs, num_bands) uint64 LSH band keys — the vectorized-over-docs
    twin of ``minhash_bands`` (identical per-row fold, so values match)."""
    n_docs, num_perm = sigs.shape
    rows = num_perm // num_bands
    assert rows * num_bands == num_perm, "num_perm must divide into bands"
    view = sigs[:, : rows * num_bands].reshape(n_docs, num_bands, rows)
    out = np.zeros((n_docs, num_bands), dtype=np.uint64)
    mult = np.uint64(0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):
        for r in range(rows):
            out = (out ^ view[:, :, r]) * mult
    return out


def batch_shingle_sets(texts, k: int = 3) -> list[np.ndarray]:
    """Per-doc sorted-unique shingle-hash sets (for exact Jaccard verify),
    sharing ``batch_shingle_hashes``'s one-pass vectorized hashing."""
    vals, offsets = batch_shingle_hashes(texts, k)
    return [np.unique(vals[offsets[i] : offsets[i + 1]])
            for i in range(len(offsets) - 1)]


# ------------------------------------------------ Bloom filter (4-hash)

_BLOOM_K = 4
_B1 = np.uint64(0x9E3779B97F4A7C15)
_B2 = np.uint64(0xBF58476D1CE4E5B9)


def _bloom_indices(ids, m_bits: int) -> list[np.ndarray]:
    """Double-hashing scheme (Kirsch-Mitzenmacher): k bit positions from
    two 64-bit hashes, vectorized over the id array."""
    h1 = hash_strings(ids)
    with np.errstate(over="ignore"):
        h2 = ((h1 ^ _B1) * _B2) | np.uint64(1)
        m = np.uint64(m_bits)
        return [(h1 + np.uint64(k) * h2) % m for k in range(_BLOOM_K)]


def _bloom_indices_u64(h: np.ndarray, m_bits: int) -> list[np.ndarray]:
    """Kirsch-Mitzenmacher bit positions for ALREADY-64-bit keys (e.g.
    window hashes): splitmix64-finalize the key for h1 instead of the
    object-array pandas hash — fully vectorized on uint64, no object
    boxing."""
    x = np.asarray(h, dtype=np.uint64)
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * _B2
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h1 = x ^ (x >> np.uint64(31))
        h2 = ((h1 ^ _B1) * _B2) | np.uint64(1)
        m = np.uint64(m_bits)
        return [(h1 + np.uint64(k) * h2) % m for k in range(_BLOOM_K)]


def bloom_add_u64(bits: np.ndarray, h, m_bits: int) -> None:
    """bloom_add for uint64 key arrays (vectorized double hashing)."""
    for idx in _bloom_indices_u64(h, m_bits):
        np.bitwise_or.at(bits, (idx >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (idx & np.uint64(63)))


def bloom_contains_u64(bits: np.ndarray, h, m_bits: int) -> np.ndarray:
    """bloom_contains for uint64 key arrays (no false negatives)."""
    ok = np.ones(len(np.asarray(h, dtype=np.uint64)), dtype=bool)
    for idx in _bloom_indices_u64(h, m_bits):
        word = bits[(idx >> np.uint64(6)).astype(np.int64)]
        ok &= ((word >> (idx & np.uint64(63))) & np.uint64(1)) != 0
    return ok


def bloom_add(bits: np.ndarray, ids, m_bits: int) -> None:
    """Set membership bits in-place. ``bits`` is a uint64 word array of
    length m_bits // 64."""
    for idx in _bloom_indices(ids, m_bits):
        np.bitwise_or.at(bits, (idx >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (idx & np.uint64(63)))


def bloom_contains(bits: np.ndarray, ids, m_bits: int) -> np.ndarray:
    """Vectorized membership probe -> bool mask (no false negatives)."""
    n = len(np.asarray(ids, dtype=object))
    ok = np.ones(n, dtype=bool)
    for idx in _bloom_indices(ids, m_bits):
        word = bits[(idx >> np.uint64(6)).astype(np.int64)]
        ok &= ((word >> (idx & np.uint64(63))) & np.uint64(1)) != 0
    return ok


# ------------------------------------------------ word-gram windows


def batch_word_grams(texts, window: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized W-word sliding-window gram STRINGS for a batch of docs.

    Returns ``(grams, doc_idx, pos)``: ``grams`` is an object ndarray of
    space-joined W-word windows across all docs (doc order preserved),
    ``doc_idx`` the batch-local doc index of each gram, ``pos`` the
    0-based word position of the window start within its doc. Split is
    plain whitespace (matches SQL ``regexp_split_to_array(trim(text),
    '\\s+')``). Docs with fewer than ``window`` words emit no grams.

    The join is W-1 ``np.char.add`` passes over ONE flat unicode array —
    no per-window Python loop. Memory is the reason the span-dedup
    stages cap their batch size: a U-dtype gram array is ~4 bytes/char.
    """
    tok_lists = [(t or "").split() for t in texts]
    counts = np.array([len(t) for t in tok_lists], dtype=np.int64)
    total = int(counts.sum())
    empty = (np.empty(0, dtype=object), np.empty(0, dtype=np.int64),
             np.empty(0, dtype=np.int64))
    if total == 0 or total < window:
        # no doc can have >= window words only when total < window;
        # otherwise fall through (per-doc validity handles short docs)
        if total < window:
            return empty
    flat = np.empty(total, dtype=object)
    p = 0
    for t in tok_lists:
        if t:
            flat[p : p + len(t)] = t
            p += len(t)
    u = flat.astype("U")  # unicode for vectorized np.char.add
    m = total - window + 1
    gram = u[:m]
    for j in range(1, window):
        gram = np.char.add(np.char.add(gram, " "), u[j : j + m])
    tok_off = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    doc_of = np.repeat(np.arange(len(counts)), counts)
    local = np.arange(total, dtype=np.int64) - tok_off[doc_of]
    valid = local <= counts[doc_of] - window  # full in-doc windows only
    starts = np.flatnonzero(valid[:m] if len(valid) > m else valid)
    starts = starts[starts < m]
    return (gram[starts].astype(object), doc_of[starts], local[starts])


def batch_window_hashes(texts, window: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Hash-only twin of ``batch_word_grams``: one uint64 polynomial
    hash per W-word window (same whitespace split, same window
    positions), with NO gram strings materialized — the scale path for
    the dup-span passes, where gram identity (not text) is all the
    shuffle needs. Tokens are hashed ONCE per batch; the window hash is
    a W-term polynomial fold over the token hashes, so equal windows
    hash equal and 64-bit collisions are the only (negligible)
    divergence from text equality.

    Returns ``(hashes, doc_idx, pos)`` aligned with batch_word_grams."""
    tok_lists = [(t or "").split() for t in texts]
    counts = np.array([len(t) for t in tok_lists], dtype=np.int64)
    total = int(counts.sum())
    empty = (np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64),
             np.empty(0, dtype=np.int64))
    if total < window:
        return empty
    flat = np.empty(total, dtype=object)
    p = 0
    for t in tok_lists:
        if t:
            flat[p : p + len(t)] = t
            p += len(t)
    th = hash_strings(flat)
    m = total - window + 1
    with np.errstate(over="ignore"):
        acc = th[:m].copy()
        for j in range(1, window):
            acc = acc * _SHINGLE_POLY_C + th[j : j + m]
    tok_off = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    doc_of = np.repeat(np.arange(len(counts)), counts)
    local = np.arange(total, dtype=np.int64) - tok_off[doc_of]
    valid = local <= counts[doc_of] - window
    starts = np.flatnonzero(valid)
    starts = starts[starts < m]
    return acc[starts], doc_of[starts], local[starts]
