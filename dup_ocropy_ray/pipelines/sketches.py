"""Mergeable sketches for approximate aggregates at 100 TB scale.

HyperLogLog (Flajolet et al. 2007, with the HLL bias corrections from
Heule et al. 2013's small-range rule): exact ``distinct_users`` needs a
full shuffle of every key; the sketch needs one 2^p-byte register array
per block and an elementwise-max merge — constant traffic regardless of
corpus size, ~0.8% relative error at p=14.

Register update and the leading-zero rank are fully vectorized (the
bit-length is an exact 6-step binary search, not a float log2 — float
rounding near powers of two would mis-rank one value in ~2^40).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from ..functions.hashing import hash_strings

_P = 14
_M = 1 << _P
# alpha_m for m >= 128 (Flajolet et al., Fig. 3)
_ALPHA = 0.7213 / (1 + 1.079 / _M)


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (0 -> 0)."""
    bl = np.zeros(w.shape, dtype=np.int64)
    w = w.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = w >= (np.uint64(1) << np.uint64(shift))
        bl[big] += shift
        w[big] >>= np.uint64(shift)
    bl += (w > 0).astype(np.int64)
    return bl


def hll_update(regs: np.ndarray, values) -> None:
    """Fold a batch of values into a 2^p uint8 register array in place."""
    h = hash_strings(values)
    idx = (h >> np.uint64(64 - _P)).astype(np.int64)
    w = h & np.uint64((1 << (64 - _P)) - 1)
    rank = (64 - _P) - _bit_length_u64(w) + 1  # 1..64-p+1
    np.maximum.at(regs, idx, rank.astype(np.uint8))


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected cardinality estimate with linear-counting fallback
    for the small range."""
    est = _ALPHA * _M * _M / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * _M and zeros:
        return _M * np.log(_M / zeros)
    return float(est)


def approx_distinct_by_key(
    ds: rd.Dataset, key_col: str, value_col: str
) -> pd.DataFrame:
    """Per-key approximate distinct count of ``value_col``. Each batch
    emits one (key, registers) partial per local key; the driver merge
    is elementwise max over (n_keys x n_blocks) 16 KB arrays — the key
    cardinality is assumed SMALL (group-by-category distinct), while the
    value cardinality can be arbitrarily large."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        keys, blobs = [], []
        for k, g in b.groupby(key_col, sort=False):
            regs = np.zeros(_M, dtype=np.uint8)
            hll_update(regs, g[value_col].to_numpy(dtype=object))
            keys.append(k)
            blobs.append(regs.tobytes())
        return pd.DataFrame({key_col: pd.Series(keys, dtype=str),
                             "regs": pd.Series(blobs, dtype=object)})

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536).to_pandas()
    out = []
    for k, g in parts.groupby(key_col, sort=True):
        acc = np.zeros(_M, dtype=np.uint8)
        for blob in g["regs"]:
            np.maximum(acc, np.frombuffer(blob, dtype=np.uint8), out=acc)
        out.append((k, int(round(hll_estimate(acc)))))
    return pd.DataFrame(out, columns=[key_col, "approx_distinct"])


# ------------------------------------------- hash-sampled quantiles


def sampled_quantiles(
    ds: rd.Dataset,
    value_col: str = "value",
    id_col: str = "event_id",
    qs: tuple = (0.1, 0.25, 0.5, 0.75, 0.9),
    rate: float = 0.05,
    seed: int = 99,
) -> pd.DataFrame:
    """Approximate quantiles from a DETERMINISTIC hash sample: a row is
    sampled iff hash(id, seed) < rate * 2^64 — reproducible across
    retries/workers (no RNG state), mergeable by construction (a union
    of per-block samples IS the corpus sample), and one streaming pass
    with O(rate x N) driver data. Expected rank error is
    O(sqrt(q(1-q)/(rate x N))) — at 10^12 rows you'd drop ``rate`` to
    ~1e-6 and keep the same bound per billion. Exact twin:
    ``value_quantiles`` (sparse counting histogram); this is the
    continuous-value / constant-memory path.
    """
    # rate >= 1.0 means "sample everything": clamp to the max uint64
    # (int(rate * 2**64) itself overflows the uint64 constructor there).
    full = rate >= 1.0  # sample everything (h < thr would still drop a
    # row hashing to exactly 2^64-1)
    thr = (np.iinfo(np.uint64).max if full
           else np.uint64(int(rate * float(2**64))))
    salt = str(seed) + "\x1f"

    def sample(b: pd.DataFrame) -> pd.DataFrame:
        h = hash_strings((salt + b[id_col].astype(str)).to_numpy(dtype=object))
        keep = np.ones(len(b), dtype=bool) if full else (h < thr)
        return pd.DataFrame({value_col: b[value_col].to_numpy()[keep]})

    samp = ds.map_batches(sample, batch_format="pandas",
                          batch_size=65536).to_pandas()
    vals = np.sort(samp[value_col].to_numpy(dtype=np.float64))
    if len(vals) == 0:
        return pd.DataFrame({"q": list(qs), "value": [np.nan] * len(qs)})
    idx = np.minimum((np.asarray(qs) * len(vals)).astype(np.int64),
                     len(vals) - 1)
    return pd.DataFrame({"q": list(qs), "value": vals[idx]})


# ------------------------------------------------ Count-Min sketch

_CMS_D = 4
_CMS_SEEDS = np.array([0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9,
                       0x94D049BB133111EB, 0xD6E8FEB86659FD93],
                      dtype=np.uint64)


def cms_update(counts: np.ndarray, values) -> None:
    """Fold values into a (d, w) uint64 Count-Min array in place —
    one vectorized np.add.at per hash row (d=4 double-hashed rows)."""
    d, w = counts.shape
    h = hash_strings(values)
    with np.errstate(over="ignore"):
        for r in range(d):
            idx = ((h ^ _CMS_SEEDS[r]) * _CMS_SEEDS[(r + 1) % _CMS_D]
                   % np.uint64(w)).astype(np.int64)
            np.add.at(counts[r], idx, 1)


def cms_query(counts: np.ndarray, values) -> np.ndarray:
    """Point estimates (>= true count; overshoot ~ N/w per row, min
    over d rows)."""
    d, w = counts.shape
    h = hash_strings(values)
    est = None
    with np.errstate(over="ignore"):
        for r in range(d):
            idx = ((h ^ _CMS_SEEDS[r]) * _CMS_SEEDS[(r + 1) % _CMS_D]
                   % np.uint64(w)).astype(np.int64)
            e = counts[r][idx]
            est = e if est is None else np.minimum(est, e)
    return est.astype(np.int64)


def cms_word_counts(ds: rd.Dataset, probe_words: list, width: int = 8192
                    ) -> pd.DataFrame:
    """Approximate corpus word counts from a MERGEABLE Count-Min sketch:
    each block contributes one (d x width) counter array (CMS is linear,
    so elementwise SUM of partials == sketch of the whole corpus), the
    driver merge is d*width*8 bytes per block regardless of corpus or
    vocabulary size, and the probe estimates are upper bounds within
    ~2N/width w.h.p. The constant-memory companion to heavy_hitters'
    exact two-pass."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        words = (b["text"].fillna("").str.split().explode().dropna()
                 .to_numpy(dtype=object))
        counts = np.zeros((_CMS_D, width), dtype=np.uint64)
        cms_update(counts, words)
        return pd.DataFrame({"sketch": [counts.tobytes()]})

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536).to_pandas()
    acc = np.zeros((_CMS_D, width), dtype=np.uint64)
    for blob in parts["sketch"]:
        acc += np.frombuffer(blob, dtype=np.uint64).reshape(_CMS_D, width)
    return pd.DataFrame({
        "word": probe_words,
        "est_count": cms_query(acc, np.array(probe_words, dtype=object)),
    })


# ------------------------------------------------- KLL quantile sketch


class KLL:
    """KLL streaming quantile sketch (Karnin-Lang-Liberty, FOCS 2016),
    compactor form: level i holds items of weight 2^i; an over-capacity
    level sorts itself and promotes every other element (the parity of
    a per-level compaction counter picks odd/even — deterministic for a
    given insertion/merge sequence, no RNG). Mergeable: level-wise
    concatenation + recompaction, the property that makes it a
    per-block partial for Ray aggregation. Rank error is O(1/k) with
    ~k*log(n/k) stored items."""

    def __init__(self, k: int = 200):
        self.k = int(k)
        self.levels: list[list[float]] = [[]]
        self.parity: list[int] = [0]
        self.n = 0

    def _cap(self, i: int) -> int:
        # geometric capacities, floor 8: top levels get ~k
        h = len(self.levels)
        return max(8, int(self.k * (2.0 / 3.0) ** (h - 1 - i)))

    def _compact(self) -> None:
        while True:
            total = sum(len(lv) for lv in self.levels)
            budget = sum(self._cap(i) for i in range(len(self.levels)))
            if total <= budget:
                return
            for i, lv in enumerate(self.levels):
                if len(lv) > self._cap(i):
                    lv.sort()
                    off = self.parity[i] & 1
                    self.parity[i] += 1
                    promoted = lv[off::2]
                    keep: list[float] = []
                    self.levels[i] = keep
                    if i + 1 == len(self.levels):
                        self.levels.append([])
                        self.parity.append(0)
                    self.levels[i + 1].extend(promoted)
                    break
            else:
                return

    def update(self, values) -> None:
        vs = [float(v) for v in np.asarray(values, dtype=np.float64)]
        self.levels[0].extend(vs)
        self.n += len(vs)
        self._compact()

    def merge(self, other: "KLL") -> None:
        while len(self.levels) < len(other.levels):
            self.levels.append([])
            self.parity.append(0)
        for i, lv in enumerate(other.levels):
            self.levels[i].extend(lv)
        self.n += other.n
        self._compact()

    def to_blob(self) -> bytes:
        import pickle

        return pickle.dumps((self.k, self.n, self.parity, self.levels))

    @classmethod
    def from_blob(cls, blob: bytes) -> "KLL":
        import pickle

        k, n, parity, levels = pickle.loads(blob)
        s = cls(k)
        s.n, s.parity, s.levels = n, parity, levels
        return s

    def quantile(self, q: float) -> float:
        items: list[tuple[float, int]] = []
        for i, lv in enumerate(self.levels):
            w = 1 << i
            items.extend((v, w) for v in lv)
        if not items:
            return float("nan")
        items.sort()
        vals = np.array([v for v, _ in items])
        wts = np.array([w for _, w in items], dtype=np.int64)
        cum = np.cumsum(wts)
        target = q * cum[-1]
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(vals[min(idx, len(vals) - 1)])


def kll_quantiles(ds, val_col: str, qs=(0.01, 0.25, 0.5, 0.75, 0.99),
                  k: int = 200) -> "pd.DataFrame":
    """Distributed quantile estimation by mergeable KLL partials: each
    block builds one sketch (k*log(n/k) floats — never the data), the
    driver merges block sketches in stable order and answers all
    quantiles from the merged summary. The 100 TB path when exact
    per-key quickselect (exact_quantile) is overkill."""
    def part(b: pd.DataFrame) -> pd.DataFrame:
        s = KLL(k)
        s.update(b[val_col].to_numpy(np.float64))
        return pd.DataFrame({"blob": [s.to_blob()],
                             "k0": [np.int64(b.index[0]) if len(b)
                                    else np.int64(0)]})

    parts = ds.map_batches(part, batch_format="pandas",
                           batch_size=65536).to_pandas().sort_values("k0")
    agg = KLL(k)
    for blob in parts["blob"]:
        agg.merge(KLL.from_blob(blob))
    return pd.DataFrame({"q": list(qs),
                         "value": [agg.quantile(q) for q in qs],
                         "n": np.int64(agg.n)})


def hll_overlap_by_type(ds, type_col: str = "event_type",
                        val_col: str = "user_id") -> "pd.DataFrame":
    """Audience-OVERLAP estimation by HLL set algebra: one scan builds
    a per-type register array (per-block partials, elementwise-max
    merge — HLL union is lossless, which is the whole trick), then for
    each type pair |A ∩ B| comes from inclusion-exclusion
    est(A) + est(B) - est(max(A_regs, B_regs)). The exact intersection
    rides alongside (per-block (type-pair -> distinct user) partials
    would be quadratic; instead ONE distinct (type, user) combine is
    collected at keys x users scale — small here; at web scale drop
    the exact column and keep the sketches). Returns
    (type_a, type_b, est_a, est_b, est_union, est_inter, exact_inter,
    err_permille)."""
    from .relational import keyed_combine

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t, g in b.groupby(type_col, sort=False):
            regs = np.zeros(_M, dtype=np.uint8)
            hll_update(regs, g[val_col].astype(str).to_numpy(object))
            rows.append((t, regs.tobytes()))
        return pd.DataFrame(rows, columns=["t", "regs"])

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536).to_pandas()
    merged: dict = {}
    for t, blob in zip(parts["t"], parts["regs"]):
        r = np.frombuffer(blob, dtype=np.uint8)
        if t in merged:
            merged[t] = np.maximum(merged[t], r)
        else:
            merged[t] = r.copy()

    def dist(b: pd.DataFrame) -> pd.DataFrame:
        g = b[[type_col, val_col]].drop_duplicates()
        from ..functions.hashing import hash_strings

        t = g[type_col].to_numpy(object)
        return pd.DataFrame({
            "k": pd.Series(
                (hash_strings(t).view(np.int64)
                 * np.int64(31)) ^ g[val_col].to_numpy(np.int64),
                dtype="int64"),
            type_col: t,
            val_col: g[val_col].to_numpy(np.int64),
            "one": np.ones(len(g), dtype=np.int64)})

    pairs_tbl = keyed_combine(
        ds.map_batches(dist, batch_format="pandas"),
        ["k", type_col, val_col], ["one"], "sum", 16).to_pandas()
    users_by_type = {t: set(g[val_col])
                     for t, g in pairs_tbl.groupby(type_col)}

    types = sorted(merged)
    rows = []
    for i, a in enumerate(types):
        for b_ in types[i + 1:]:
            ea = hll_estimate(merged[a])
            eb = hll_estimate(merged[b_])
            eu = hll_estimate(np.maximum(merged[a], merged[b_]))
            ei = max(0.0, ea + eb - eu)
            exact = len(users_by_type[a] & users_by_type[b_])
            err = (abs(ei - exact) / exact * 1000) if exact else 0.0
            rows.append((a, b_, round(ea, 1), round(eb, 1),
                         round(eu, 1), round(ei, 1), exact,
                         int(err)))
    return pd.DataFrame(rows, columns=[
        "type_a", "type_b", "est_a", "est_b", "est_union",
        "est_inter", "exact_inter", "err_permille"])
