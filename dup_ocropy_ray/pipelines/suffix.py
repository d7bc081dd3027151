"""Distributed SUFFIX ARRAY by prefix doubling — the index behind
exact substring deduplication (Lee et al. 2022 build one over the
whole training corpus; pipelines/dedup.py's windowed-hash span dedup is
the approximation, this is the exact structure).

Shape: O(log n) bulk-synchronous rounds over a (pos, rank) table that
never lands on the driver. Each round h doubles the compared prefix:

    key(pos) = rank(pos) * (n + 1) + rank(pos + h) + 1      (0 if past end)
    rank'    = dense_rank(key)

Round cost: ONE large x large bucket_join (fetch rank at pos+h) + ONE
range sort + two linear passes (the distributed dense rank below). The
driver holds only per-block summary rows (ordered_scan's trick) and the
loop terminates when every rank is distinct — ceil(log2(n)) + 1 rounds.

Dense rank without a vocabulary on the driver: sort by (key, pos) so
block boundaries are unambiguous even with massive ties, emit one
summary row per block (first/last key, distinct-within count), walk the
block chain on the driver carrying the boundary-continuation flag (a
key spanning two blocks must share one rank), broadcast the per-block
base ranks, and add the in-block local dense index in a second pass.

Correctness is pinned by exact equality against a serial numpy
doubling reference and a planted 'banana' fixture; layout invariance
(1 vs 8 input blocks) holds because every step is order-free or
globally sorted.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from .relational import bucket_join
from .windows import ordered_scan

__all__ = ["corpus_tokens", "suffix_array", "suffix_array_ref"]


def _doc_surrogate(arr) -> np.ndarray:
    """int64 doc key for the window machinery: integer ids pass
    through unchanged; any other id type rides a 64-bit string hash.
    A hash collision can only merge two docs' IDENTITY (ordering /
    hit attribution), never window contents — probability ~m^2/2^64
    over m docs, negligible under this module's own 3e9-token cap."""
    a = np.asarray(arr)
    if a.dtype != object and np.issubdtype(a.dtype, np.integer):
        return a.astype(np.int64)
    from ..functions import hashing
    return hashing.hash_strings(
        np.asarray(arr, dtype=object)).astype(np.int64)


def corpus_tokens(docs: rd.Dataset, text_col: str = "text",
                  id_col: str = "doc_id",
                  with_doc: bool = False) -> "tuple[rd.Dataset, int]":
    """(pos, word) token stream of the corpus in (doc_id, token-index)
    order with GLOBAL positions, plus the total token count. Global
    doc offsets come from one ordered_scan prefix sum over doc_id —
    per-block partials + a blocks-sized driver reduce, never a
    corpus-scale driver table. ``with_doc`` adds (doc, lpos, nw): the
    token's int64 surrogate doc key (_doc_surrogate; equals the id for
    integer ids), local word index, and doc word count — the columns
    substring_dedup_exact needs to bound valid window starts and map
    duplicated windows back to documents."""

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        toks = [(t or "").split() for t in b[text_col].fillna("")]
        lens = np.array([len(t) for t in toks], dtype=np.int64)
        n = int(lens.sum())
        if n == 0:
            out = pd.DataFrame({"pos": pd.Series([], dtype="int64"),
                                "word": pd.Series([], dtype=object)})
            if with_doc:
                for c in ("doc", "lpos", "nw"):
                    out[c] = pd.Series([], dtype="int64")
            return out
        words = np.concatenate([np.asarray(t, dtype=object) for t in toks])
        offs = (b["run_n_tokens"].to_numpy(np.int64)
                - lens)  # exclusive prefix = inclusive run - own count
        starts = np.repeat(offs, lens)
        local = (np.arange(n, dtype=np.int64)
                 - np.repeat(np.concatenate(
                     [np.zeros(1, np.int64), np.cumsum(lens)])[:-1], lens))
        out = pd.DataFrame({"pos": starts + local, "word": words})
        if with_doc:
            out["doc"] = np.repeat(b["_sk"].to_numpy(np.int64), lens)
            out["lpos"] = local
            out["nw"] = np.repeat(lens, lens)
        return out

    # carry the text through the scan: ordered_scan preserves columns
    cts = docs.map_batches(
        lambda b: pd.DataFrame({
            "_sk": _doc_surrogate(b[id_col].to_numpy()),
            text_col: b[text_col].fillna(""),
            "n_tokens": b[text_col].fillna("").str.split().map(len)
            .astype(np.int64)}),
        batch_format="pandas")
    scanned = ordered_scan(cts, "_sk",
                           sum_cols=("n_tokens",)).materialize()
    total = int(scanned.max("run_n_tokens") or 0)
    toks = scanned.map_batches(explode, batch_format="pandas",
                               batch_size=2048)
    return toks, total


def _dense_rank(ds: rd.Dataset, key_col: str,
                pos_col: str = "pos") -> "tuple[rd.Dataset, int]":
    """Distributed dense rank (0-based, ties share) of ``key_col``:
    returns ((pos, rank) Dataset, n_distinct). Sort is by (key, pos) so
    equal keys spanning a block boundary are detected by the driver's
    block-chain walk, not mis-ranked."""
    s = ds.sort([key_col, pos_col]).materialize()

    def summary(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({
                "first_key": pd.Series([], dtype=object),
                "last_key": pd.Series([], dtype=object),
                "first_pos": pd.Series([], dtype="int64"),
                "n_distinct": pd.Series([], dtype="int64")})
        k = b[key_col].to_numpy()
        new = np.ones(len(k), bool)
        new[1:] = k[1:] != k[:-1]
        return pd.DataFrame({
            "first_key": [k[0]], "last_key": [k[-1]],
            "first_pos": [np.int64(b[pos_col].iloc[0])],
            "n_distinct": [np.int64(new.sum())]})

    ss = (s.map_batches(summary, batch_format="pandas", batch_size=None)
          .to_pandas())
    ss = ss.sort_values(["first_key", "first_pos"]).reset_index(drop=True)
    bases: dict = {}
    total = 0
    prev_last = None
    for _, row in ss.iterrows():
        continued = (prev_last is not None
                     and row["first_key"] == prev_last)
        base = total - 1 if continued else total
        bases[(row["first_key"], int(row["first_pos"]))] = base
        total += int(row["n_distinct"]) - (1 if continued else 0)
        prev_last = row["last_key"]
    bases_ref = ray.put(bases)

    def apply(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"pos": pd.Series([], dtype="int64"),
                                 "rank": pd.Series([], dtype="int64")})
        k = b[key_col].to_numpy()
        new = np.ones(len(k), np.int64)
        new[1:] = (k[1:] != k[:-1]).astype(np.int64)
        local = np.cumsum(new) - 1
        base = ray.get(bases_ref)[(k[0], int(b[pos_col].iloc[0]))]
        return pd.DataFrame({
            "pos": b[pos_col].astype(np.int64),
            "rank": (base + local).astype(np.int64)})

    ranks = s.map_batches(apply, batch_format="pandas", batch_size=None)
    return ranks, total


_RANK_SCHEMA = pa.schema([("pos", pa.int64()), ("rank", pa.int64())])
_PROBE_SCHEMA = pa.schema([("pos", pa.int64()), ("r2", pa.int64())])


def suffix_array(docs: rd.Dataset, text_col: str = "text",
                 id_col: str = "doc_id",
                 num_partitions: int = 32) -> "tuple[rd.Dataset, int]":
    """Suffix array of the corpus token stream: returns ((pos, rank)
    Dataset — ``rank`` is the suffix's position in lexicographic
    order — and n). Materialized per round to keep lineage flat; the
    loop raises if ranks fail to separate within the doubling bound
    (impossible unless the rank table was corrupted)."""
    toks, n = corpus_tokens(docs, text_col, id_col)
    if n == 0:
        return (rd.from_pandas(pd.DataFrame({
            "pos": pd.Series([], dtype="int64"),
            "rank": pd.Series([], dtype="int64")})), 0)
    ranks, distinct = _dense_rank(toks, "word")
    ranks = ranks.materialize()
    h = 1
    while distinct < n:
        if h > 2 * n:
            raise RuntimeError("suffix_array: prefix doubling failed "
                               "to separate ranks — rank table corrupt")
        ranks, distinct = _doubling_round(ranks, h, n, num_partitions)
        h *= 2
    return ranks, n


def _doubling_round(ranks: rd.Dataset, h: int, n: int,
                    num_partitions: int) -> "tuple[rd.Dataset, int]":
    """One prefix-doubling round: rank-by-h-prefix -> rank-by-2h-prefix
    (ONE large x large bucket_join to fetch rank(pos + h) + one
    distributed dense rank). Returns the materialized new rank table
    and its distinct count."""
    probe = ranks.map_batches(
        lambda b, _h=h: pd.DataFrame({
            "pos": b["pos"].to_numpy(np.int64) - _h,
            "r2": b["rank"].to_numpy(np.int64)}),
        batch_format="pandas")
    j = bucket_join(ranks, probe, "pos", "pos",
                    num_partitions=num_partitions, how="left",
                    left_schema=_RANK_SCHEMA,
                    right_schema=_PROBE_SCHEMA, suffix="_r")

    def mk_key(b: pd.DataFrame, _n=n) -> pd.DataFrame:
        r2 = pd.to_numeric(b["r2"], errors="raise").fillna(-1)
        key = (b["rank"].to_numpy(np.int64) * (_n + 1)
               + r2.to_numpy(np.int64) + 1)
        return pd.DataFrame({"pos": b["pos"].astype(np.int64),
                             "key": key})

    keyed = j.map_batches(mk_key, batch_format="pandas")
    out, distinct = _dense_rank(keyed, "key")
    return out.materialize(), distinct


def prefix_ranks(toks: rd.Dataset, n: int, h_target: int,
                 num_partitions: int = 32) -> rd.Dataset:
    """(pos, rank) where ``rank`` is the dense EQUALITY CLASS of the
    h_target-token substring starting at pos (clipped at corpus end);
    ``h_target`` must be a power of two. This is the suffix-array
    doubling loop STOPPED EARLY — log2(h_target) rounds instead of
    log2(n) — which is all substring_dedup_exact needs: two windows of
    length W share their first h tokens iff their ranks are equal.
    Stops even earlier if ranks separate (then no two h-substrings are
    equal at all)."""
    if h_target & (h_target - 1):
        raise ValueError("prefix_ranks: h_target must be a power of two")
    ranks, distinct = _dense_rank(toks, "word")
    ranks = ranks.materialize()
    h = 1
    while h < h_target and distinct < n:
        ranks, distinct = _doubling_round(ranks, h, n, num_partitions)
        h *= 2
    return ranks


def substring_dedup_exact(
    docs: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    min_docs: int = 2,
    num_partitions: int = 32,
) -> rd.Dataset:
    """EXACT substring-span dedup on the suffix-array machinery (the
    exact path of Lee et al. 2022's deduplication; strip_dup_spans is
    the windowed-HASH approximation of the same transform): drop every
    word covered by a W-word window appearing in >= ``min_docs``
    distinct docs, comparing the ACTUAL TOKENS — no hash collisions —
    via prefix-doubling equality classes, with no gram strings and no
    driver-side corpus state.

    A W-window starting at pos is identified by the pair
    (rank_h(pos), rank_h(pos + W - h)) with h = 2^floor(log2 W): the
    two components cover [pos, pos+h) and [pos+W-h, pos+W), whose
    union is exactly the window, so the pair is equal iff the windows
    are token-for-token equal. Both component ranges lie inside the
    window, so ranks never leak cross-document context even though the
    rank table is built on the unseparated global stream.

    Cost: log2(W) doubling rounds (each one bucket_join + one sort) +
    two window-key joins + one dup groupby + one semi join + one
    doc-keyed strip shuffle. The composed dup key is
    rank1*(n+2)+rank2, exact while (n+2)^2 < 2^63 (~3e9 tokens per
    job); shard the corpus into multiple jobs past that.

    Output contract matches strip_dup_spans: (id_col, clean_text),
    empty docs dropped."""
    from .dedup import _DEDUP_PARTITIONS, _strip_from_hits
    from ..functions import hashing

    from .dedup import _arrow_id_type

    id_type = _arrow_id_type(docs, id_col)
    toks, n = corpus_tokens(docs, text_col, id_col, with_doc=True)
    if n == 0:
        return rd.from_arrow(pa.table({
            id_col: pa.array([], id_type),
            "clean_text": pa.array([], pa.string())}))
    if (n + 2) ** 2 >= 2 ** 63:
        raise ValueError("substring_dedup_exact: corpus too large for "
                         "the composed int64 dup key; shard the job")
    h = 1
    while h * 2 <= window:
        h *= 2
    ranks = prefix_ranks(toks, n, h, num_partitions)

    # valid window starts with their doc mapping
    starts = toks.map_batches(
        lambda b: b.loc[b["lpos"].to_numpy(np.int64) + window
                        <= b["nw"].to_numpy(np.int64),
                        ["pos", "doc", "lpos"]].reset_index(drop=True),
        batch_format="pandas")
    starts_schema = pa.schema([("pos", pa.int64()), ("doc", pa.int64()),
                               ("lpos", pa.int64())])
    j1 = bucket_join(starts, ranks, "pos", "pos",
                     num_partitions=num_partitions, how="inner",
                     left_schema=starts_schema,
                     right_schema=_RANK_SCHEMA, suffix="_r")
    shift = window - h
    probe2 = ranks.map_batches(
        lambda b, _s=shift: pd.DataFrame({
            "pos": b["pos"].to_numpy(np.int64) - _s,
            "r2": b["rank"].to_numpy(np.int64)}),
        batch_format="pandas")
    j2 = bucket_join(
        j1, probe2, "pos", "pos",
        num_partitions=num_partitions, how="inner",
        left_schema=pa.schema(list(starts_schema)
                              + [pa.field("rank", pa.int64())]),
        right_schema=_PROBE_SCHEMA, suffix="_r")

    def mk_wkey(b: pd.DataFrame, _n=n) -> pd.DataFrame:
        key = (b["rank"].to_numpy(np.int64) * (_n + 2)
               + b["r2"].to_numpy(np.int64))
        return pd.DataFrame({"key": key,
                             "doc": b["doc"].to_numpy(np.int64),
                             "lpos": b["lpos"].to_numpy(np.int64)})

    # window-key-scale (24 B/window); pin it so the dup-key groupby and
    # the semi join below share ONE execution of the doubling lineage
    # instead of re-running j1+j2+starts twice (spills past memory)
    wkeys = j2.map_batches(mk_wkey, batch_format="pandas").materialize()

    # duplicated keys: >= min_docs distinct docs (same semantics as the
    # windowed-hash family) on one (key,doc)-distinct partial + one
    # key-hash shuffle
    def kd_part(b: pd.DataFrame) -> pd.DataFrame:
        g = b[["key", "doc"]].drop_duplicates()
        g["_kp"] = (g["key"].to_numpy(np.int64)
                    % np.int64(_DEDUP_PARTITIONS))
        return g

    def kd_fin(g: pd.DataFrame) -> pd.DataFrame:
        nd = g.drop_duplicates().groupby("key", sort=False)["doc"].size()
        return pd.DataFrame({
            "key": nd.index[nd >= min_docs].to_numpy(np.int64)})

    dup_keys = (wkeys.map_batches(kd_part, batch_format="pandas",
                                  batch_size=65536)
                .groupby("_kp").map_groups(kd_fin, batch_format="pandas"))

    hits = bucket_join(
        wkeys, dup_keys, "key", "key",
        num_partitions=num_partitions, how="semi",
        left_schema=pa.schema([("key", pa.int64()), ("doc", pa.int64()),
                               ("lpos", pa.int64())]),
        right_schema=pa.schema([("key", pa.int64())]))

    # doc-keyed strip shuffle: doc text rows (kind 0) + hit rows (kind
    # 1) meet per doc; the strip body is shared with strip_dup_spans
    def doc_rows(b: pd.DataFrame) -> pd.DataFrame:
        texts = b[text_col].fillna("").tolist()
        nwords = np.array([len(t.split()) for t in texts], dtype=np.int64)
        keep = nwords > 0
        nk = int(keep.sum())
        ids = b[id_col].to_numpy()[keep]
        return pd.DataFrame({
            "doc": _doc_surrogate(ids),
            # object dtype: block schemas must match hit_rows' None col
            "orig": pd.Series(ids, dtype=object),
            "text": np.asarray(texts, dtype=object)[keep],
            "lpos": np.full(nk, -1, dtype=np.int64),
            "kind": np.zeros(nk, dtype=np.int8)})

    def hit_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc": b["doc"].to_numpy(np.int64),
            "orig": np.full(len(b), None, dtype=object),
            "text": np.full(len(b), None, dtype=object),
            "lpos": b["lpos"].to_numpy(np.int64),
            "kind": np.ones(len(b), dtype=np.int8)})

    def add_dc(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_dc"] = (hashing.hash_strings(b["doc"].to_numpy(dtype=object))
                    % np.uint64(_DEDUP_PARTITIONS)).astype(np.int64)
        return b

    union = (docs.map_batches(doc_rows, batch_format="pandas",
                              batch_size=4096)
             .union(hits.map_batches(hit_rows, batch_format="pandas"))
             .map_batches(add_dc, batch_format="pandas"))

    def strip_part(g: pd.DataFrame) -> pd.DataFrame:
        dr = g[g["kind"].to_numpy() == 0]
        ids = dr["doc"].to_numpy(np.int64)
        texts = dr["text"].tolist()
        order = pd.Index(ids)
        ver = g[g["kind"].to_numpy() == 1]
        didx = order.get_indexer(ver["doc"].to_numpy(np.int64))
        ok = didx >= 0
        # output carries the ORIGINAL ids (doc is the int64 surrogate)
        out = _strip_from_hits(dr["orig"].to_numpy(), texts, didx[ok],
                               ver["lpos"].to_numpy(np.int64)[ok],
                               window, id_col)
        return out

    return union.groupby("_dc").map_groups(strip_part,
                                           batch_format="pandas")


def suffix_array_ref(words: "list[str]") -> np.ndarray:
    """Serial numpy doubling reference (test oracle): returns the
    suffix array as positions in lexicographic suffix order."""
    n = len(words)
    if n == 0:
        return np.empty(0, np.int64)
    rank = np.unique(np.asarray(words, dtype=object),
                     return_inverse=True)[1].astype(np.int64)
    h = 1
    while len(np.unique(rank)) < n:
        r2 = np.full(n, -1, np.int64)
        r2[: n - h] = rank[h:]
        order = np.lexsort((r2, rank))
        key_sorted = np.stack([rank[order], r2[order]], axis=1)
        new = np.ones(n, np.int64)
        new[1:] = (np.any(key_sorted[1:] != key_sorted[:-1],
                          axis=1)).astype(np.int64)
        newrank = np.empty(n, np.int64)
        newrank[order] = np.cumsum(new) - 1
        rank = newrank
        h *= 2
    sa = np.empty(n, np.int64)
    sa[rank] = np.arange(n, dtype=np.int64)
    return sa
