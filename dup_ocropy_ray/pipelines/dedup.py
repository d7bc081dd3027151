"""Deduplication operators over a text document table — the large-scale
training-data family: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale notes (each documented against its shuffle):
- exact: one groupby on a 64-bit content hash (partials impossible —
  dedup IS the shuffle) with per-group first-by-key.
- minhash-lsh: shingle→signature per batch (vectorized), explode to
  (band, bucket) rows, groupby bands, pairwise only within buckets,
  verify with true Jaccard.
- simhash: signature per batch, bucket by the 4x16-bit band trick,
  verify Hamming distance within buckets.
- ngram-jaccard: partition-scoped all-pairs (key = caller-chosen
  partition columns) inside map_groups — exact, SQL-matchable.
- embedding: cosine all-pairs within label partitions (numpy matmul per
  group).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..functions import hashing

# coarse shuffle fan-out for bucketed dedup ops: the shuffle key is
# hash(bucket) % _DEDUP_PARTITIONS so the all-to-all moves O(partitions)
# groups; the per-bucket work happens vectorized inside each partition.
# At cluster scale raise this to ~4-8x the executor slot count.
_DEDUP_PARTITIONS = 64


# ------------------------------------------------------------------ exact


def exact_dedup(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id"
                ) -> rd.Dataset:
    """Keep the min-id row per distinct text. Hash-partitioned: the
    groupby key is the stable 64-bit content hash, so equal texts
    co-locate; collisions are resolved inside the group by comparing the
    actual text."""

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        h = hashing.hash_strings(batch[text_col].to_numpy(dtype=object))
        # coarse partition of the hash space: equal texts still co-locate,
        # but the shuffle has O(partitions) groups, not O(distinct texts) —
        # the per-group UDF-call overhead is what kills tiny groups
        batch["_part"] = (h % np.uint64(_DEDUP_PARTITIONS)).astype(np.int64)
        return batch

    def first_per_text(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized within the partition: one C-level groupby-head
        return (
            g.sort_values(id_col).groupby(text_col, as_index=False, sort=False).head(1)
        )

    hashed = ds.map_batches(add_part, batch_format="pandas", batch_size=65536)
    out = hashed.groupby("_part").map_groups(first_per_text, batch_format="pandas")
    return out.drop_columns(["_part"])


# ------------------------------------------------------------- minhash LSH


def minhash_candidates(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    num_bands: int = 32,
    shingle_k: int = 3,
    seed: int = 1234,
) -> rd.Dataset:
    """(band_id, bucket, doc_id) rows — the LSH index. One groupby on
    (band_id, bucket) later yields candidate groups."""
    a, b = hashing.minhash_params(num_perm, seed)

    def sig_rows(batch: pd.DataFrame) -> pd.DataFrame:
        ids = []
        bands = []
        buckets = []
        for doc, text in zip(batch[id_col], batch[text_col]):
            sh = hashing.word_shingles(text or "", shingle_k)
            sig = hashing.minhash_signature(
                hashing.hash_strings(sh) if sh else np.array([], np.uint64), a, b
            )
            bk = hashing.minhash_bands(sig, num_bands)
            ids.extend([doc] * num_bands)
            bands.extend(range(num_bands))
            buckets.extend(bk.tolist())
        out = pd.DataFrame({id_col: ids, "band_id": bands, "bucket": buckets})
        # coarse shuffle key (see _DEDUP_PARTITIONS): buckets are tiny,
        # so the groupby runs on their hash-partition, not per bucket
        out["_part"] = (
            (out["band_id"].to_numpy(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             + out["bucket"].to_numpy(np.uint64))
            % np.uint64(_DEDUP_PARTITIONS)
        ).astype(np.int64)
        return out

    return ds.map_batches(sig_rows, batch_format="pandas", batch_size=4096)


def minhash_dedup_pairs(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    num_bands: int = 32,
    shingle_k: int = 3,
    threshold: float = 0.7,
    seed: int = 1234,
) -> pd.DataFrame:
    """Near-duplicate pairs: LSH candidates -> exact Jaccard verify.
    Returns (doc_a, doc_b, jaccard). Candidate verification broadcasts
    only the shingle sets of candidate docs (small by construction)."""
    cand = minhash_candidates(ds, text_col, id_col, num_perm, num_bands,
                              shingle_k, seed)

    def partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        # vectorized C-level groupby inside the partition; the python
        # loop runs only over multi-doc buckets (rare by construction)
        sizes = g.groupby(["band_id", "bucket"])[id_col].nunique()
        multi = set(sizes[sizes >= 2].index)
        if multi:
            for key, sub in g.groupby(["band_id", "bucket"]):
                if key not in multi:
                    continue
                ids = sorted(set(sub[id_col]))
                rows.extend(
                    (x, y) for i, x in enumerate(ids) for y in ids[i + 1 :]
                )
        if not rows:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        return pd.DataFrame(rows, columns=["doc_a", "doc_b"]).drop_duplicates()

    pairs = (
        cand.groupby("_part")
        .map_groups(partition_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    if pairs.empty:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
    # verify: fetch texts of candidate docs only
    need = set(pairs.doc_a) | set(pairs.doc_b)

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch[id_col].isin(need)][[id_col, text_col]]

    texts = ds.map_batches(pick, batch_format="pandas").to_pandas()
    sh = {
        i: set(hashing.word_shingles(t or "", shingle_k))
        for i, t in zip(texts[id_col], texts[text_col])
    }
    jac = [
        hashing.jaccard(sh.get(x, set()), sh.get(y, set()))
        for x, y in zip(pairs.doc_a, pairs.doc_b)
    ]
    pairs = pairs.assign(jaccard=jac)
    return pairs[pairs.jaccard >= threshold].reset_index(drop=True)


# ---------------------------------------------------------------- simhash


def simhash_table(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id"
                  ) -> rd.Dataset:
    """Per-doc 64-bit SimHash plus its 4x16-bit band keys (two signatures
    within Hamming distance 3 share at least one of 4 bands — the
    standard bucketing trick)."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        sims = [hashing.simhash64(t or "") for t in batch[text_col]]
        out = pd.DataFrame({id_col: batch[id_col].values})
        out["simhash"] = np.array(sims, dtype=np.uint64).astype(np.int64)
        for bnd in range(4):
            out[f"band{bnd}"] = [
                (int(s) >> (16 * bnd)) & 0xFFFF for s in sims
            ]
        return out

    return ds.map_batches(f, batch_format="pandas", batch_size=8192)


def simhash_dup_pairs(ds: rd.Dataset, text_col: str = "text",
                      id_col: str = "doc_id", max_hamming: int = 3) -> pd.DataFrame:
    """Near-dup pairs by SimHash banding + Hamming verify. One shuffle:
    per-doc rows explode to 4 (band_id, band_val) rows, partitioned on
    hash(band_id, band_val) % _DEDUP_PARTITIONS; pairs are generated
    vectorized inside each partition (python loop only over multi-doc
    buckets)."""
    tbl = simhash_table(ds, text_col, id_col)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for bnd in range(4):
            frames.append(pd.DataFrame({
                id_col: b[id_col],
                "simhash": b["simhash"],
                "band_id": bnd,
                "band_val": b[f"band{bnd}"],
            }))
        out = pd.concat(frames, ignore_index=True)
        out["_part"] = (
            (out["band_id"].to_numpy(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             + out["band_val"].to_numpy(np.uint64))
            % np.uint64(_DEDUP_PARTITIONS)
        ).astype(np.int64)
        return out

    rows = tbl.map_batches(explode, batch_format="pandas", batch_size=65536)

    def partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        sizes = g.groupby(["band_id", "band_val"])[id_col].nunique()
        multi = set(sizes[sizes >= 2].index)
        if multi:
            for key, sub in g.groupby(["band_id", "band_val"]):
                if key not in multi:
                    continue
                recs = sorted(set(zip(sub[id_col], sub["simhash"])))
                for i in range(len(recs)):
                    for j in range(i + 1, len(recs)):
                        d = hashing.hamming64(recs[i][1], recs[j][1])
                        if d <= max_hamming:
                            out.append((recs[i][0], recs[j][0], d))
        return pd.DataFrame(out, columns=["doc_a", "doc_b", "hamming"])

    allp = rows.groupby("_part").map_groups(
        partition_pairs, batch_format="pandas"
    ).to_pandas()
    if allp.empty:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
    return (
        allp.drop_duplicates(["doc_a", "doc_b"])
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


# ----------------------------------------------------------- ngram jaccard


def ngram_jaccard_pairs(
    ds: rd.Dataset,
    partition_cols: list[str],
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Exact token-set Jaccard over all pairs WITHIN a partition (the
    partition columns bound the quadratic blowup; at 100 TB the partition
    is the co-location unit). SQL-matchable (list_distinct/list_intersect
    in the oracle)."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        recs = sorted(zip(g[id_col], g[text_col]))
        toks = [set((t or "").split()) for _, t in recs]
        rows = []
        for i in range(len(recs)):
            for j in range(i + 1, len(recs)):
                jac = hashing.jaccard(toks[i], toks[j])
                if jac >= threshold:
                    rows.append((recs[i][0], recs[j][0], round(jac, 6)))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])

    return ds.groupby(partition_cols).map_groups(pairs, batch_format="pandas")


# ------------------------------------------------------- embedding cosine


def embedding_dup_pairs(
    ds: rd.Dataset,
    partition_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> rd.Dataset:
    """Embedding near-dup: cosine >= threshold over all pairs within a
    partition, one numpy matmul per group."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        M = np.stack([np.asarray(v, dtype=np.float64) for v in g[vec_col]])
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0] = 1.0
        Mn = M / norms[:, None]
        S = Mn @ Mn.T
        iu, ju = np.triu_indices(len(ids), k=1)
        sel = S[iu, ju] >= threshold
        return pd.DataFrame(
            {
                "id_a": ids[iu[sel]],
                "id_b": ids[ju[sel]],
                "cosine": np.round(S[iu, ju][sel], 6),
            }
        )

    return ds.groupby(partition_col).map_groups(pairs, batch_format="pandas")
