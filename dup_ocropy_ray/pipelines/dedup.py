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
    (band_id, bucket) later yields candidate groups.

    Fully vectorized per batch: tokens are hashed ONCE for the whole batch
    (hashing.batch_shingle_hashes), per-doc signature minima come from one
    ``np.minimum.reduceat`` per permutation chunk, and band keys fold
    vectorized over the doc axis — no per-doc Python loop."""
    a, b = hashing.minhash_params(num_perm, seed)

    def sig_rows(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        vals, offs = hashing.batch_shingle_hashes(
            batch[text_col].tolist(), shingle_k
        )
        sigs = hashing.batch_minhash_signatures(vals, offs, a, b)
        bandkeys = hashing.batch_minhash_bands(sigs, num_bands)  # (n, B)
        out = pd.DataFrame(
            {
                id_col: np.repeat(batch[id_col].to_numpy(dtype=object),
                                  num_bands),
                "band_id": np.tile(np.arange(num_bands, dtype=np.int64), n),
                "bucket": bandkeys.reshape(-1),
            }
        )
        # coarse shuffle key (see _DEDUP_PARTITIONS): buckets are tiny,
        # so the groupby runs on their hash-partition, not per bucket
        out["_part"] = (
            (out["band_id"].to_numpy(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             + out["bucket"].to_numpy(np.uint64))
            % np.uint64(_DEDUP_PARTITIONS)
        ).astype(np.int64)
        return out

    return ds.map_batches(sig_rows, batch_format="pandas", batch_size=4096)


def minhash_dup_pairs_ds(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    num_bands: int = 32,
    shingle_k: int = 3,
    threshold: float = 0.7,
    seed: int = 1234,
    join_partitions: int = 4,
) -> rd.Dataset:
    """Near-duplicate pairs: LSH candidates -> exact Jaccard verify,
    END-TO-END DISTRIBUTED (returns a Dataset of (doc_a, doc_b, jaccard)).

    Stages (nothing pair- or text-sized ever lands on the driver):
    1. candidate pairs inside each LSH-bucket hash-partition, locally
       deduped;
    2. global pair dedupe: one shuffle on hash(doc_a)^mix(doc_b), exact
       drop_duplicates inside each partition (equal pairs co-locate);
    3. candidate doc ids: pairs explode to id rows, same-shuffle deduped;
    4. shingle-hash sets for CANDIDATE DOCS ONLY: a left_semi hash join
       of the corpus against the id set (no broadcast, no driver state —
       candidates are rare by construction so the join output is small),
       then one vectorized batch-hash pass;
    5. verify: two hash joins attach sh_a / sh_b (sets encoded as raw
       uint64 bytes — acero joins carry binary payloads, not lists) to
       each pair; exact Jaccard via per-pair C-level ``np.intersect1d``
       on sorted-unique uint64 sets; threshold filter.

    ``join_partitions`` sizes the three hash-join exchanges; each join
    spins up that many aggregator actors, so keep partitions*3 within the
    cluster's CPU budget (raise to ~2x executor slots on a real cluster).
    """
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
            dt = g[id_col].dtype
            return pd.DataFrame({"doc_a": pd.Series([], dtype=dt),
                                 "doc_b": pd.Series([], dtype=dt)})
        return pd.DataFrame(rows, columns=["doc_a", "doc_b"]).drop_duplicates()

    raw_pairs = cand.groupby("_part").map_groups(
        partition_pairs, batch_format="pandas"
    )

    # global pair dedupe (a pair can surface from many bands): equal pairs
    # share a partition, so a local drop_duplicates is globally exact
    def tag_pair(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b.assign(_part=pd.Series([], dtype="int64"))
        h = (hashing.hash_strings(b["doc_a"].to_numpy(dtype=object))
             ^ (hashing.hash_strings(b["doc_b"].to_numpy(dtype=object))
                * np.uint64(0x9E3779B97F4A7C15)))
        return b.assign(_part=(h % np.uint64(_DEDUP_PARTITIONS)).astype("int64"))

    pairs = (
        raw_pairs.map_batches(tag_pair, batch_format="pandas")
        .groupby("_part")
        .map_groups(lambda g: g.drop_duplicates(["doc_a", "doc_b"]),
                    batch_format="pandas")
        .drop_columns(["_part"])
    )
    # pairs feed three consumers (id extraction + two joins); materialize
    # the PAIR-SCALE dataset (small by construction — candidate pairs, not
    # corpus) so the full-corpus signature pipeline doesn't re-execute per
    # consumer. Blocks stay in the object store, nothing lands driver-side.
    pairs = pairs.materialize()
    # a corpus with ZERO candidate pairs would hand Ray's hash-join an
    # empty (schema-less) side and fail on FieldRef — and there is nothing
    # to verify anyway; the count is free on the materialized dataset
    if pairs.count() == 0:
        return rd.from_arrow(pa.table({
            "doc_a": pa.array([], pa.string()),
            "doc_b": pa.array([], pa.string()),
            "jaccard": pa.array([], pa.float64()),
        }))

    # candidate doc ids (distinct), as a join side
    def pair_ids(b: pd.DataFrame) -> pd.DataFrame:
        ids = pd.unique(
            np.concatenate([b["doc_a"].to_numpy(dtype=object),
                            b["doc_b"].to_numpy(dtype=object)])
        ) if len(b) else np.array([], dtype=object)
        return pd.DataFrame({id_col: pd.Series(ids, dtype="object")})

    need = pairs.map_batches(pair_ids, batch_format="pandas")

    # shingle-hash sets for candidate docs only (semi-join prune, then one
    # vectorized batch-hash pass); sets ride as list<uint64> columns
    cand_docs = ds.select_columns([id_col, text_col]).join(
        need, join_type="left_semi", num_partitions=join_partitions,
        on=(id_col,),
    )

    # sets ride the joins as raw little-endian uint64 BYTES: acero hash
    # joins carry binary payloads but reject list-typed (or Ray tensor
    # extension) non-key columns
    def to_sets(t: pa.Table) -> pa.Table:
        sets_ = hashing.batch_shingle_sets(
            t.column(text_col).to_pylist(), shingle_k
        )
        # arrow in/out: the id column keeps its real type (string/int64)
        # even for EMPTY batches — a pandas round-trip would infer a
        # null-typed column there and poison the join-side schema
        return pa.table({
            "doc_a": t.column(id_col),
            "sh_a": pa.array([s.tobytes() for s in sets_], pa.binary()),
        })

    # candidate-scale; feeds both join sides (non-empty: pairs imply >= 2
    # candidate docs). The repartition matters beyond balance: Ray's
    # hash-join emits NO-COLUMN empty blocks for empty partitions, and a
    # downstream join partition fed only those fails on FieldRef;
    # repartition concat-normalizes every block to the real schema.
    sets_a = (
        cand_docs.map_batches(to_sets, batch_format="pyarrow")
        .repartition(join_partitions)
        .materialize()
    )
    sets_b = sets_a.map_batches(
        lambda t: t.rename_columns(["doc_b", "sh_b"]),
        batch_format="pyarrow",
    )

    both = pairs.join(
        sets_a, join_type="inner", num_partitions=join_partitions,
        on=("doc_a",),
    ).repartition(join_partitions).join(  # normalize no-column empties
        sets_b, join_type="inner", num_partitions=join_partitions,
        on=("doc_b",),
    )

    def verify(t: pa.Table) -> pa.Table:
        jac = np.empty(t.num_rows, dtype=np.float64)
        for i, (A, B) in enumerate(zip(t.column("sh_a").to_pylist(),
                                       t.column("sh_b").to_pylist())):
            A = np.frombuffer(A or b"", dtype=np.uint64)
            B = np.frombuffer(B or b"", dtype=np.uint64)
            inter = np.intersect1d(A, B, assume_unique=True).size
            union = A.size + B.size - inter
            jac[i] = 1.0 if union == 0 else inter / union
        keep = jac >= threshold
        out = t.select(["doc_a", "doc_b"]).filter(pa.array(keep))
        return out.append_column("jaccard", pa.array(jac[keep], pa.float64()))

    return both.map_batches(verify, batch_format="pyarrow")


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
    """Driver-friendly wrapper over ``minhash_dup_pairs_ds``: only the
    VERIFIED pairs (small) are collected."""
    out = minhash_dup_pairs_ds(
        ds, text_col, id_col, num_perm, num_bands, shingle_k, threshold, seed
    ).to_pandas()
    if out.empty:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


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


def _lsh_candidate_pairs(sigs: np.ndarray, num_bands: int) -> np.ndarray:
    """(m, 2) int index pairs sharing at least one LSH band bucket.
    Vectorized: one lexsort per band over the folded band keys."""
    bands = hashing.batch_minhash_bands(sigs, num_bands)  # (n, B)
    out = []
    n = bands.shape[0]
    for b in range(num_bands):
        keys = bands[:, b]
        order = np.argsort(keys, kind="stable")
        ks = keys[order]
        # bucket boundaries
        starts = np.flatnonzero(np.concatenate([[True], ks[1:] != ks[:-1]]))
        ends = np.concatenate([starts[1:], [n]])
        for s, e in zip(starts, ends):
            if e - s >= 2:
                idx = np.sort(order[s:e])
                iu, ju = np.triu_indices(len(idx), k=1)
                out.append(np.stack([idx[iu], idx[ju]], axis=1))
    if not out:
        return np.empty((0, 2), dtype=np.int64)
    allp = np.concatenate(out)
    return np.unique(allp, axis=0)


def ngram_jaccard_pairs(
    ds: rd.Dataset,
    partition_cols: list[str],
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_group_rows: int = 20_000,
    seed: int = 99,
) -> rd.Dataset:
    """Exact token-set Jaccard over all pairs WITHIN a partition (the
    partition columns bound the quadratic blowup; at 100 TB the partition
    is the co-location unit). SQL-matchable (list_distinct/list_intersect
    in the oracle).

    Groups over ``max_group_rows`` (a skewed key like "en/web" at scale)
    switch from exact all-pairs to a MinHash-LSH PREFILTER (32 perms, 16
    bands of 2 rows: detection prob ~0.99 at J=0.5) with exact Jaccard on
    candidates only — bounded work instead of a silent quadratic blowup;
    the approximation is per-oversized-group and documented here, exact
    results are unchanged for every group under the cap."""
    a_par, b_par = hashing.minhash_params(32, seed)

    def _exact(recs, toks):
        rows = []
        for i in range(len(recs)):
            for j in range(i + 1, len(recs)):
                jac = hashing.jaccard(toks[i], toks[j])
                if jac >= threshold:
                    rows.append((recs[i][0], recs[j][0], round(jac, 6)))
        return rows

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        recs = sorted(zip(g[id_col], g[text_col]))
        toks = [set((t or "").split()) for _, t in recs]
        if len(recs) <= max_group_rows:
            rows = _exact(recs, toks)
        else:
            # LSH prefilter over the SAME whitespace token sets the exact
            # path uses (one hash_strings call over the flattened sets)
            counts = np.array([len(t) for t in toks], dtype=np.int64)
            flat = np.empty(int(counts.sum()), dtype=object)
            pos = 0
            for t in toks:
                for w in t:
                    flat[pos] = w
                    pos += 1
            th = hashing.hash_strings(flat) if len(flat) else np.empty(
                0, np.uint64)
            offs = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
            sigs = hashing.batch_minhash_signatures(th, offs, a_par, b_par)
            cand = _lsh_candidate_pairs(sigs, 16)
            rows = []
            for i, j in cand:
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
    max_group_rows: int = 20_000,
    seed: int = 7,
) -> rd.Dataset:
    """Embedding near-dup: cosine >= threshold over all pairs within a
    partition, one numpy matmul per group.

    Groups over ``max_group_rows`` switch to a random-hyperplane
    (SimHash) LSH prefilter — 16 projections in 4 bands of 4 bits; at
    cos=0.95 the per-bit agreement is ~0.90, so detection prob is ~0.985
    — with exact cosine verified on candidates only. Exact results are
    unchanged for every group under the cap."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        M = np.stack([np.asarray(v, dtype=np.float64) for v in g[vec_col]])
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0] = 1.0
        Mn = M / norms[:, None]
        n = len(ids)
        if n <= max_group_rows:
            S = Mn @ Mn.T
            iu, ju = np.triu_indices(n, k=1)
            sel = S[iu, ju] >= threshold
            iu, ju, cos = iu[sel], ju[sel], S[iu, ju][sel]
        else:
            rng = np.random.default_rng(seed)
            H = rng.standard_normal((Mn.shape[1], 16))
            bits = (Mn @ H) > 0  # (n, 16)
            # fold each 4-bit band into a bucket key
            weights = (1 << np.arange(4)).astype(np.int64)
            iu_l, ju_l = [], []
            for band in range(4):
                keys = bits[:, band * 4:(band + 1) * 4] @ weights
                order = np.argsort(keys, kind="stable")
                ks = keys[order]
                starts = np.flatnonzero(
                    np.concatenate([[True], ks[1:] != ks[:-1]]))
                ends = np.concatenate([starts[1:], [n]])
                for s, e in zip(starts, ends):
                    if e - s < 2:
                        continue
                    idx = np.sort(order[s:e])
                    a, b = np.triu_indices(len(idx), k=1)
                    iu_l.append(idx[a])
                    ju_l.append(idx[b])
            if iu_l:
                iu = np.concatenate(iu_l)
                ju = np.concatenate(ju_l)
                packed = np.unique(iu.astype(np.int64) * n + ju)
                iu, ju = packed // n, packed % n
                cos = np.einsum("ij,ij->i", Mn[iu], Mn[ju])
                sel = cos >= threshold
                iu, ju, cos = iu[sel], ju[sel], cos[sel]
            else:
                iu = ju = np.array([], dtype=np.int64)
                cos = np.array([], dtype=np.float64)
        return pd.DataFrame(
            {
                "id_a": ids[iu],
                "id_b": ids[ju],
                "cosine": np.round(cos, 6),
            }
        )

    return ds.groupby(partition_col).map_groups(pairs, batch_format="pandas")
