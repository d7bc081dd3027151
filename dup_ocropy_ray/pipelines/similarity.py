"""Similarity search over an embedding column (list<float>).

- ``knn_brute``: brute-force cosine top-k — per-batch numpy matmul
  against a broadcast query matrix (the baseline; scales linearly and
  parallelizes perfectly).
- ``knn_ivf``: IVF-style two-stage search — coarse centroids (trained
  once on a sample, broadcast), batches probe only the nearest
  ``nprobe`` partitions. The scale path: at 10^12 vectors the centroid
  assignment is the partition key and only matching partitions are read.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data as rd


def _stack(vecs) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in vecs])


def _normalize(M: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(M, axis=1)
    n[n == 0] = 1.0
    return M / n[:, None]


def knn_brute(
    ds: rd.Dataset,
    query: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Top-k by cosine to `query`; ties broken by id. Per-block top-k,
    tiny global merge."""
    q = np.asarray(query, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    qref = ray.put(q)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        # zero-copy local read of the broadcast query per task
        qv = ray.get(qref)
        M = _normalize(_stack(batch[vec_col]))
        cos = M @ qv
        out = pd.DataFrame({id_col: batch[id_col].values, "cos_sim": cos})
        return out.sort_values(
            ["cos_sim", id_col], ascending=[False, True]
        ).head(k)

    # elastic task pool: a fixed 2-actor pool starves a 32-CPU node
    parts = ds.map_batches(score, batch_format="pandas",
                           batch_size=65536).to_pandas()
    out = parts.sort_values(["cos_sim", id_col], ascending=[False, True]).head(k)
    out["cos_sim"] = np.round(out["cos_sim"], 6)
    return out.reset_index(drop=True)


def knn_batch(
    ds: rd.Dataset,
    queries: np.ndarray,
    query_ids: list,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Multi-query brute-force kNN: ONE (batch x queries) matmul per
    block against the broadcast query MATRIX (put once, read zero-copy
    per node), per-(block, query) top-k partials, tiny global merge.
    Returns (qid, vec_id, cos_sim) with k rows per query."""
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    qref = ray.put((Q, list(query_ids)))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        Qm, qids = ray.get(qref)
        M = _normalize(_stack(batch[vec_col]))
        S = M @ Qm.T  # (rows, nq)
        frames = []
        ids = batch[id_col].values
        for j, qid in enumerate(qids):
            part = pd.DataFrame({"qid": qid, id_col: ids, "cos_sim": S[:, j]})
            frames.append(
                part.sort_values(["cos_sim", id_col], ascending=[False, True])
                .head(k)
            )
        return pd.concat(frames, ignore_index=True)

    parts = ds.map_batches(score, batch_format="pandas", batch_size=65536).to_pandas()
    out = (
        parts.sort_values(["qid", "cos_sim", id_col], ascending=[True, False, True])
        .groupby("qid", as_index=False)
        .head(k)
    )
    out["cos_sim"] = np.round(out["cos_sim"], 6)
    return out.reset_index(drop=True)


def train_centroids(ds: rd.Dataset, num_centroids: int = 16, vec_col: str = "embedding",
                    sample: int = 2048, iters: int = 10, seed: int = 0) -> np.ndarray:
    """k-means on a driver-side sample (the IVF coarse quantizer).
    Deterministic in `seed`."""
    take = ds.limit(sample).to_pandas()
    X = _normalize(_stack(take[vec_col]))
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(num_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = (X @ C.T).argmax(axis=1)
        for c in range(len(C)):
            m = X[assign == c]
            if len(m):
                v = m.mean(axis=0)
                C[c] = v / (np.linalg.norm(v) or 1.0)
    return C


def knn_ivf(
    ds: rd.Dataset,
    query: np.ndarray,
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: np.ndarray | None = None,
) -> pd.DataFrame:
    """IVF search: score only vectors whose nearest centroid is among the
    query's nprobe closest. Exactness degrades gracefully with nprobe;
    nprobe == num_centroids reduces to brute force."""
    if centroids is None:
        centroids = train_centroids(ds, num_centroids, vec_col)
    q = np.asarray(query, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    probe = set(np.argsort(-(centroids @ q))[:nprobe].tolist())
    cref = ray.put((centroids, q, probe))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        C, q, probe = ray.get(cref)  # zero-copy local read per task
        M = _normalize(_stack(batch[vec_col]))
        assign = (M @ C.T).argmax(axis=1)
        mask = np.isin(assign, list(probe))
        if not mask.any():
            return pd.DataFrame({id_col: [], "cos_sim": []})
        cos = M[mask] @ q
        out = pd.DataFrame(
            {id_col: batch[id_col].values[mask], "cos_sim": cos}
        )
        return out.sort_values(
            ["cos_sim", id_col], ascending=[False, True]
        ).head(k)

    # elastic task pool: a fixed 2-actor pool starves a 32-CPU node
    parts = ds.map_batches(score, batch_format="pandas",
                           batch_size=65536).to_pandas()
    out = parts.sort_values(["cos_sim", id_col], ascending=[False, True]).head(k)
    out["cos_sim"] = np.round(out["cos_sim"], 6)
    return out.reset_index(drop=True)


def kmeans_fit(
    ds: rd.Dataset,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 5,
    seed: int = 0,
) -> np.ndarray:
    """Distributed Lloyd k-means on unit-normalized vectors (spherical
    k-means): every iteration is ONE streaming pass — each batch emits k
    partial rows (per-cluster vector sum + count), the driver reduces
    the tiny partials and re-broadcasts centroids via ``ray.put``. No
    shuffle; the only driver-side data is k x dim. Init = the k
    smallest-``id_col`` vectors (deterministic; seeded subsample would
    also do). At 100 TB you would ``materialize()`` (or persist) the
    input once so iterations re-read blocks from the object store
    instead of storage."""
    if id_col:
        # k smallest-id rows WITHOUT a global sort: per-block prune +
        # tiny driver merge (the full Sort shuffle was ~25% of
        # semantic_dedup's wall at sf0.1)
        from .relational import topk

        init = topk(ds, id_col, k, ascending=True)
    else:
        init = ds.limit(k).to_pandas()
    C = _normalize(_stack(init[vec_col]))
    k = len(C)

    for _ in range(iters):
        cref = ray.put(C)

        def partial(batch: pd.DataFrame, _cref=cref) -> pd.DataFrame:
            Ci = ray.get(_cref)
            X = _normalize(_stack(batch[vec_col]))
            a = (X @ Ci.T).argmax(axis=1)
            sums = np.zeros_like(Ci)
            np.add.at(sums, a, X)
            counts = np.bincount(a, minlength=len(Ci)).astype(np.int64)
            return pd.DataFrame(
                {
                    "cluster": np.arange(len(Ci)),
                    "vsum": list(sums),
                    "count": counts,
                }
            )

        parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
        sums = np.zeros_like(C)
        counts = np.zeros(k, dtype=np.int64)
        for _, r in parts.iterrows():
            sums[int(r["cluster"])] += np.asarray(r["vsum"])
            counts[int(r["cluster"])] += int(r["count"])
        nz = counts > 0
        C[nz] = _normalize(sums[nz] / counts[nz, None])
    return C


def kmeans_assign(
    ds: rd.Dataset,
    centroids: np.ndarray,
    vec_col: str = "embedding",
) -> rd.Dataset:
    """Attach a ``cluster`` column: nearest (cosine) centroid per row.
    Centroids are a ``ray.put`` broadcast read once per task."""
    cref = ray.put(np.asarray(centroids))

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        Ci = ray.get(cref)
        X = _normalize(_stack(batch[vec_col]))
        sim = X @ Ci.T
        batch = batch.copy()
        batch["cluster"] = sim.argmax(axis=1).astype(np.int64)
        batch["centroid_sim"] = np.round(sim.max(axis=1), 6)
        return batch

    return ds.map_batches(assign, batch_format="pandas")


def centroid_outliers(
    ds: rd.Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    k: int = 5,
) -> pd.DataFrame:
    """Per-label embedding outliers: cosine similarity of each vector to
    its OWN label's mean centroid, k lowest per label. The scale shape
    is two streaming passes, no shuffle: pass 1 reduces per-batch
    (label, vector-sum, count) partials to driver-tiny k x dim
    centroids; pass 2 scores each batch against the broadcast centroid
    matrix and keeps a per-batch top-k, merged small on the driver.
    Ties break by id ascending (matches the oracle's ORDER BY)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        X = _stack(batch[vec_col]).astype(np.float64)
        labels, inv = np.unique(batch[label_col].to_numpy(), return_inverse=True)
        sums = np.zeros((len(labels), X.shape[1]))
        np.add.at(sums, inv, X)
        counts = np.bincount(inv, minlength=len(labels)).astype(np.int64)
        return pd.DataFrame({
            "label": labels, "vsum": list(sums), "count": counts})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    acc: dict = {}
    for _, r in parts.iterrows():
        s, c = acc.get(r["label"], (0.0, 0))
        acc[r["label"]] = (s + np.asarray(r["vsum"]), c + int(r["count"]))
    labels = sorted(acc)
    C = np.stack([acc[l][0] / acc[l][1] for l in labels])
    lab_idx = {l: i for i, l in enumerate(labels)}
    cref = ray.put((C, lab_idx))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        Ci, idx = ray.get(cref)
        X = _stack(batch[vec_col]).astype(np.float64)
        li = np.array([idx[l] for l in batch[label_col].to_numpy()])
        cent = Ci[li]
        num = np.einsum("ij,ij->i", X, cent)
        sim = num / (np.linalg.norm(X, axis=1) * np.linalg.norm(cent, axis=1))
        out = pd.DataFrame({
            "label": batch[label_col].to_numpy(),
            id_col: batch[id_col].to_numpy(),
            "cos_sim": np.round(sim, 6),
        })
        # per-batch prune: k lowest per label (exact — merge re-prunes)
        return (out.sort_values(["label", "cos_sim", id_col])
                   .groupby("label", sort=False).head(k))

    pruned = ds.map_batches(score, batch_format="pandas").to_pandas()
    out = (pruned.sort_values(["label", "cos_sim", id_col])
                 .groupby("label", sort=False).head(k)
                 .reset_index(drop=True))
    out[id_col] = out[id_col].astype("int64")
    return out


def semantic_dedup(
    ds: rd.Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.95,
) -> rd.Dataset:
    """SemDeDup-shaped semantic dedup (Abbas et al. 2023): cluster
    embeddings with the distributed k-means, find cosine near-dup pairs
    WITHIN each cluster only (the trick that bounds the pair search),
    collapse pairs to connected components, keep the min-id
    representative per component. Output: (vec_id, cluster_id, kept).

    Composition of existing scale-safe stages: kmeans_fit (streaming
    partial-sum passes) -> kmeans_assign (broadcast centroids) ->
    embedding_dup_pairs (per-cluster matmul, LSH prefilter on oversized
    clusters) -> connected_components (delta-frontier label
    propagation) -> keep_best(emit_all) (two metadata-scale bucket
    shuffles; min-id representative via constant score). No driver or
    ray.put copy of the dup-label map — dup membership at web scale can
    be a double-digit percentage of the corpus, far past broadcast
    comfort (keep_best's own rationale). Near-dups straddling a k-means
    boundary are missed by construction — SemDeDup's documented
    approximation."""
    from .dedup import connected_components, embedding_dup_pairs, keep_best

    C = kmeans_fit(ds, k=k, vec_col=vec_col, id_col=id_col, iters=iters)
    assigned = kmeans_assign(ds, C, vec_col=vec_col)
    pairs = embedding_dup_pairs(
        assigned, partition_col="cluster", vec_col=vec_col,
        id_col=id_col, threshold=threshold)
    comp = connected_components(pairs, a_col="id_a", b_col="id_b")
    labels = comp.map_batches(
        lambda b: pd.DataFrame({"doc_id": b[b.columns[0]].astype("int64"),
                                "cluster_id": b["cluster_id"].astype("int64")}),
        batch_format="pandas")

    # constant score -> ties break on min id (SemDeDup's representative)
    scored = ds.map_batches(
        lambda b: pd.DataFrame({id_col: b[id_col].astype("int64"),
                                "score": np.zeros(len(b))}),
        batch_format="pandas")
    marked = keep_best(scored, labels, id_col=id_col, score_col="score",
                       emit_all=True)
    return marked.map_batches(
        lambda b: pd.DataFrame({id_col: b["doc_id"].astype("int64"),
                                "component_id": b["cluster_id"].astype("int64"),
                                "kept": b["kept"].astype(bool)}),
        batch_format="pandas")


# ---------------------------------------------- product quantization


def pq_train(ds: rd.Dataset, m: int = 8, n_codes: int = 32,
             vec_col: str = "embedding", sample: int = 2048,
             iters: int = 10, seed: int = 0) -> np.ndarray:
    """Product-quantizer codebooks (Jegou et al., TPAMI'11 shape) on a
    driver-side sample: the unit-normalized vector splits into ``m``
    subspaces, each learning ``n_codes`` centroids by Euclidean k-means.
    Driver state is the constant (m, n_codes, dim/m) codebook — the
    compressed index itself stays distributed (pq_encode)."""
    take = ds.limit(sample).to_pandas()
    X = _normalize(_stack(take[vec_col]))
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    rng = np.random.default_rng(seed)
    books = np.zeros((m, n_codes, sub), dtype=np.float64)
    for s in range(m):
        Xs = np.ascontiguousarray(X[:, s * sub:(s + 1) * sub])
        kk = min(n_codes, len(Xs))
        C = Xs[rng.choice(len(Xs), size=kk, replace=False)].copy()
        for _ in range(iters):
            d2 = (-2.0 * (Xs @ C.T)
                  + (C * C).sum(axis=1)[None, :])  # |x|^2 constant/row
            a = d2.argmin(axis=1)
            for c in range(kk):
                msk = a == c
                if msk.any():
                    C[c] = Xs[msk].mean(axis=0)
        books[s, :kk] = C
        if kk < n_codes:
            books[s, kk:] = C[0]  # pad: duplicate codes are harmless
    return books


def pq_encode(ds: rd.Dataset, books: np.ndarray,
              vec_col: str = "embedding", id_col: str = "vec_id"
              ) -> rd.Dataset:
    """Compress every vector to ``m`` uint8 codes (nearest codebook
    entry per subspace) — the 100 TB memory lever: 64-dim float64 rows
    shrink 64x to an (id, codes) table that stays distributed. Raw
    vectors are dropped here; re-ranking against them is a second pass
    over only the candidate ids."""
    bref = ray.put(np.asarray(books))

    def enc(b: pd.DataFrame) -> pd.DataFrame:
        B = ray.get(bref)
        mm, _nc, sub = B.shape
        X = _normalize(_stack(b[vec_col]))
        codes = np.empty((len(X), mm), dtype=np.uint8)
        for s in range(mm):
            Xs = X[:, s * sub:(s + 1) * sub]
            d2 = -2.0 * (Xs @ B[s].T) + (B[s] * B[s]).sum(axis=1)[None, :]
            codes[:, s] = d2.argmin(axis=1).astype(np.uint8)
        return pd.DataFrame({id_col: b[id_col].to_numpy(),
                             "pq_codes": list(codes)})

    return ds.map_batches(enc, batch_format="pandas", batch_size=65536)


def knn_pq(ds: rd.Dataset, query: np.ndarray, k: int = 10, m: int = 8,
           n_codes: int = 32, vec_col: str = "embedding",
           id_col: str = "vec_id", books: np.ndarray | None = None
           ) -> pd.DataFrame:
    """Asymmetric-distance (ADC) top-k over the PQ-compressed index:
    the query precomputes an (m, n_codes) dot-product table, each block
    scores rows by m table lookups + a sum (no float vector reads),
    per-block top-k partials merge on the driver. Approximate —
    pq_exact_roundtrip-style losslessness holds when every subvector is
    representable; tests pin recall against knn_brute."""
    if books is None:
        books = pq_train(ds, m=m, n_codes=n_codes, vec_col=vec_col)
    q = np.asarray(query, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    mm, _nc, sub = books.shape
    T = np.stack([books[s] @ q[s * sub:(s + 1) * sub]
                  for s in range(mm)])  # (m, n_codes)
    tref = ray.put(T)
    codes = pq_encode(ds, books, vec_col=vec_col, id_col=id_col)

    def score(b: pd.DataFrame) -> pd.DataFrame:
        Tt = ray.get(tref)
        C = np.stack(b["pq_codes"].to_numpy())  # (rows, m)
        sim = Tt[np.arange(Tt.shape[0])[None, :], C].sum(axis=1)
        out = pd.DataFrame({id_col: b[id_col].to_numpy(),
                            "pq_sim": sim})
        return out.sort_values(["pq_sim", id_col],
                               ascending=[False, True]).head(k)

    parts = codes.map_batches(score, batch_format="pandas",
                              batch_size=65536).to_pandas()
    out = parts.sort_values(["pq_sim", id_col],
                            ascending=[False, True]).head(k)
    out["pq_sim"] = np.round(out["pq_sim"], 6)
    return out.reset_index(drop=True)


# ------------------------------------------- IVF index on storage


def build_ivf_index(ds: rd.Dataset, out_dir: str, num_centroids: int = 16,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    sample: int = 2048, seed: int = 0) -> np.ndarray:
    """Write the corpus hive-partitioned by coarse IVF cell
    (``cell=K/part-*.parquet``) and persist the centroids alongside.
    This is the storage half of the 10^12-vector path: a query then
    READS only its nprobe cell directories — pruning at the read, not
    after it. Returns the centroids (also saved to
    ``<out_dir>/_centroids.npy``)."""
    import os

    C = train_centroids(ds, num_centroids, vec_col, sample=sample, seed=seed)
    cref = ray.put(C)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        Ci = ray.get(cref)
        X = _normalize(_stack(b[vec_col]))
        b = b.copy()
        b["cell"] = (X @ Ci.T).argmax(axis=1).astype(np.int64)
        return b

    (ds.map_batches(assign, batch_format="pandas", batch_size=65536)
       .write_parquet(out_dir, partition_cols=["cell"]))
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "_centroids.npy"), C)
    return C


def knn_ivf_indexed(index_dir: str, query: np.ndarray, k: int = 10,
                    nprobe: int = 4, vec_col: str = "embedding",
                    id_col: str = "vec_id") -> pd.DataFrame:
    """ANN over a ``build_ivf_index`` layout: pick the query's nprobe
    nearest centroids, ``read_parquet`` ONLY those cell directories
    (1/num_centroids of the corpus each — the other cells never leave
    storage), brute-force within them. nprobe == num_centroids reads
    everything and reduces to brute force."""
    import glob as _glob
    import os

    C = np.load(os.path.join(index_dir, "_centroids.npy"))
    q = np.asarray(query, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    probe = np.argsort(-(C @ q))[:nprobe].tolist()
    files = [f for c in probe
             for f in sorted(_glob.glob(
                 os.path.join(index_dir, f"cell={c}", "*.parquet")))]
    if not files:
        return pd.DataFrame({id_col: [], "cos_sim": []})
    qref = ray.put(q)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        qv = ray.get(qref)
        M = _normalize(_stack(batch[vec_col]))
        out = pd.DataFrame({id_col: batch[id_col].values,
                            "cos_sim": M @ qv})
        return out.sort_values(["cos_sim", id_col],
                               ascending=[False, True]).head(k)

    parts = (rd.read_parquet(files)
               .map_batches(score, batch_format="pandas", batch_size=65536)
               .to_pandas())
    out = parts.sort_values(["cos_sim", id_col],
                            ascending=[False, True]).head(k)
    out["cos_sim"] = np.round(out["cos_sim"], 6)
    return out.reset_index(drop=True)


# ------------------------------------------- k-center greedy coreset


def kcenter_coreset(ds: rd.Dataset, k: int = 16,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id") -> pd.DataFrame:
    """k-center greedy coreset selection (the classic diversity-based
    data-selection rule, Sener & Savarese 2018 shape): start from the
    lowest id, then k-1 times add the point FARTHEST (euclidean) from
    its nearest already-chosen center. Deterministic: distance ties
    break on lowest id.

    Scale shape: the corpus keeps a per-point min-distance column that
    each round is min'd against the distance to the single NEWEST
    center (one broadcast vector via ray.put — O(N·dim) work per round,
    not O(N·k·dim) recompute); the driver sees only each round's
    per-block argmax candidates (blocks × 1 rows) and holds the k
    selected vectors — metadata-scale state. k materializations of the
    (id, vec, mindist) table, which stays in the object store."""

    def init(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: b[id_col].astype("int64"),
            vec_col: b[vec_col],
            "_mind": np.full(len(b), np.inf),
        })

    state = ds.map_batches(init, batch_format="pandas").materialize()

    def block_top(b: pd.DataFrame) -> pd.DataFrame:
        # per-block argmax candidate, VECTOR INCLUDED so the driver
        # never runs a separate fetch pass (blocks × 1 rows total).
        # seed rank uses _mind=inf everywhere, so ties fall to min id.
        s = b.sort_values(["_mind", id_col], ascending=[False, True])
        return s.head(1)

    def pick(cands: pd.DataFrame) -> tuple[int, float, np.ndarray]:
        cands = cands.sort_values(["_mind", id_col],
                                  ascending=[False, True])
        row = cands.iloc[0]
        return (int(row[id_col]), float(row["_mind"]),
                np.asarray(row[vec_col], dtype=np.float64))

    # seed: _mind is inf everywhere -> argmax tie-breaks to lowest id
    new_id, new_dist, cvec = pick(
        state.map_batches(block_top, batch_format="pandas").to_pandas())

    chosen: list[tuple[int, int, float]] = []  # (order, id, dist)
    for rank in range(k):
        chosen.append((rank, new_id,
                       0.0 if rank == 0 else new_dist))
        if rank == k - 1:
            break
        cref = ray.put(cvec)

        def upd(b: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(cref)
            M = _stack(b[vec_col])
            d = np.linalg.norm(M - c[None, :], axis=1)
            return pd.DataFrame({
                id_col: b[id_col].astype("int64"),
                vec_col: b[vec_col],
                "_mind": np.minimum(b["_mind"].to_numpy(np.float64), d),
            })

        # one fused execution per round: update min-dists AND emit the
        # per-block candidates; state re-materializes for the next round
        state = state.map_batches(upd, batch_format="pandas").materialize()
        new_id, new_dist, cvec = pick(
            state.map_batches(block_top, batch_format="pandas").to_pandas())

    return pd.DataFrame({
        "rank": pd.Series([c[0] for c in chosen], dtype="int64"),
        id_col: pd.Series([c[1] for c in chosen], dtype="int64"),
        "dist": np.round([c[2] for c in chosen], 6),
    })


# -------------------------------------------------- ANN quality eval


def ann_recall(ds: rd.Dataset, queries: np.ndarray, k: int = 10,
               num_centroids: int = 8, probes: tuple = (1, 2, 4, 8),
               vec_col: str = "embedding", id_col: str = "vec_id"
               ) -> pd.DataFrame:
    """Recall@k of the IVF index against exact brute force over an
    nprobe sweep — the standard ANN quality/speed trade-off report.
    Centroids are trained ONCE and shared across every (query, nprobe)
    evaluation; ground truth is one brute-force top-k per query. Each
    evaluation is a per-block top-k map (broadcast query), so the
    corpus is never shuffled or collected. Returns (nprobe, recall)
    with recall averaged over the query set."""
    Q = np.asarray(queries, dtype=np.float64)
    cents = train_centroids(ds, num_centroids, vec_col)
    truth = [set(knn_brute(ds, q, k=k, vec_col=vec_col,
                           id_col=id_col)[id_col]) for q in Q]
    rows = []
    for nprobe in probes:
        hits = 0
        for q, t in zip(Q, truth):
            got = set(knn_ivf(ds, q, k=k, num_centroids=num_centroids,
                              nprobe=nprobe, vec_col=vec_col,
                              id_col=id_col, centroids=cents)[id_col])
            hits += len(got & t)
        rows.append((int(nprobe),
                     round(hits / (len(Q) * k), 6)))
    return pd.DataFrame({"nprobe": pd.Series([r[0] for r in rows],
                                             dtype="int64"),
                         "recall": [r[1] for r in rows]})


def pca_fit(ds: rd.Dataset, n_components: int = 8,
            vec_col: str = "embedding") -> dict:
    """Distributed PCA over an embedding column: ONE streaming pass
    accumulates per-batch moment partials (count, coordinate sum, and
    the d x d Gram matrix X^T X); the driver assembles the sample
    covariance and eigendecomposes it. Driver state is d^2 + d floats —
    independent of corpus size — so this is the scale-correct shape for
    10^12 vectors (same partial-sum pattern as kmeans_fit).

    Deterministic sign convention: each component is flipped so its
    largest-|coordinate| entry is positive (eigenvectors are otherwise
    sign-ambiguous across LAPACK builds).

    Returns {mean (d,), components (m, d) row-major by descending
    eigenvalue, explained_var (m,), total_var (scalar), n (count)}."""
    d = len(ds.take(1)[0][vec_col])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        X = _stack(b[vec_col])
        return pd.DataFrame({
            "n": [len(X)],
            "xsum": [X.sum(axis=0)],
            "xtx": [(X.T @ X).ravel()],
        })

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536).to_pandas()
    n = int(parts["n"].sum())
    if n < 2:
        raise ValueError("pca_fit: need at least 2 vectors")
    xsum = np.sum(np.stack(parts["xsum"].to_numpy()), axis=0)
    xtx = np.sum(np.stack(parts["xtx"].to_numpy()), axis=0).reshape(d, d)
    mean = xsum / n
    cov = (xtx - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)      # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T               # (m, d)
    flip = np.sign(comps[np.arange(len(comps)),
                         np.argmax(np.abs(comps), axis=1)])
    comps = comps * flip[:, None]
    return {
        "mean": mean,
        "components": comps,
        "explained_var": np.maximum(evals[order], 0.0),
        "total_var": float(np.trace(cov)),
        "n": n,
    }


def pca_project(ds: rd.Dataset, model: dict,
                vec_col: str = "embedding",
                out_col: str = "pca") -> rd.Dataset:
    """Attach the centered projection onto the fitted components as a
    list<double> column. The (m x d) component matrix is a ``ray.put``
    broadcast read once per task — never re-shipped per batch."""
    ref = ray.put((np.asarray(model["mean"]),
                   np.asarray(model["components"])))

    def project(b: pd.DataFrame) -> pd.DataFrame:
        mean, comps = ray.get(ref)
        X = _stack(b[vec_col]) - mean
        b = b.copy()
        b[out_col] = list(X @ comps.T)
        return b

    return ds.map_batches(project, batch_format="pandas",
                          batch_size=65536)


# ------------------------------------------- LSH (random hyperplane) ANN


def lsh_planes(dim: int, nbits: int, ntables: int,
               seed: int = 0) -> np.ndarray:
    """Deterministic random-hyperplane banks: (ntables, nbits, dim)
    standard normals from a fixed PCG stream."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((ntables, nbits, dim))


def lsh_bucket_ids(X: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Pack each vector's sign pattern per table into a uint64 bucket
    id -> (n, ntables). One matmul per table, vectorized bit-pack."""
    nt, nb, _ = planes.shape
    out = np.zeros((len(X), nt), dtype=np.uint64)
    weights = (np.uint64(1) << np.arange(nb, dtype=np.uint64))
    for t in range(nt):
        bits = (X @ planes[t].T) > 0
        out[:, t] = bits.astype(np.uint64) @ weights
    return out


def knn_lsh(ds: rd.Dataset, query: np.ndarray, k: int = 10,
            nbits: int = 4, ntables: int = 16, seed: int = 0,
            vec_col: str = "embedding", id_col: str = "vec_id"
            ) -> pd.DataFrame:
    """Approximate top-k by cosine via random-hyperplane LSH: a vector
    is a CANDIDATE iff it shares a bucket with the query in ANY of the
    ``ntables`` banks (expected candidate fraction per bank 2^-nbits x
    collision boost for near vectors — the classic SimHash argument:
    P[sign match] = 1 - angle/pi per plane). Candidates get exact
    cosine, per-block top-k, tiny driver merge. nbits=0 makes every
    vector a candidate and reduces to knn_brute exactly. Tune to the
    similarity margin: on this corpus's weakly-correlated synthetic
    embeddings (top-10 cosine ~0.4) measured recall@10 is 0.8 at
    (nbits=4, ntables=16) and 1.0 at (4, 32); tight near-dup clusters
    tolerate far more bits.

    Scale shape: the plane bank ((ntables x nbits x dim) floats) and
    the query's bucket row broadcast once; the corpus streams through
    one map_batches — no index build. (For repeated queries, persist
    bucket ids hive-partitioned like build_ivf_index and prune at the
    read; this is the in-scan variant.)"""
    q = np.asarray(query, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    dim = len(q)
    planes = lsh_planes(dim, nbits, ntables, seed) if nbits > 0 else None
    qb = (lsh_bucket_ids(q[None, :], planes)[0]
          if planes is not None else None)
    ref = ray.put((q, planes, qb))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        qv, P, qbk = ray.get(ref)
        M = _normalize(_stack(batch[vec_col]))
        if P is not None:
            B = lsh_bucket_ids(M, P)
            cand = (B == qbk[None, :]).any(axis=1)
            if not cand.any():
                return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                     "cos_sim": pd.Series(dtype="float64")})
            M = M[cand]
            ids = batch[id_col].to_numpy()[cand]
        else:
            ids = batch[id_col].to_numpy()
        out = pd.DataFrame({id_col: ids, "cos_sim": M @ qv})
        return out.sort_values(["cos_sim", id_col],
                               ascending=[False, True]).head(k)

    parts = ds.map_batches(score, batch_format="pandas",
                           batch_size=65536).to_pandas()
    if id_col not in parts.columns:
        return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                             "cos_sim": pd.Series(dtype="float64")})
    out = parts.sort_values(["cos_sim", id_col],
                            ascending=[False, True]).head(k)
    out["cos_sim"] = np.round(out["cos_sim"], 6)
    return out.reset_index(drop=True)


def label_centroid_sims(ds: rd.Dataset, label_col: str = "label",
                        vec_col: str = "embedding") -> pd.DataFrame:
    """Pairwise cosine similarity between per-label embedding
    centroids (the class-separation / source-drift diagnostic): one
    streaming pass of per-block (label, count, coordinate-sum)
    partials — labels x dim floats per block, never row-scale — then a
    labels x labels driver matrix. Returns (label_a, label_b, cos_sim)
    for a < b, rounded to 6 decimals (knn convention)."""

    def part(b: pd.DataFrame) -> pd.DataFrame:
        X = _stack(b[vec_col])
        lab = b[label_col].to_numpy()
        ulab, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(ulab), X.shape[1]))
        np.add.at(sums, inv, X)
        cnt = np.bincount(inv)
        out = pd.DataFrame({label_col: ulab, "n": cnt.astype("int64")})
        for j in range(X.shape[1]):
            out[f"s{j}"] = sums[:, j]
        return out

    parts = (ds.map_batches(part, batch_format="pandas",
                            batch_size=65536).to_pandas()
             .groupby(label_col, as_index=False).sum())
    dims = [c for c in parts.columns if c.startswith("s")]
    C = parts[dims].to_numpy() / parts["n"].to_numpy()[:, None]
    Cn = _normalize(C)
    labels = parts[label_col].tolist()
    sims = Cn @ Cn.T
    rows = [(labels[a], labels[b], round(float(sims[a, b]), 6))
            for a in range(len(labels)) for b in range(len(labels))
            if labels[a] < labels[b]]
    return (pd.DataFrame(rows, columns=["label_a", "label_b", "cos_sim"])
            .sort_values(["label_a", "label_b"]).reset_index(drop=True))


# ------------------------------------------- IVF-PQ composed index


def build_ivfpq_index(ds: rd.Dataset, out_dir: str,
                      num_centroids: int = 16, m: int = 8,
                      n_codes: int = 32, vec_col: str = "embedding",
                      id_col: str = "vec_id", sample: int = 2048,
                      seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """The composed 10^12-vector layout (Jegou et al. TPAMI'11 /
    FAISS IVFPQ shape): coarse IVF cells partition storage, and inside
    each cell rows carry only (id, uint8 PQ codes of the RESIDUAL
    x - centroid[cell]) — the raw vectors live in a sibling
    ``raw/cell=K`` layout read only by the re-rank pass over candidate
    cells.  Codes shrink the scan payload ~dim*8/m x; residual
    quantization (not plain PQ) keeps the codebooks shared across
    cells while centering each cell's distribution.

    Returns (centroids, codebooks); both are also persisted in
    ``out_dir`` so a query process needs no training pass."""
    import os

    C = train_centroids(ds, num_centroids, vec_col, sample=sample,
                        seed=seed)
    cref = ray.put(C)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        Ci = ray.get(cref)
        X = _normalize(_stack(b[vec_col]))
        b = b.copy()
        b["cell"] = (X @ Ci.T).argmax(axis=1).astype(np.int64)
        return b

    cells = ds.map_batches(assign, batch_format="pandas",
                           batch_size=65536).materialize()

    # train PQ books on residuals of a sample
    take = cells.limit(sample).to_pandas()
    X = _normalize(_stack(take[vec_col]))
    R = X - C[take["cell"].to_numpy(np.int64)]
    d = R.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    rng = np.random.default_rng(seed)
    books = np.zeros((m, n_codes, sub), dtype=np.float64)
    for s in range(m):
        Rs = np.ascontiguousarray(R[:, s * sub:(s + 1) * sub])
        kk = min(n_codes, len(Rs))
        B = Rs[rng.choice(len(Rs), size=kk, replace=False)].copy()
        for _ in range(10):
            d2 = -2.0 * (Rs @ B.T) + (B * B).sum(axis=1)[None, :]
            a = d2.argmin(axis=1)
            for c in range(kk):
                msk = a == c
                if msk.any():
                    B[c] = Rs[msk].mean(axis=0)
        books[s, :kk] = B
        if kk < n_codes:
            books[s, kk:] = B[0]
    bref = ray.put(books)

    def enc(b: pd.DataFrame) -> pd.DataFrame:
        Ci, Bk = ray.get(cref), ray.get(bref)
        X = _normalize(_stack(b[vec_col]))
        R = X - Ci[b["cell"].to_numpy(np.int64)]
        codes = np.empty((len(X), Bk.shape[0]), dtype=np.uint8)
        for s in range(Bk.shape[0]):
            Rs = R[:, s * sub:(s + 1) * sub]
            d2 = (-2.0 * (Rs @ Bk[s].T)
                  + (Bk[s] * Bk[s]).sum(axis=1)[None, :])
            codes[:, s] = d2.argmin(axis=1).astype(np.uint8)
        return pd.DataFrame({id_col: b[id_col].to_numpy(),
                             "pq_codes": list(codes),
                             "cell": b["cell"].to_numpy(np.int64)})

    # atomic publication (same tmp-dir+rename pattern as
    # warcgen.build_warc_corpus): a build killed mid-write must never
    # leave a half-populated out_dir that a later rebuild APPENDS a
    # second set of parquet files into (duplicated records would surface
    # the same vec_id twice in every top-k)
    import shutil

    # per-process tmp: a SHARED ".tmp" would let a second concurrent
    # builder rmtree/interleave with this one mid-write and publish a
    # mixed dir — each builder owns its tmp, loser reaps its own
    tmp_dir = out_dir + f".tmp.{os.getpid()}"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)
    (cells.map_batches(enc, batch_format="pandas", batch_size=65536)
        .write_parquet(os.path.join(tmp_dir, "codes"),
                       partition_cols=["cell"]))
    (cells.write_parquet(os.path.join(tmp_dir, "raw"),
                         partition_cols=["cell"]))
    np.save(os.path.join(tmp_dir, "_centroids.npy"), C)
    np.save(os.path.join(tmp_dir, "_books.npy"), books)
    published = os.path.join(out_dir, "_books.npy")
    if not os.path.exists(published):
        # an out_dir WITHOUT _books.npy is a stale partial (or the
        # caller's fresh empty dir) — clear it so the rename lands
        shutil.rmtree(out_dir, ignore_errors=True)
        try:
            os.rename(tmp_dir, out_dir)
        except OSError:
            pass  # concurrent builder won the rename — theirs is complete
    if os.path.exists(tmp_dir):
        shutil.rmtree(tmp_dir, ignore_errors=True)
    return C, books


def knn_ivfpq(index_dir: str, query: np.ndarray, k: int = 10,
              nprobe: int = 4, rerank: int = 40,
              vec_col: str = "embedding", id_col: str = "vec_id"
              ) -> pd.DataFrame:
    """Two-stage ANN over a ``build_ivfpq_index`` layout:

      1. candidate scan — read ONLY the ``nprobe`` nearest cells'
         CODES files (prune at the read, tiny rows), score by ADC
         table lookup against the per-cell residual tables, keep the
         top ``rerank`` candidates;
      2. re-rank — read the raw vectors of ONLY the probed cells,
         filtered to the candidate ids at the Arrow scan, exact cosine,
         top ``k``.

    nprobe == num_centroids with lossless codebooks reduces to brute
    force (pinned in tests)."""
    import glob as _glob
    import os

    C = np.load(os.path.join(index_dir, "_centroids.npy"))
    books = np.load(os.path.join(index_dir, "_books.npy"))
    q = np.asarray(query, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    mm, _nc, sub = books.shape
    probe = np.argsort(-(C @ q))[:nprobe].tolist()
    code_files = [f for c in probe
                  for f in sorted(_glob.glob(os.path.join(
                      index_dir, "codes", f"cell={c}", "*.parquet")))]
    if not code_files:
        return pd.DataFrame({id_col: [], "cos_sim": []})

    # per-cell ADC tables: sim(x) ~ q . c + q . residual -> the second
    # term is m lookups into T[s] = books[s] @ q_s (cell-independent),
    # the first a per-cell scalar
    T = np.stack([books[s] @ q[s * sub:(s + 1) * sub]
                  for s in range(mm)])        # (m, n_codes)
    base = C @ q                              # (num_centroids,)
    tref = ray.put((T, base))

    def score(b: pd.DataFrame, _rr=rerank) -> pd.DataFrame:
        Tt, bs = ray.get(tref)
        Cd = np.stack(b["pq_codes"].to_numpy())
        sim = (Tt[np.arange(Tt.shape[0])[None, :], Cd].sum(axis=1)
               + bs[b["cell"].to_numpy(np.int64)])
        out = pd.DataFrame({id_col: b[id_col].to_numpy(),
                            "pq_sim": sim})
        return out.sort_values(["pq_sim", id_col],
                               ascending=[False, True]).head(_rr)

    cand = (rd.read_parquet(code_files,
                            columns=[id_col, "pq_codes", "cell"])
            .map_batches(score, batch_format="pandas", batch_size=65536)
            .to_pandas()
            .sort_values(["pq_sim", id_col], ascending=[False, True])
            .head(rerank))
    ids = set(cand[id_col].tolist())

    raw_files = [f for c in probe
                 for f in sorted(_glob.glob(os.path.join(
                     index_dir, "raw", f"cell={c}", "*.parquet")))]
    qref = ray.put(q)
    idref = ray.put(np.array(sorted(ids)))

    def rescore(b: pd.DataFrame, _k=k) -> pd.DataFrame:
        qv = ray.get(qref)
        keep = np.isin(b[id_col].to_numpy(), ray.get(idref))
        b = b[keep]
        if not len(b):
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "cos_sim": pd.Series([], dtype="f8")})
        M = _normalize(_stack(b[vec_col]))
        out = pd.DataFrame({id_col: b[id_col].to_numpy(),
                            "cos_sim": M @ qv})
        return out.sort_values(["cos_sim", id_col],
                               ascending=[False, True]).head(_k)

    parts = (rd.read_parquet(raw_files, columns=[id_col, vec_col])
             .map_batches(rescore, batch_format="pandas",
                          batch_size=65536).to_pandas())
    out = parts.sort_values(["cos_sim", id_col],
                            ascending=[False, True]).head(k)
    out["cos_sim"] = np.round(out["cos_sim"], 6)
    return out.reset_index(drop=True)


def mmr_select(ds: rd.Dataset, query: np.ndarray, k: int = 10,
               pool: int = 100, lam: float = 0.7,
               vec_col: str = "embedding",
               id_col: str = "vec_id") -> pd.DataFrame:
    """Diversity-aware top-k by MAXIMAL MARGINAL RELEVANCE (Carbonell &
    Goldstein, SIGIR 1998): the distributed leg fetches a relevance
    top-``pool`` candidate set (per-block top-k partials, same shape as
    knn_brute — the corpus never leaves the cluster), then the greedy
    MMR rerank runs on the pool x dim matrix: each step picks
    argmax(lam * sim(q, d) - (1 - lam) * max sim(d, selected)),
    relevance-then-id tie-break, so selection is deterministic.
    Returns (rank, id, cos_sim, mmr_score)."""
    q = np.asarray(query, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    qref = ray.put(q)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        qv = ray.get(qref)
        M = _normalize(_stack(batch[vec_col]))
        cos = M @ qv
        out = pd.DataFrame({id_col: batch[id_col].values, "cos_sim": cos,
                            "_v": list(M)})
        return out.sort_values(["cos_sim", id_col],
                               ascending=[False, True]).head(pool)

    parts = ds.map_batches(score, batch_format="pandas",
                           batch_size=65536).to_pandas()
    cand = (parts.sort_values(["cos_sim", id_col],
                              ascending=[False, True]).head(pool)
            .reset_index(drop=True))
    V = np.stack(cand["_v"].to_list())
    rel = cand["cos_sim"].to_numpy(np.float64)
    ids = cand[id_col].to_numpy(np.int64)
    n = V.shape[0]
    selected: list[int] = []
    max_sim = np.full(n, -np.inf)
    rows = []
    for rank in range(min(k, n)):
        if selected:
            mmr = lam * rel - (1.0 - lam) * max_sim
        else:
            mmr = lam * rel
        mmr[selected] = -np.inf
        # deterministic: best mmr, then higher relevance, then lower id
        order = np.lexsort((ids, -rel, -mmr))
        pick = int(order[0])
        selected.append(pick)
        rows.append((rank, int(ids[pick]),
                     round(float(rel[pick]), 6),
                     round(float(mmr[pick]), 6)))
        max_sim = np.maximum(max_sim, V @ V[pick])
    return pd.DataFrame(rows, columns=["rank", id_col, "cos_sim",
                                       "mmr_score"])


def _jl_matrix(in_dim: int, out_dim: int, seed: int = 7) -> np.ndarray:
    """Deterministic sparse JL projection (Achlioptas 2003): entries
    in {+1, 0, -1} with prob {1/6, 2/3, 1/6}, scaled sqrt(3/out_dim),
    derived from a counter hash — no RNG state, reproducible on any
    worker."""
    idx = np.arange(in_dim * out_dim, dtype=np.int64) + seed * 1_000_003
    h = (idx * 2654435761 % 4294967296) / 4294967296.0
    R = np.zeros(in_dim * out_dim, dtype=np.float64)
    R[h < 1.0 / 6.0] = 1.0
    R[h >= 5.0 / 6.0] = -1.0
    return (R * np.sqrt(3.0 / out_dim)).reshape(in_dim, out_dim)


def rp_knn_recall(ds: rd.Dataset, queries: np.ndarray, k: int = 10,
                  out_dims: tuple = (8, 16, 32),
                  vec_col: str = "embedding",
                  id_col: str = "vec_id") -> pd.DataFrame:
    """Johnson-Lindenstrauss RANDOM PROJECTION quality report: project
    corpus + queries through the deterministic Achlioptas matrix at
    several target dims and measure knn recall@k against full-dim
    brute force — the cheap-at-any-scale reduction (one broadcast
    in_dim x out_dim matmul per block; contrast pca_embeddings, which
    needs a moments pass). Returns (out_dim, recall_permille) averaged
    over the query set."""
    Q = np.asarray(queries, dtype=np.float64)
    in_dim = Q.shape[1]
    truth = [set(knn_brute(ds, q, k=k, vec_col=vec_col,
                           id_col=id_col)[id_col]) for q in Q]
    rows = []
    for od in out_dims:
        R = _jl_matrix(in_dim, od)
        Rref = ray.put(R)

        def score(batch: pd.DataFrame, q_low=None) -> pd.DataFrame:
            Rm = ray.get(Rref)
            M = _normalize(_stack(batch[vec_col]) @ Rm)
            cos = M @ q_low
            out = pd.DataFrame({id_col: batch[id_col].values,
                                "cos_sim": cos})
            return out.sort_values(["cos_sim", id_col],
                                   ascending=[False, True]).head(k)

        hits = 0
        for qi, q in enumerate(Q):
            ql = q @ R
            ql = ql / (np.linalg.norm(ql) or 1.0)
            import functools

            parts = ds.map_batches(
                functools.partial(score, q_low=ql),
                batch_format="pandas", batch_size=65536).to_pandas()
            top = set(parts.sort_values(
                ["cos_sim", id_col],
                ascending=[False, True]).head(k)[id_col])
            hits += len(top & truth[qi])
        rows.append((int(od), int(1000 * hits // (k * len(Q)))))
    return pd.DataFrame(rows, columns=["out_dim", "recall_permille"])
