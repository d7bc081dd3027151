"""leakage_safe_split: near-dup clusters must be split-atomic."""

import numpy as np
import pandas as pd
import ray.data as rd

from dup_ocropy_ray.pipelines import dedup


def test_clusters_never_straddle_splits(ray_session):
    # planted near-dup families: docs i and i+100 share >50% tokens
    rng = np.random.default_rng(3)
    vocab = [f"w{k}" for k in range(50)]
    texts = {}
    for i in range(100):
        base = list(rng.choice(vocab, size=12, replace=False))
        texts[i] = " ".join(base)
        texts[i + 100] = " ".join(base[:10] + ["extra", f"t{i}"])
    df = pd.DataFrame({
        "doc_id": pd.Series(sorted(texts), dtype="int64"),
        "text": [texts[i] for i in sorted(texts)],
        "lang": "en",
        "source": "s0",
        "n_chars": pd.Series([len(texts[i]) for i in sorted(texts)],
                             dtype="int64"),
    })
    ds = rd.from_pandas(df)
    pairs = dedup.ngram_jaccard_pairs(ds, ["lang", "source"], threshold=0.5)
    labels = dedup.connected_components(pairs).to_pandas()
    assert len(labels) >= 150  # the planted families really cluster

    lab = df.merge(labels, on="doc_id", how="left")
    lab["cluster_id"] = lab["cluster_id"].fillna(lab["doc_id"]).astype("int64")
    h = (lab["cluster_id"].to_numpy(np.int64).astype(np.uint64)
         * np.uint64(2654435761)) % np.uint64(1 << 32)
    lab["split"] = np.where(h % np.uint64(10) < 8, "train", "test")
    # the invariant the operator exists for: one split per cluster
    per_cluster = lab.groupby("cluster_id")["split"].nunique()
    assert (per_cluster == 1).all()
    # and both splits are populated (hash split actually splits)
    assert set(lab["split"]) == {"train", "test"}
