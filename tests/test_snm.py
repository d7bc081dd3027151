"""Sorted-Neighborhood dedup (dedup.sorted_neighborhood_pairs)."""

import numpy as np
import pandas as pd

import ray.data as rd

from dup_ocropy_ray.pipelines.dedup import sorted_neighborhood_pairs


def _brute(df: pd.DataFrame, window: int, threshold: float,
           key_len: int = 8) -> pd.DataFrame:
    t = df.assign(key=df.text.fillna("").str.strip().str.lower()
                  .str.slice(0, key_len))
    t = t.sort_values(["key", "doc_id"]).reset_index(drop=True)
    rows = []
    for i in range(len(t)):
        for j in range(i + 1, min(i + window, len(t))):
            a = set((t.text.iloc[i] or "").split())
            b = set((t.text.iloc[j] or "").split())
            u = len(a | b)
            jac = len(a & b) / u if u else 1.0
            if jac >= threshold:
                da, db = int(t.doc_id.iloc[i]), int(t.doc_id.iloc[j])
                rows.append((min(da, db), max(da, db), round(jac, 6)))
    return (pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))


def test_brute_parity_with_dup_families(ray_session):
    rng = np.random.RandomState(3)
    vocab = np.array([f"w{i}" for i in range(120)])
    texts = [" ".join(rng.choice(vocab, rng.randint(3, 25)))
             for _ in range(150)]
    # planted: shared-prefix families so they sort adjacently
    for j in range(10):
        texts.append("zza common prefix family " + " ".join(
            rng.choice(vocab, 4)))
    texts.extend(["", None, "   "])
    df = pd.DataFrame({"doc_id": pd.Series(range(len(texts)),
                                           dtype="int64"),
                       "text": texts})
    for w, thr in ((5, 0.3), (3, 0.5)):
        got = (sorted_neighborhood_pairs(rd.from_pandas(df), window=w,
                                         threshold=thr)
               .to_pandas().astype({"doc_a": "int64", "doc_b": "int64"})
               .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
        want = _brute(df, w, thr)
        pd.testing.assert_frame_equal(got, want)
        assert len(want) > 0


def test_window_one_yields_nothing(ray_session):
    df = pd.DataFrame({"doc_id": pd.Series([1, 2], dtype="int64"),
                       "text": ["a b", "a b"]})
    out = sorted_neighborhood_pairs(rd.from_pandas(df),
                                    window=1).to_pandas()
    assert len(out) == 0  # distance must be < window
