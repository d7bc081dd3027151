"""Exact prefix-filter similarity join (dedup.ppjoin_pairs — AllPairs/
PPJoin, distributed per Vernica et al. SIGMOD 2010): brute-force
parity, edge cases, and the skew guard."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from dup_ocropy_ray.pipelines.dedup import ppjoin_pairs


def _brute(df: pd.DataFrame, threshold: float) -> pd.DataFrame:
    sets = {int(r.doc_id): set((r.text or "").split())
            for r in df.itertuples()}
    rows = []
    ks = sorted(sets)
    for i in range(len(ks)):
        for j in range(i + 1, len(ks)):
            a, b = ks[i], ks[j]
            u = len(sets[a] | sets[b])
            jac = len(sets[a] & sets[b]) / u if u else 1.0
            if u and jac >= threshold:
                rows.append((a, b, round(jac, 6)))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])


def _run(df: pd.DataFrame, threshold: float, **kw) -> pd.DataFrame:
    out = ppjoin_pairs(rd.from_pandas(df), threshold=threshold, **kw)
    return (out.to_pandas().astype({"doc_a": "int64", "doc_b": "int64"})
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))


def test_brute_force_parity_random_corpus(ray_session):
    rng = np.random.RandomState(7)
    vocab = np.array([f"w{i}" for i in range(300)])
    texts, ids = [], []
    for i in range(200):
        texts.append(" ".join(rng.choice(vocab, rng.randint(4, 40))))
        ids.append(i)
    for j in range(12):  # planted near-dup families
        toks = sorted(set(texts[j].split()))
        texts.append(" ".join(toks[: max(1, len(toks) - len(toks) // 8)]))
        ids.append(200 + j)
    df = pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                       "text": texts})
    for thr in (0.5, 0.8):
        got = _run(df, thr)
        want = (_brute(df, thr)
                .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)
        assert len(want) > 0  # the plant guarantees a non-trivial answer


def test_exact_duplicates_and_empty_docs(ray_session):
    df = pd.DataFrame({
        "doc_id": pd.Series([1, 2, 3, 4, 5], dtype="int64"),
        "text": ["a b c d", "a b c d", "x y z", "", None],
    })
    got = _run(df, 0.9)
    # empty/NULL docs emit no prefix tokens -> no pairs (documented)
    assert got.values.tolist() == [[1, 2, 1.0]]


def test_threshold_one_requires_identical_sets(ray_session):
    df = pd.DataFrame({
        "doc_id": pd.Series([1, 2, 3], dtype="int64"),
        "text": ["a b c", "c b a a", "a b"],
    })
    got = _run(df, 1.0)
    assert got.values.tolist() == [[1, 2, 1.0]]


def test_skew_guard_raises(ray_session):
    # 60 docs all sharing one rare token in every prefix
    df = pd.DataFrame({
        "doc_id": pd.Series(range(60), dtype="int64"),
        "text": [f"shared u{i}" for i in range(60)],
    })
    with pytest.raises(Exception, match="max_token_group"):
        _run(df, 0.5, max_token_group=10)
