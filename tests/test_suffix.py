"""Distributed suffix array (pipelines/suffix.py): exact equality vs a
serial numpy doubling reference on the real corpus, planted fixture,
and layout invariance."""

import numpy as np
import pandas as pd

import ray.data as rd

SF = "/root/testdata/sf0.001"


def test_suffix_array_banana(ray_session):
    from dup_ocropy_ray.pipelines.suffix import (suffix_array,
                                                 suffix_array_ref)

    df = pd.DataFrame({"doc_id": [0, 1], "text": ["b a n a", "n a"]})
    ranks, n = suffix_array(rd.from_pandas(df))
    got = ranks.to_pandas().sort_values("rank")["pos"].to_numpy()
    assert n == 6
    assert got.tolist() == suffix_array_ref(
        "b a n a n a".split()).tolist() == [5, 3, 1, 0, 4, 2]


def test_suffix_array_matches_serial_and_layout(ray_session):
    from dup_ocropy_ray.pipelines.suffix import (corpus_tokens,
                                                 suffix_array,
                                                 suffix_array_ref)

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    ranks, n = suffix_array(docs)
    sa = ranks.to_pandas().sort_values("rank")["pos"].to_numpy()
    toks, total = corpus_tokens(
        rd.read_parquet(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"]))
    words = toks.to_pandas().sort_values("pos")["word"].tolist()
    assert n == total == len(words)
    assert np.array_equal(sa, suffix_array_ref(words))

    r8, n8 = suffix_array(docs.repartition(8))
    sa8 = r8.to_pandas().sort_values("rank")["pos"].to_numpy()
    assert n8 == n and np.array_equal(sa8, sa)


def test_suffix_array_empty_and_single(ray_session):
    from dup_ocropy_ray.pipelines.suffix import suffix_array

    empty = pd.DataFrame({"doc_id": [0], "text": [""]})
    ranks, n = suffix_array(rd.from_pandas(empty))
    assert n == 0 and len(ranks.to_pandas()) == 0

    one = pd.DataFrame({"doc_id": [0], "text": ["solo"]})
    ranks, n = suffix_array(rd.from_pandas(one))
    out = ranks.to_pandas()
    assert n == 1 and out["pos"].tolist() == [0]
    assert out["rank"].tolist() == [0]
