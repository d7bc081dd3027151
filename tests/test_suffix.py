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


def test_substring_dedup_exact_matches_hash_approx(ray_session):
    """The suffix-array exact path and the windowed-hash approximation
    compute the same transform (absent hash collisions): value-equal on
    a planted corpus with cross-doc duplicated runs, an intra-doc
    repeated run (NOT duplicated at min_docs=2 — distinct-doc
    semantics), and short/empty docs."""
    import pandas as pd
    import ray.data as rd
    from dup_ocropy_ray.pipelines.dedup import strip_dup_spans
    from dup_ocropy_ray.pipelines.suffix import substring_dedup_exact

    shared = "alpha beta gamma delta"
    df = pd.DataFrame({
        "doc_id": range(7),
        "text": [
            f"{shared} tail0 one two",
            f"head1 {shared} tail1",
            # intra-doc repeat only: must survive at min_docs=2
            f"rep one rep two {('x y z w ' * 2).strip()} x y z w",
            "unrelated words entirely here now",
            "",            # empty doc drops on both paths
            "tiny",        # shorter than the window
            f"{shared} {shared}",  # dup run twice in one doc, also x-doc
        ],
    })
    ds = rd.from_pandas(df).repartition(3)
    exact = (substring_dedup_exact(ds, window=4, min_docs=2)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    approx = (strip_dup_spans(ds, window=4, min_docs=2)
              .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(exact, approx[exact.columns])
    got = exact.set_index("doc_id")["clean_text"]
    assert got.loc[0] == "tail0 one two"
    assert got.loc[1] == "head1 tail1"
    # doc 2: the intra-doc 'x y z w' windows repeat only within doc 2
    assert "x y z w" in got.loc[2]
    assert 6 not in got.index  # doc 6 is pure duplicated mass -> dropped


def test_substring_dedup_exact_string_doc_ids(ray_session):
    """Non-integer doc ids ride the int64 surrogate key (corpus_tokens
    _doc_surrogate) but the OUTPUT carries the original ids — parity
    with strip_dup_spans on the same string-id corpus."""
    import pandas as pd
    import ray.data as rd
    from dup_ocropy_ray.pipelines.dedup import strip_dup_spans
    from dup_ocropy_ray.pipelines.suffix import substring_dedup_exact

    shared = "lorem ipsum dolor sit amet"
    df = pd.DataFrame({
        "doc_id": [f"doc-{i}" for i in range(5)],
        "text": [
            f"{shared} unique0 endings",
            f"start1 {shared}",
            "totally different content here now",
            "",
            f"{shared}",
        ],
    })
    ds = rd.from_pandas(df).repartition(2)
    exact = (substring_dedup_exact(ds, window=5, min_docs=2)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    approx = (strip_dup_spans(ds, window=5, min_docs=2)
              .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(exact, approx[exact.columns])
    got = exact.set_index("doc_id")["clean_text"]
    assert got.loc["doc-0"] == "unique0 endings"
    assert got.loc["doc-1"] == "start1"
    assert "doc-4" not in got.index  # pure duplicated mass -> dropped
