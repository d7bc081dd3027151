"""Byte-trigram substring index (textstats.build_trigram_index /
search_trigram_index) — pg_trgm-style prune-at-the-read search."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from dup_ocropy_ray.pipelines.textstats import (
    _trigram_codes,
    build_trigram_index,
    search_trigram_index,
)


def test_trigram_codes_exact_and_short():
    assert _trigram_codes("").shape == (0,)
    assert _trigram_codes("ab").shape == (0,)
    c = _trigram_codes("abc")
    assert c.tolist() == [(ord("a") << 16) | (ord("b") << 8) | ord("c")]
    # distinct: repeated trigrams collapse
    assert _trigram_codes("aaaa").shape == (1,)


def test_index_search_matches_scan(ray_session, tmp_path):
    texts = ["the quick brown fox", "a quick one", "nothing here",
             "brown paper bag", None, ""]
    df = pd.DataFrame({"doc_id": pd.Series(range(6), dtype="int64"),
                       "text": texts})
    ds = rd.from_pandas(df)
    idx = str(tmp_path / "trgm")
    assert build_trigram_index(ds, idx, num_buckets=8) == 6
    for needle in ["quick", "brown", "own f", "zzz"]:
        got = search_trigram_index(idx, needle, ds)["doc_id"].tolist()
        want = [i for i, t in enumerate(texts) if needle in (t or "")]
        assert got == want, needle


def test_short_needle_raises(ray_session, tmp_path):
    df = pd.DataFrame({"doc_id": pd.Series([0], dtype="int64"),
                       "text": ["abc"]})
    ds = rd.from_pandas(df)
    idx = str(tmp_path / "trgm2")
    build_trigram_index(ds, idx, num_buckets=4)
    with pytest.raises(ValueError, match="needle"):
        search_trigram_index(idx, "ab", ds)


def test_multi_needle_matches_single(ray_session, tmp_path):
    from dup_ocropy_ray.pipelines.textstats import (
        search_trigram_index_multi)

    texts = ["the quick brown fox", "a quick one", "nothing here",
             "brown paper bag", None, ""]
    df = pd.DataFrame({"doc_id": pd.Series(range(6), dtype="int64"),
                       "text": texts})
    ds = rd.from_pandas(df)
    idx = str(tmp_path / "trgm3")
    build_trigram_index(ds, idx, num_buckets=8)
    needles = ["quick", "brown", "zzz"]
    multi = search_trigram_index_multi(idx, needles, ds)
    for n in needles:
        got = multi.loc[multi.needle == n, "doc_id"].tolist()
        want = search_trigram_index(idx, n, ds)["doc_id"].tolist()
        assert got == want, n
    with pytest.raises(ValueError, match="needle"):
        search_trigram_index_multi(idx, ["ok", "ab"], ds)
