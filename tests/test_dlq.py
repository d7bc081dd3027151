"""Dead-letter quarantine stage (stages/dlq.py): poison rows isolated
by bisection, healthy rows unchanged, schema stable in every failure
mix, and the end-to-end fork through Ray Data."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from dup_ocropy_ray.stages.dlq import split_dead_letters, with_dead_letters

POISON = (7, 13, 14, 15, 99)
SCHEMA = {"doc_id": "Int64", "double": "Int64"}


def _make_fn():
    # local closure: Ray workers cannot import the tests package, so
    # the UDF must pickle by value
    poison = set(POISON)

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(np.int64)
        bad = np.isin(ids, list(poison))
        if bad.any():
            raise ValueError(f"cannot parse doc {ids[bad][0]}")
        return pd.DataFrame({"doc_id": ids, "double": ids * 2})

    return fn


def test_dlq_isolates_poison_rows():
    wrapped = with_dead_letters(_make_fn(), SCHEMA)
    b = pd.DataFrame({"doc_id": np.arange(100, dtype=np.int64)})
    out = wrapped(b)
    dead = out[out["_dlq_error"].notna()]
    ok = out[out["_dlq_error"].isna()]
    assert set(dead["_dlq_id"].astype(int)) == {7, 13, 14, 15, 99}
    assert (dead["_dlq_error"].str.startswith("ValueError")).all()
    assert len(ok) == 95
    assert (ok["double"].astype(int).to_numpy()
            == ok["doc_id"].astype(int).to_numpy() * 2).all()


def test_dlq_all_poison_batch_keeps_schema():
    wrapped = with_dead_letters(_make_fn(), SCHEMA)
    b = pd.DataFrame({"doc_id": np.int64([13, 14])})
    out = wrapped(b)
    assert list(out.columns) == ["doc_id", "double", "_dlq_id",
                                 "_dlq_error"]
    assert out["_dlq_error"].notna().all()
    assert out["doc_id"].isna().all()


def test_dlq_healthy_batch_passthrough():
    wrapped = with_dead_letters(_make_fn(), SCHEMA)
    b = pd.DataFrame({"doc_id": np.int64([1, 2, 3])})
    out = wrapped(b)
    assert out["_dlq_error"].isna().all()
    assert out["double"].astype(int).tolist() == [2, 4, 6]


def test_dlq_end_to_end_fork(ray_session):
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64)})
    ).repartition(8)
    staged = ds.map_batches(with_dead_letters(_make_fn(), SCHEMA),
                            batch_format="pandas")
    ok, dead = split_dead_letters(staged)
    okdf = ok.to_pandas()
    deaddf = dead.to_pandas()
    assert len(okdf) == 200 - len(POISON)
    assert set(deaddf["_dlq_id"].astype(int)) == set(POISON)
    assert set(okdf.columns) == {"doc_id", "double"}
