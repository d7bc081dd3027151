"""Schema-evolution parquet reader (sources/evolving.py): promotion
lattice, unified read with null fill, pruned scans over files that
predate a column, and loud conflict errors."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dup_ocropy_ray.sources.evolving import (
    _promote,
    read_parquet_evolving,
    unify_parquet_schemas,
)


def test_promotion_lattice():
    assert _promote(pa.int32(), pa.int64()) == pa.int64()
    assert _promote(pa.int8(), pa.int16()) == pa.int16()
    assert _promote(pa.uint16(), pa.uint32()) == pa.uint32()
    assert _promote(pa.float32(), pa.float64()) == pa.float64()
    assert _promote(pa.int64(), pa.float32()) == pa.float64()
    assert _promote(pa.null(), pa.string()) == pa.string()
    assert _promote(pa.string(), pa.string()) == pa.string()
    with pytest.raises(TypeError, match="promotion lattice"):
        _promote(pa.string(), pa.int64())


@pytest.fixture()
def generations(tmp_path):
    d = tmp_path / "gens"
    d.mkdir()
    pq.write_table(pa.table({
        "a": pa.array([1, 2], pa.int32()),
        "b": pa.array(["x", "y"])}), d / "g0.parquet")
    pq.write_table(pa.table({
        "a": pa.array([3], pa.int64()),
        "b": pa.array(["z"]),
        "c": pa.array([1.5], pa.float32())}), d / "g1.parquet")
    pq.write_table(pa.table({
        "a": pa.array([4], pa.int64()),
        "c": pa.array([2.5], pa.float64())}), d / "g2.parquet")
    return str(d)


def test_unify_schema_first_seen_order(generations):
    paths = sorted(os.path.join(generations, f)
                   for f in os.listdir(generations))
    sch = unify_parquet_schemas(paths)
    assert sch.names == ["a", "b", "c"]
    assert sch.field("a").type == pa.int64()
    assert sch.field("c").type == pa.float64()


def test_evolving_read_null_fill_and_promotion(generations, ray_session):
    df = (read_parquet_evolving(generations).to_pandas()
          .sort_values("a").reset_index(drop=True))
    assert df["a"].tolist() == [1, 2, 3, 4]
    assert str(df["a"].dtype) == "int64"
    assert df["b"].tolist()[:3] == ["x", "y", "z"] and pd.isna(df["b"][3])
    assert pd.isna(df["c"][0]) and df["c"].tolist()[2:] == [1.5, 2.5]


def test_evolving_read_pruned_over_missing_column(generations, ray_session):
    df = (read_parquet_evolving(generations, columns=["a", "c"])
          .to_pandas().sort_values("a").reset_index(drop=True))
    assert list(df.columns) == ["a", "c"]
    assert pd.isna(df["c"][0]) and df["c"][3] == 2.5
    with pytest.raises(KeyError, match="not in any generation"):
        read_parquet_evolving(generations, columns=["zz"])


def test_evolving_read_conflict_raises(generations, ray_session):
    pq.write_table(pa.table({"b": pa.array([7], pa.int64())}),
                   os.path.join(generations, "bad.parquet"))
    with pytest.raises(TypeError, match="promotion lattice"):
        read_parquet_evolving(generations)
