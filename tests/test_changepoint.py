"""Change-point query: value-exact against the DuckDB twin at sf0.001
plus a planted level shift the statistic must localize exactly."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_changepoint_oracle(ray_session):
    from dup_ocropy_ray.pipelines import queries as q

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF}/events.parquet')")
    got = _canon(q.q_changepoint(SF))
    want = _canon(con.sql(q.SQL_CHANGEPOINT).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_changepoint_planted_shift(ray_session, tmp_path):
    from dup_ocropy_ray.pipelines import queries as q

    # type "step": 2 events/hour for 48 h, then 10/hour for 48 h —
    # the max |n*P_k - k*T| split must land on the last low hour
    base = pd.Timestamp("2024-03-01").value // 1000
    hours = np.arange(96, dtype=np.int64)
    counts = np.where(hours < 48, 2, 10)
    ts = np.repeat(base + hours * 3_600_000_000, counts) + 5
    df = pd.DataFrame({
        "ts": ts.astype("datetime64[us]"),
        "event_type": "step"})
    d = tmp_path / "sf"
    os.makedirs(d)
    pq.write_table(pa.Table.from_pandas(df), d / "events.parquet")
    out = q.q_changepoint(str(d))
    assert len(out) == 1
    assert out["split_hour"].iloc[0] == pd.Timestamp("2024-03-02 23:00")
    # exact statistic at the planted split: |96*96 - 48*576|
    assert out["d_stat"].iloc[0] == abs(96 * 96 - 48 * 576)


def test_changepoint_single_hour_series_omitted(ray_session, tmp_path):
    from dup_ocropy_ray.pipelines import queries as q

    base = pd.Timestamp("2024-03-01").value // 1000
    # 'solo' has every event inside one hour -> no valid split; 'two'
    # spans two hours -> exactly one valid split
    ts = np.array([base + 10, base + 20, base + 30,
                   base + 40, base + 3_600_000_000 + 5], dtype=np.int64)
    df = pd.DataFrame({
        "ts": ts.astype("datetime64[us]"),
        "event_type": ["solo", "solo", "solo", "two", "two"]})
    d = tmp_path / "sf"
    os.makedirs(d)
    pq.write_table(pa.Table.from_pandas(df), d / "events.parquet")
    out = q.q_changepoint(str(d))
    assert out["event_type"].tolist() == ["two"]
    assert (out["d_stat"] >= 0).all()
