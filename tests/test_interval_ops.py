"""Interval-overlap join, gap fill, and max-concurrency sweep
(pipelines/windows.py) — brute-force / pandas parity on randomized
inputs plus the partitioning invariants (bucket width and block layout
must not change results)."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from dup_ocropy_ray.pipelines.windows import (
    gapfill_hourly,
    interval_overlap_join,
    max_concurrency,
)


def _mk_intervals(rng, n, off, short_us=200_000_000, long_us=7_000_000_000):
    s = rng.randint(0, 5_000_000_000, n).astype(np.int64)
    cap = np.where(rng.rand(n) < 0.8, short_us, long_us)
    d = (rng.randint(0, 7_000_000_000, n) % cap).astype(np.int64) + 1
    return pd.DataFrame({
        "id": np.arange(n, dtype=np.int64) * 2 + off,
        "key": rng.randint(0, 4, n).astype(np.int64),
        "s": s, "e": s + d})


def _brute_overlaps(A: pd.DataFrame, B: pd.DataFrame) -> pd.DataFrame:
    out = []
    for key in np.unique(A["key"]):
        a = A[A.key == key]
        b = B[B.key == key]
        m = ((a.s.values[:, None] < b.e.values[None, :])
             & (b.s.values[None, :] < a.e.values[:, None]))
        n = m.sum(1)
        sb = (m * b.id.values[None, :]).sum(1)
        keep = n > 0
        out.append(pd.DataFrame({"a_id": a.id.values[keep],
                                 "n_overlap": n[keep], "sum_b": sb[keep]}))
    return (pd.concat(out).astype("int64")
            .sort_values("a_id").reset_index(drop=True))


def test_interval_overlap_join_brute_force(ray_session):
    rng = np.random.RandomState(7)
    A = _mk_intervals(rng, 1500, 0)
    B = _mk_intervals(rng, 1500, 1)
    got = interval_overlap_join(
        rd.from_pandas(A).repartition(7),
        rd.from_pandas(B).repartition(5),
        bucket_us=500_000_000, num_partitions=13,
    ).to_pandas().sort_values("a_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, _brute_overlaps(A, B))


def test_interval_overlap_join_bucket_invariance(ray_session):
    rng = np.random.RandomState(11)
    A = _mk_intervals(rng, 400, 0)
    B = _mk_intervals(rng, 400, 1)
    ref = _brute_overlaps(A, B)
    for w, p in [(123_456_789, 5), (2_000_000_000, 3)]:
        got = interval_overlap_join(
            rd.from_pandas(A), rd.from_pandas(B),
            bucket_us=w, num_partitions=p,
        ).to_pandas().sort_values("a_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, ref)


def test_interval_overlap_join_rejects_empty_intervals(ray_session):
    A = pd.DataFrame({"id": np.int64([1]), "key": np.int64([0]),
                      "s": np.int64([10]), "e": np.int64([10])})
    B = pd.DataFrame({"id": np.int64([2]), "key": np.int64([0]),
                      "s": np.int64([0]), "e": np.int64([20])})
    with pytest.raises(Exception, match="empty or inverted"):
        interval_overlap_join(rd.from_pandas(A),
                              rd.from_pandas(B)).to_pandas()


def _pandas_gapfill(df: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for k, sub in df.groupby("event_type"):
        hr = sub.ts.values.astype("datetime64[h]")
        agg = (pd.DataFrame({"hr": hr, "n": 1, "c": sub.cents.values})
               .groupby("hr").agg(n_events=("n", "sum"),
                                  sum_cents=("c", "sum")))
        idx = pd.date_range(agg.index.min(), agg.index.max(), freq="h")
        agg = agg.reindex(idx, fill_value=0)
        ls = pd.Series(np.where(agg.n_events > 0, agg.index,
                                np.datetime64("NaT")),
                       index=agg.index).ffill()
        rows.append(pd.DataFrame({
            "event_type": k, "hr": agg.index.astype("datetime64[us]"),
            "n_events": agg.n_events.values.astype("int64"),
            "sum_cents": agg.sum_cents.values.astype("int64"),
            "last_seen": ls.values.astype("datetime64[us]")}))
    return (pd.concat(rows).sort_values(["event_type", "hr"])
            .reset_index(drop=True))


def test_gapfill_hourly_pandas_parity(ray_session):
    rng = np.random.RandomState(3)
    n = 3000
    base = np.int64(1_700_000_000_000_000)
    ts = base + rng.randint(0, 30 * 86_400_000_000, n).astype(np.int64)
    df = pd.DataFrame({
        "event_type": rng.choice(["a", "bb", "c"], n),
        "ts": ts.astype("datetime64[us]"),
        "cents": rng.randint(0, 5000, n).astype(np.int64)})
    got = gapfill_hourly(rd.from_pandas(df).repartition(9))
    exp = _pandas_gapfill(df)
    pd.testing.assert_frame_equal(got, exp)
    # sparse key: real gaps must appear as zero rows
    assert (exp.n_events == 0).any()


def test_gapfill_hourly_planted_gap(ray_session):
    ts = pd.to_datetime(["2024-01-01 00:10", "2024-01-01 03:20"]).astype(
        "datetime64[us]")
    df = pd.DataFrame({"event_type": ["x", "x"], "ts": ts,
                       "cents": np.int64([5, 7])})
    got = gapfill_hourly(rd.from_pandas(df))
    assert len(got) == 4  # hours 00..03 inclusive
    assert got["n_events"].tolist() == [1, 0, 0, 1]
    assert got["sum_cents"].tolist() == [5, 0, 0, 7]
    # staleness forward-fills hour 00 through the gap
    assert (got["last_seen"].iloc[2]
            == pd.Timestamp("2024-01-01 00:00"))


def test_max_concurrency_brute_force(ray_session):
    rng = np.random.RandomState(5)
    n = 4000
    base = np.int64(1_700_000_000_000_000)
    s = base + rng.randint(0, 4 * 86_400_000_000, n).astype(np.int64)
    e = s + rng.randint(1, 7_200_000_000, n).astype(np.int64)
    iv = pd.DataFrame({"key": rng.choice(["x", "y"], n), "s": s, "e": e})
    got = max_concurrency(rd.from_pandas(iv).repartition(7),
                          bucket_us=3_600_000_000)
    rows = []
    for k, sub in iv.groupby("key"):
        pts = pd.concat([pd.DataFrame({"t": sub.s, "d": 1}),
                         pd.DataFrame({"t": sub.e, "d": -1})])
        conc = pts.groupby("t", sort=True).d.sum().cumsum()
        m = conc.max()
        rows.append({"key": k, "max_concurrent": int(m),
                     "first_at": np.int64(
                         conc.index[np.argmax(conc.values == m)])})
    exp = pd.DataFrame(rows).astype({"max_concurrent": "int64"})
    exp["first_at"] = exp["first_at"].to_numpy(np.int64).astype(
        "datetime64[us]")
    pd.testing.assert_frame_equal(
        got, exp.sort_values("key").reset_index(drop=True))


def test_max_concurrency_half_open_boundary(ray_session):
    # [0, 10) and [10, 20) never overlap: close applies before open
    iv = pd.DataFrame({"key": ["k", "k"],
                       "s": np.int64([0, 10_000_000]),
                       "e": np.int64([10_000_000, 20_000_000])})
    got = max_concurrency(rd.from_pandas(iv))
    assert got["max_concurrent"].tolist() == [1]
    assert got["first_at"].iloc[0] == np.int64(0).astype("datetime64[us]")


def test_interval_overlap_join_single_dataset_form(ray_session):
    rng = np.random.RandomState(13)
    A = _mk_intervals(rng, 500, 0)
    B = _mk_intervals(rng, 500, 1)
    combined = pd.concat([A.assign(side=np.int8(0)),
                          B.assign(side=np.int8(1))], ignore_index=True)
    got = interval_overlap_join(
        rd.from_pandas(combined).repartition(6),
        bucket_us=700_000_000, num_partitions=9,
    ).to_pandas().sort_values("a_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, _brute_overlaps(A, B))
