"""Streaming windowed aggregation with watermarks
(state/stream_window.py): finalized windows must equal a batch
recompute over the admitted rows, late rows route to the side channel
exactly once, emission is exactly-once across finalize calls, results
are shard-count invariant, and snapshot/restore resumes mid-stream."""

import numpy as np
import pandas as pd
import pytest

from dup_ocropy_ray.state.stream_window import StreamWindowAgg

W = 3_600_000_000  # 1h windows
LATE = 1_800_000_000  # 30min lateness


def _stream(seed=0, n=5000, span_hours=48, jitter_us=20 * 60 * 1_000_000):
    """Event stream in rough arrival order: event time = arrival time
    minus a bounded jitter (out of order within the lateness bound)."""
    rng = np.random.RandomState(seed)
    arrive = np.sort(rng.randint(0, span_hours * W, n).astype(np.int64))
    ts = arrive - rng.randint(0, jitter_us, n).astype(np.int64)
    ts = np.maximum(ts, 0)
    return pd.DataFrame({
        "key": rng.choice(["a", "b", "c"], n),
        "ts": ts,
        "value": rng.randint(0, 100, n).astype(np.int64)})


def _run_stream(df, num_shards, batch=500):
    agg = StreamWindowAgg(window_us=W, allowed_lateness_us=LATE,
                          num_shards=num_shards)
    finals = []
    for i in range(0, len(df), batch):
        agg.ingest(df.iloc[i:i + batch].reset_index(drop=True))
        finals.append(agg.finalize_ready())
    return agg, pd.concat(finals, ignore_index=True)


def _batch_recompute(df):
    g = df.copy()
    g["window_start"] = (g["ts"] // W) * W
    out = (g.groupby(["key", "window_start"], as_index=False)
           .agg(n_events=("value", "count"), sum_value=("value", "sum")))
    return out.astype({"window_start": "int64", "n_events": "int64",
                       "sum_value": "int64"})


def test_stream_matches_batch_recompute(ray_session):
    df = _stream()
    agg, finals = _run_stream(df, num_shards=4)
    # drain everything still open at end of stream
    tail = agg.finalize_ready()  # no-op: watermark unchanged
    assert len(tail) == 0
    late = agg.late_rows()
    assert len(late) == 0  # jitter < lateness: nothing is late
    # finalized + still-open must equal the batch recompute; windows
    # near the stream end are legitimately still open
    exp = _batch_recompute(df)
    merged = finals.merge(exp, on=["key", "window_start"],
                          suffixes=("", "_exp"))
    assert len(merged) == len(finals)
    assert (merged["n_events"] == merged["n_events_exp"]).all()
    assert (merged["sum_value"] == merged["sum_value_exp"]).all()
    # everything past the final watermark cut is the only gap
    cut = agg.watermark() - LATE
    missing = exp.merge(finals[["key", "window_start"]],
                        on=["key", "window_start"], how="left",
                        indicator=True)
    assert (missing.loc[missing["_merge"] == "left_only",
                        "window_start"].to_numpy() + W > cut).all()


def test_exactly_once_emission(ray_session):
    df = _stream(seed=1, n=2000)
    agg, finals = _run_stream(df, num_shards=2)
    dup = finals.groupby(["key", "window_start"]).size()
    assert (dup == 1).all()
    # immediate re-finalize emits nothing new
    assert len(agg.finalize_ready()) == 0


def test_shard_count_invariance(ray_session):
    df = _stream(seed=2, n=3000)
    _, f1 = _run_stream(df, num_shards=1)
    _, f4 = _run_stream(df, num_shards=5)
    key = ["key", "window_start"]
    pd.testing.assert_frame_equal(
        f1.sort_values(key).reset_index(drop=True),
        f4.sort_values(key).reset_index(drop=True))


def test_late_rows_routed_not_counted(ray_session):
    agg = StreamWindowAgg(window_us=W, allowed_lateness_us=LATE,
                          num_shards=2)
    agg.ingest(pd.DataFrame({"key": ["a"], "ts": np.int64([10 * W]),
                             "value": np.int64([5])}))
    fin = agg.finalize_ready()  # cut = 10W - LATE: window 0 closed long ago
    # a row for hour 0 now arrives: far past lateness -> late channel
    agg.ingest(pd.DataFrame({"key": ["a"], "ts": np.int64([100]),
                             "value": np.int64([7])}))
    late = agg.late_rows()
    assert late["ts"].tolist() == [100]
    assert (late["late_by_us"] > 0).all()
    # and it never appears in a finalized window
    agg.ingest(pd.DataFrame({"key": ["a"], "ts": np.int64([20 * W]),
                             "value": np.int64([1])}))
    fin2 = agg.finalize_ready()
    all_fin = pd.concat([fin, fin2])
    assert 0 not in all_fin["window_start"].tolist()


def test_snapshot_restore_resumes_exactly(ray_session, tmp_path):
    df = _stream(seed=3, n=3000)
    half = len(df) // 2
    # reference: uninterrupted run
    _, ref = _run_stream(df, num_shards=3, batch=500)
    # interrupted run: ingest half, snapshot, restore into a NEW agg
    agg1 = StreamWindowAgg(window_us=W, allowed_lateness_us=LATE,
                           num_shards=3)
    finals = []
    for i in range(0, half, 500):
        agg1.ingest(df.iloc[i:i + 500].reset_index(drop=True))
        finals.append(agg1.finalize_ready())
    root = str(tmp_path / "ckpt")
    agg1.save(root)
    agg2 = StreamWindowAgg(window_us=W, allowed_lateness_us=LATE,
                           num_shards=3)
    agg2.restore(root)
    for i in range(half, len(df), 500):
        agg2.ingest(df.iloc[i:i + 500].reset_index(drop=True))
        finals.append(agg2.finalize_ready())
    got = pd.concat(finals, ignore_index=True)
    key = ["key", "window_start"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        ref.sort_values(key).reset_index(drop=True))
    # mismatched config refuses
    agg3 = StreamWindowAgg(window_us=W, allowed_lateness_us=LATE,
                           num_shards=2)
    with pytest.raises(RuntimeError, match="different shard count"):
        agg3.restore(root)
