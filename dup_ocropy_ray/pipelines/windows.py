"""Ordered-window operators Ray Data lacks natively: gap-based
sessionization, per-key rolling windows, and an as-of join.

All three share one partitioning assumption: rows for a key fit in one
group (per-user event history, per-customer order history). Each is a
``groupby(key).map_groups`` — a single hash shuffle on the key — with the
windowed logic vectorized (numpy searchsorted / sliding windows) inside
the group. The reference's only windowed op is the training-diagnostics
moving average (ocrolib/common.py:871-882 ``MovingStats``), generalized
here to the event-stream shape a training-data pipeline needs.

At skew (one user with millions of events) the group no longer fits:
salt the key by time-bucket and stitch session boundaries across salt
buckets in a second tiny pass — documented, not needed at these scales.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd


def sessionize(
    events: rd.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: pd.Timedelta = pd.Timedelta(minutes=30),
) -> rd.Dataset:
    """Per-key gap sessionization -> (key, n_sessions, max_session_events,
    n_events). A new session starts when the time since the previous
    event (ordered by ts) exceeds ``gap``."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g[ts_col].to_numpy())
        if len(ts) == 0:
            return pd.DataFrame()
        brk = np.empty(len(ts), dtype=bool)
        brk[0] = True
        brk[1:] = np.diff(ts) > np.timedelta64(int(gap.total_seconds() * 1e6), "us")
        sid = np.cumsum(brk)
        sizes = np.bincount(sid)[1:]
        return pd.DataFrame(
            {
                key_col: [g[key_col].iloc[0]],
                "n_sessions": [int(sid[-1])],
                "max_session_events": [int(sizes.max())],
                "n_events": [len(ts)],
            }
        )

    return events.groupby(key_col).map_groups(per_key, batch_format="pandas")


def rolling_last(
    events: rd.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window: int = 4,
) -> rd.Dataset:
    """Rolling mean over the trailing ``window`` events per key, ordered
    by (ts, tie-break cols); returns the FINAL window's mean per key —
    (key, last_ma). MovingStats equivalent (common.py:871-882)."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        v = g[value_col].to_numpy(dtype=np.float64)
        tail = v[-window:] if len(v) else np.array([0.0])
        return pd.DataFrame(
            {key_col: [g[key_col].iloc[0]], "last_ma": [float(tail.mean())]}
        )

    return events.groupby(key_col).map_groups(per_key, batch_format="pandas")


def asof_join_aggregate(
    events: rd.Dataset,
    orders: rd.Dataset,
    group_col: str = "event_type",
) -> pd.DataFrame:
    """As-of join: each event matches the LATEST order of the same
    customer with o_orderdate <= ts (tie-break: max o_orderkey), where
    custkey = user_id + 1. Aggregated to (event_type, n_events,
    n_matched, sum_price_cents).

    Implementation: both sides tagged and unioned, ONE hash shuffle on
    the key, per-key vectorized searchsorted of event timestamps into the
    (orderdate, orderkey)-sorted order history. No broadcast — scales to
    arbitrarily many keys."""
    import pyarrow as pa

    def tag_events(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "k": pc.add(b.column("user_id"), 1),
                "side": pa.array(["e"] * b.num_rows),
                "ts": b.column("ts"),
                "grp": b.column(group_col),
                "okey": pa.nulls(b.num_rows, pa.int64()),
                "price": pa.nulls(b.num_rows, pa.float64()),
            }
        )

    def tag_orders(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": b.column("o_custkey"),
                "side": pa.array(["o"] * b.num_rows),
                "ts": b.column("o_orderdate"),
                "grp": pa.nulls(b.num_rows, pa.string()),
                "okey": b.column("o_orderkey"),
                "price": b.column("o_totalprice"),
            }
        )

    both = events.map_batches(tag_events, batch_format="pyarrow").union(
        orders.map_batches(tag_orders, batch_format="pyarrow")
    )

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        ev = g[g["side"] == "e"]
        od = g[g["side"] == "o"].sort_values(["ts", "okey"])
        if len(ev) == 0:
            return pd.DataFrame()
        if len(od) == 0:
            return pd.DataFrame(
                {
                    "grp": ev["grp"],
                    "matched": np.zeros(len(ev), dtype=bool),
                    "cents": np.zeros(len(ev), dtype=np.int64),
                }
            )
        od_ts = od["ts"].to_numpy()
        idx = np.searchsorted(od_ts, ev["ts"].to_numpy(), side="right") - 1
        matched = idx >= 0
        price = od["price"].to_numpy(dtype=np.float64)
        cents = np.zeros(len(ev), dtype=np.int64)
        cents[matched] = np.floor(price[idx[matched]] * 100).astype(np.int64)
        return pd.DataFrame({"grp": ev["grp"].values, "matched": matched,
                             "cents": cents})

    rows = both.groupby("k").map_groups(per_key, batch_format="pandas")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("grp", as_index=False).agg(
            n_events=("grp", "size"),
            n_matched=("matched", "sum"),
            sum_price_cents=("cents", "sum"),
        )
        return g

    parts = rows.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("grp", as_index=False).sum()
    return pd.DataFrame(
        {
            "event_type": out["grp"],
            "n_events": out["n_events"].astype("int64"),
            "n_matched": out["n_matched"].astype("int64"),
            "sum_price_cents": out["sum_price_cents"].astype("int64"),
        }
    )


def range_join_aggregate(
    orders: rd.Dataset,
    window_days: int = 90,
) -> pd.DataFrame:
    """Range (interval) self-join: each order matches the same customer's
    FOLLOW-UP orders with o_orderdate in [own date, own date +
    window_days), excluding itself. Aggregated to (o_orderpriority of the
    anchor order, n_pairs, sum_price_cents).

    Scale shape: ONE hash shuffle on the customer key, then per-key
    vectorized interval resolution — order dates sorted once per key,
    each anchor's window resolved with two searchsorteds and a prefix
    cumsum for the price sum (self-pair subtracted exactly). No
    broadcast, no per-pair materialization: a customer with m orders
    costs O(m log m), not O(m^2)."""
    import pyarrow as pa

    def tag(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": b.column("o_custkey"),
                "ts": b.column("o_orderdate"),
                "grp": b.column("o_orderpriority"),
                "price": b.column("o_totalprice"),
            }
        )

    tagged = orders.map_batches(tag, batch_format="pyarrow")
    win = np.timedelta64(window_days, "D")

    _EMPTY = pd.DataFrame(
        {
            "grp": pd.Series([], dtype="object"),
            "n_pairs": pd.Series([], dtype="int64"),
            "cents": pd.Series([], dtype="int64"),
        }
    )

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        ts = g["ts"].to_numpy()
        cents = np.floor(g["price"].to_numpy(dtype=np.float64) * 100).astype(
            np.int64
        )
        cs = np.concatenate([[0], np.cumsum(cents)])
        lo = np.searchsorted(ts, ts, side="left")
        hi = np.searchsorted(ts, ts + win, side="left")
        # every anchor's own row lies in [lo, hi): subtract the self-pair
        n = hi - lo - 1
        keep = n > 0
        return pd.DataFrame(
            {
                "grp": g["grp"].to_numpy()[keep],
                "n_pairs": n[keep],
                "cents": cs[hi[keep]] - cs[lo[keep]] - cents[keep],
            }
        )

    rows = tagged.groupby("k").map_groups(per_key, batch_format="pandas")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return _EMPTY
        return b.groupby("grp", as_index=False).agg(
            n_pairs=("n_pairs", "sum"), cents=("cents", "sum")
        )

    parts = rows.map_batches(partial, batch_format="pandas").to_pandas()
    if len(parts) == 0 or "grp" not in parts.columns:
        parts = _EMPTY
    out = parts.groupby("grp", as_index=False).agg(
        n_pairs=("n_pairs", "sum"), cents=("cents", "sum")
    )
    return pd.DataFrame(
        {
            "o_orderpriority": out["grp"],
            "n_pairs": out["n_pairs"].astype("int64"),
            "sum_price_cents": out["cents"].astype("int64"),
        }
    ).sort_values("o_orderpriority").reset_index(drop=True)
