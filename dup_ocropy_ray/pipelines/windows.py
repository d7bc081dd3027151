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

from ..functions import hashing


def part_tag(k: np.ndarray, num_partitions: int) -> np.ndarray:
    """Knuth multiplicative partition tag for int64 keys — the ONE
    implementation of the `(k * 2654435761 % 2^32) % n` idiom the
    SQL twins replicate (new call sites use this; the literal form
    predates it at several older sites)."""
    return (k * 2654435761 % 4294967296) % num_partitions


def compose_sort_keys(kid: np.ndarray, nts_us: np.ndarray, extra_us: int = 0):
    """Compose (key-rank, µs-timestamp) into ONE int64 sort key with
    overflow-checked headroom: returns ``(comb, span, div)`` where
    ``comb = kid * span + nts_us // div``.

    ``kid`` must be dense ranks (np.unique return_inverse).  The naive
    ``kid * span`` silently wraps int64 once ``n_keys * time_span_us``
    exceeds 2**63 (~40k keys/partition over 7 years at µs resolution), so
    when µs doesn't fit we coarsen the timestamp resolution (ms → s → min
    → h → day) — exact whenever every timestamp and the window are
    aligned to the coarser unit (always true for date/second-resolution
    data) — and raise OverflowError with a num_partitions hint otherwise
    rather than return wrong joins."""
    n_keys = int(kid.max()) + 1 if len(kid) else 1
    tmax = int(nts_us.max()) if len(nts_us) else 0
    for div in (1, 1_000, 1_000_000, 60_000_000,
                3_600_000_000, 86_400_000_000):
        span = tmax // div + extra_us // div + 2
        if n_keys * span >= 2**63:
            continue
        if div > 1 and (extra_us % div or (nts_us % div).any()):
            raise OverflowError(
                f"compose_sort_keys: {n_keys} keys x {tmax}us span "
                f"overflows int64 at full resolution and timestamps are "
                f"not aligned to {div}us; increase num_partitions"
            )
        comb = kid.astype(np.int64) * np.int64(span) + nts_us // div
        return comb, np.int64(span), np.int64(div)
    raise OverflowError(
        f"compose_sort_keys: {n_keys} keys x {tmax}us span overflows "
        f"int64 even at day resolution; increase num_partitions"
    )


def sessionize(
    events: rd.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: pd.Timedelta = pd.Timedelta(minutes=30),
    num_partitions: int = 32,
) -> rd.Dataset:
    """Per-key gap sessionization -> (key, n_sessions, max_session_events,
    n_events). A new session starts when the time since the previous
    event (ordered by ts) exceeds ``gap``.

    Scale shape: hash shuffle into ``num_partitions`` buckets, then ONE
    vectorized pass per partition — events lexsorted by (key, ts),
    session breaks found with a single diff, per-key stats with
    bincount/reduceat at key boundaries. Never one UDF call per key."""
    gap_us = np.int64(gap.total_seconds() * 1e6)

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        k = b[key_col].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "part": (k * 2654435761 % 4294967296) % num_partitions,
                "k": k,
                "ts": b[ts_col],
            }
        )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {key_col: pd.Series([], dtype="int64"),
                 "n_sessions": pd.Series([], dtype="int64"),
                 "max_session_events": pd.Series([], dtype="int64"),
                 "n_events": pd.Series([], dtype="int64")}
            )
        k = g["k"].to_numpy(np.int64)
        nts = (g["ts"].to_numpy() - g["ts"].to_numpy().min()).astype(
            "timedelta64[us]"
        ).astype(np.int64)
        order = np.lexsort((nts, k))
        ks, ts = k[order], nts[order]
        new_key = np.empty(len(ks), dtype=bool)
        new_key[0] = True
        new_key[1:] = ks[1:] != ks[:-1]
        brk = new_key.copy()
        brk[1:] |= (ts[1:] - ts[:-1]) > gap_us
        sid = np.cumsum(brk) - 1
        sess_sizes = np.bincount(sid)
        # sessions are contiguous per key: session's key = key at its start
        sess_key_start = np.nonzero(brk)[0]
        key_start = np.nonzero(new_key)[0]
        # per-key session counts: which key block each session start falls in
        key_of_sess = np.searchsorted(key_start, sess_key_start, side="right") - 1
        n_sessions = np.bincount(key_of_sess, minlength=len(key_start))
        sess_bounds = np.searchsorted(key_of_sess, np.arange(len(key_start)))
        max_sess = np.maximum.reduceat(sess_sizes, sess_bounds)
        n_events = np.diff(np.append(key_start, len(ks)))
        return pd.DataFrame(
            {
                key_col: ks[key_start],
                "n_sessions": n_sessions.astype(np.int64),
                "max_session_events": max_sess.astype(np.int64),
                "n_events": n_events.astype(np.int64),
            }
        )

    return (
        events.map_batches(tag, batch_format="pandas")
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
    )


def rolling_last(
    events: rd.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window: int = 4,
    num_partitions: int = 32,
) -> rd.Dataset:
    """Rolling mean over the trailing ``window`` events per key, ordered
    by ts; returns the FINAL window's mean per key — (key, last_ma).
    MovingStats equivalent (common.py:871-882). Partition-vectorized:
    one lexsort per bucket, tail means via prefix sums at key ends."""

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        k = b[key_col].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "part": (k * 2654435761 % 4294967296) % num_partitions,
                "k": k,
                "ts": b[ts_col],
                "v": b[value_col].astype(np.float64),
            }
        )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {key_col: pd.Series([], dtype="int64"),
                 "last_ma": pd.Series([], dtype="float64")}
            )
        k = g["k"].to_numpy(np.int64)
        nts = (g["ts"].to_numpy() - g["ts"].to_numpy().min()).astype(
            "timedelta64[us]"
        ).astype(np.int64)
        order = np.lexsort((nts, k))
        ks, v = k[order], g["v"].to_numpy(np.float64)[order]
        new_key = np.empty(len(ks), dtype=bool)
        new_key[0] = True
        new_key[1:] = ks[1:] != ks[:-1]
        key_start = np.nonzero(new_key)[0]
        key_end = np.append(key_start[1:], len(ks))  # exclusive
        cs = np.concatenate([[0.0], np.cumsum(v)])
        tail_start = np.maximum(key_start, key_end - window)
        means = (cs[key_end] - cs[tail_start]) / (key_end - tail_start)
        return pd.DataFrame({key_col: ks[key_start], "last_ma": means})

    return (
        events.map_batches(tag, batch_format="pandas")
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
    )


def asof_join_aggregate(
    events: rd.Dataset,
    orders: rd.Dataset,
    group_col: str = "event_type",
    num_partitions: int = 32,
    direction: str = "backward",
) -> pd.DataFrame:
    """As-of join: each event matches the LATEST order of the same
    customer with o_orderdate <= ts (tie-break: max o_orderkey), where
    custkey = user_id + 1. Aggregated to (event_type, n_events,
    n_matched, sum_price_cents).

    ``direction="forward"`` flips the match to the EARLIEST order with
    o_orderdate >= ts (tie-break: min o_orderkey) — same shuffle, same
    lexsorted history, just the other searchsorted side.

    Scale shape: both sides tagged and unioned, ONE hash shuffle into
    ``num_partitions`` buckets (never one group per key — per-group UDF
    overhead measured 4-5x), then fully vectorized per partition: keys
    rank-encoded and composed with the microsecond timestamp into one
    int64 sort key; every event resolves with a single searchsorted
    against the (key, date, orderkey)-lexsorted order history."""
    import pyarrow as pa

    def tag_events(b: pd.DataFrame) -> pd.DataFrame:
        k = b["user_id"].to_numpy(np.int64) + 1
        return pd.DataFrame(
            {
                "part": (k * 2654435761 % 4294967296) % num_partitions,
                "k": k,
                "side": "e",
                "ts": b["ts"],
                "grp": b[group_col],
                "okey": np.int64(0),
                "price": 0.0,
            }
        )

    def tag_orders(b: pd.DataFrame) -> pd.DataFrame:
        k = b["o_custkey"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "part": (k * 2654435761 % 4294967296) % num_partitions,
                "k": k,
                "side": "o",
                "ts": b["o_orderdate"],
                "grp": "",
                "okey": b["o_orderkey"].to_numpy(np.int64),
                "price": b["o_totalprice"],
            }
        )

    both = events.map_batches(tag_events, batch_format="pandas").union(
        orders.map_batches(tag_orders, batch_format="pandas")
    )

    _EMPTY = pd.DataFrame(
        {
            "grp": pd.Series([], dtype="object"),
            "matched": pd.Series([], dtype="int64"),
            "cents": pd.Series([], dtype="int64"),
        }
    )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        ev = g[g["side"] == "e"]
        od = g[g["side"] == "o"]
        if len(ev) == 0:
            return _EMPTY
        if len(od) == 0:
            return pd.DataFrame(
                {
                    "grp": ev["grp"].to_numpy(),
                    "matched": np.zeros(len(ev), dtype=np.int64),
                    "cents": np.zeros(len(ev), dtype=np.int64),
                }
            )
        allk = np.concatenate([ev["k"].to_numpy(np.int64),
                               od["k"].to_numpy(np.int64)])
        _, kid_all = np.unique(allk, return_inverse=True)
        kid_e, kid_o = kid_all[: len(ev)], kid_all[len(ev) :]
        all_ts = np.concatenate([ev["ts"].to_numpy(), od["ts"].to_numpy()])
        tmin = all_ts.min()
        nts = (all_ts - tmin).astype("timedelta64[us]").astype(np.int64)
        comb_all, span, _div = compose_sort_keys(kid_all, nts)
        comb_e = comb_all[: len(ev)]
        comb_o = comb_all[len(ev) :]
        okey = od["okey"].to_numpy(np.int64)
        order = np.lexsort((okey, comb_o))  # date asc, okey asc within ties
        cs = comb_o[order]
        cents_o = np.floor(od["price"].to_numpy(np.float64) * 100).astype(
            np.int64
        )[order]
        if direction == "forward":
            # first order at-or-after: left insertion point; the lexsort
            # already puts min okey first within equal (key, ts)
            pos = np.searchsorted(cs, comb_e, side="left")
            valid = pos < len(cs)
            pos = np.minimum(pos, len(cs) - 1)
        else:
            pos = np.searchsorted(cs, comb_e, side="right") - 1
            valid = pos >= 0
            pos = np.maximum(pos, 0)
        # the candidate must belong to the event's key
        valid &= np.where(valid, cs[pos] // span == kid_e, False)
        cents = np.where(valid, cents_o[pos], 0)
        return pd.DataFrame(
            {
                "grp": ev["grp"].to_numpy(),
                "matched": valid.astype(np.int64),
                "cents": cents,
            }
        )

    rows = both.groupby("part").map_groups(per_part, batch_format="pandas")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"grp": pd.Series([], dtype="object"),
                 "n_events": pd.Series([], dtype="int64"),
                 "n_matched": pd.Series([], dtype="int64"),
                 "cents": pd.Series([], dtype="int64")}
            )
        return b.groupby("grp", as_index=False).agg(
            n_events=("grp", "size"),
            n_matched=("matched", "sum"),
            cents=("cents", "sum"),
        )

    parts = rows.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("grp", as_index=False).agg(
        n_events=("n_events", "sum"),
        n_matched=("n_matched", "sum"),
        cents=("cents", "sum"),
    )
    return pd.DataFrame(
        {
            "event_type": out["grp"],
            "n_events": out["n_events"].astype("int64"),
            "n_matched": out["n_matched"].astype("int64"),
            "sum_price_cents": out["cents"].astype("int64"),
        }
    ).sort_values("event_type").reset_index(drop=True)


def range_join_aggregate(
    orders: rd.Dataset,
    window_days: int = 90,
    num_partitions: int = 32,
) -> pd.DataFrame:
    """Range (interval) self-join: each order matches the same customer's
    FOLLOW-UP orders with o_orderdate in [own date, own date +
    window_days), excluding itself. Aggregated to (o_orderpriority of the
    anchor order, n_pairs, sum_price_cents).

    Scale shape: ONE hash shuffle into ``num_partitions`` buckets (NOT
    one group per key — per-group UDF overhead measured 4-5x on the
    dedup ops), then fully vectorized per partition: keys are
    rank-encoded and composed with the microsecond timestamp into a
    single int64 sort key, so every anchor's window resolves with two
    global searchsorteds and a prefix cumsum. A customer with m orders
    costs O(m log m), never O(m^2); no broadcast, no per-pair
    materialization. Int64 headroom is overflow-checked by
    compose_sort_keys (coarsens timestamp resolution when exact, raises
    when not) — never silently wraps."""
    win_us = np.int64(window_days) * 86_400_000_000

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        k = b["o_custkey"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "part": (k * 2654435761 % 4294967296) % num_partitions,
                "k": k,
                "ts": b["o_orderdate"],
                "grp": b["o_orderpriority"],
                "price": b["o_totalprice"],
            }
        )

    tagged = orders.map_batches(tag, batch_format="pandas")

    _EMPTY = pd.DataFrame(
        {
            "grp": pd.Series([], dtype="object"),
            "n_pairs": pd.Series([], dtype="int64"),
            "cents": pd.Series([], dtype="int64"),
        }
    )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return _EMPTY
        k = g["k"].to_numpy(np.int64)
        ts = g["ts"].to_numpy()
        nts = (ts - ts.min()).astype("timedelta64[us]").astype(np.int64)
        _, kid = np.unique(k, return_inverse=True)
        comb, span, div = compose_sort_keys(kid, nts, extra_us=int(win_us))
        win = win_us // div
        cents = np.floor(g["price"].to_numpy(dtype=np.float64) * 100).astype(
            np.int64
        )
        order = np.argsort(comb, kind="stable")
        cs = comb[order]
        cum = np.concatenate([[0], np.cumsum(cents[order])])
        lo = np.searchsorted(cs, comb, side="left")
        hi = np.searchsorted(cs, comb + win, side="left")
        # every anchor's own row lies in [lo, hi): subtract the self-pair
        n = hi - lo - 1
        keep = n > 0
        return pd.DataFrame(
            {
                "grp": g["grp"].to_numpy()[keep],
                "n_pairs": n[keep],
                "cents": cum[hi[keep]] - cum[lo[keep]] - cents[keep],
            }
        )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return _EMPTY
        return b.groupby("grp", as_index=False).agg(
            n_pairs=("n_pairs", "sum"), cents=("cents", "sum")
        )

    rows = tagged.groupby("part").map_groups(per_part, batch_format="pandas")
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


# ------------------------------------------------------------ ordered scan


def ordered_scan(
    ds: "rd.Dataset",
    order_col: str,
    sum_cols: tuple = (),
    max_cols: tuple = (),
) -> "rd.Dataset":
    """Distributed PREFIX SCAN over a global ordering — the streaming
    primitive behind watermarks and running totals, which no plain
    groupby can express (every row depends on ALL earlier rows).

    Three steps, none corpus-scale on the driver: (1) range-sort on
    ``order_col`` and materialize (fixes block boundaries); (2) one pass
    emits a per-BLOCK summary row (sums / maxima) — the driver reduce is
    one row per block; (3) block prefixes are broadcast and a second
    pass combines them with the in-block running scan. Scanned columns
    must be int64 (exact; float running sums are order-dependent).

    Adds, per scanned column: ``run_<c>`` = INCLUSIVE running sum,
    ``wm_<c>`` = EXCLUSIVE running max (the watermark BEFORE each row;
    int64-min sentinel for the first row)."""
    import ray

    _SENT = np.iinfo(np.int64).min
    s = ds.sort(order_col).materialize()

    def summarize(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"_min_id": pd.Series([], dtype="int64")} | {
                f"s_{c}": pd.Series([], dtype="int64") for c in sum_cols} | {
                f"m_{c}": pd.Series([], dtype="int64") for c in max_cols})
        row = {"_min_id": [np.int64(b[order_col].iloc[0])]}
        for c in sum_cols:
            row[f"s_{c}"] = [np.int64(b[c].sum())]
        for c in max_cols:
            row[f"m_{c}"] = [np.int64(b[c].max())]
        return pd.DataFrame(row)

    sums = (s.map_batches(summarize, batch_format="pandas", batch_size=None)
            .to_pandas().sort_values("_min_id"))
    # block prefixes are keyed by each block's FIRST order value, so the
    # order column must be unique (it is for event_id/doc_id); duplicate
    # keys straddling a block boundary would silently collide here
    if sums["_min_id"].duplicated().any():
        raise ValueError(
            f"ordered_scan requires unique values in {order_col!r}: "
            "duplicate keys cross block boundaries")
    pre: dict = {}
    for c in sum_cols:
        pre[("sum", c)] = dict(zip(
            sums["_min_id"],
            sums[f"s_{c}"].cumsum().shift(1).fillna(0).astype("int64")))
    for c in max_cols:
        pre[("max", c)] = dict(zip(
            sums["_min_id"],
            sums[f"m_{c}"].cummax().shift(1).fillna(_SENT).astype("int64")))
    pre_ref = ray.put(pre)

    def apply(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b
        P = ray.get(pre_ref)  # zero-copy block-prefix lookup per task
        first = np.int64(b[order_col].iloc[0])
        out = b.copy()
        for c in sum_cols:
            out[f"run_{c}"] = (np.cumsum(b[c].to_numpy(np.int64))
                               + P[("sum", c)][first])
        for c in max_cols:
            pref = P[("max", c)][first]
            r = np.maximum.accumulate(b[c].to_numpy(np.int64))
            # exclusive watermark: prior blocks' max folded into the
            # shifted in-block running max
            out[f"wm_{c}"] = np.concatenate(
                [[pref], np.maximum(r[:-1], pref)])
        return out

    return s.map_batches(apply, batch_format="pandas", batch_size=None)


def window_dedup_events(
    events: rd.Dataset,
    key_cols: tuple[str, str] = ("user_id", "event_type"),
    ts_col: str = "ts",
    id_col: str = "event_id",
    window: pd.Timedelta = pd.Timedelta(hours=1),
    num_partitions: int = 32,
) -> rd.Dataset:
    """Time-windowed event dedup: keep an event only if the PREVIOUS
    event with the same key (ordered by ts, id) is more than ``window``
    older (or absent) — the streaming-log shape of "suppress repeats
    within an hour".

    Same scale skeleton as sessionize: one hash shuffle of (key-hash %
    num_partitions), then per partition a single lexsort by (key, ts,
    id) + one vectorized diff; the survivor mask never leaves the
    partition. Key identity uses the raw columns (carried through the
    shuffle), not the coarse partition hash."""
    win_us = np.int64(window.total_seconds() * 1e6)
    k1, k2 = key_cols

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        h = hashing.hash_strings(
            b[k1].astype(str).str.cat(b[k2].astype(str), sep="\x1f")
            .to_numpy(dtype=object))
        out = b[[k1, k2, ts_col, id_col]].copy()
        out["_part"] = (h % np.uint64(num_partitions)).astype(np.int64)
        return out

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        cols = {
            k1: g[k1].to_numpy() if len(g) else np.array([], dtype=np.int64),
            k2: g[k2].to_numpy(dtype=object) if len(g) else np.array([], dtype=object),
            ts_col: g[ts_col].to_numpy() if len(g) else np.array([], dtype="datetime64[us]"),
            id_col: g[id_col].to_numpy(np.int64) if len(g) else np.array([], dtype=np.int64),
        }
        if len(g) == 0:
            return pd.DataFrame(cols).drop(columns=[])
        ts64 = cols[ts_col].astype("datetime64[us]").astype(np.int64)
        # dense rank of the composite key within the partition
        _, kid = np.unique(
            np.char.add(np.char.add(cols[k1].astype("U"), "\x1f"),
                        cols[k2].astype("U")), return_inverse=True)
        order = np.lexsort((cols[id_col], ts64, kid))
        ks, ts = kid[order], ts64[order]
        keep_sorted = np.empty(len(ks), dtype=bool)
        keep_sorted[0] = True
        keep_sorted[1:] = (ks[1:] != ks[:-1]) | (ts[1:] - ts[:-1] > win_us)
        keep = np.zeros(len(ks), dtype=bool)
        keep[order] = keep_sorted
        out = pd.DataFrame({c: v[keep] for c, v in cols.items()})
        return out

    tagged = events.map_batches(tag, batch_format="pandas", batch_size=65536)
    return tagged.groupby("_part").map_groups(
        per_part, batch_format="pandas")


def rate_limit_events(
    events: rd.Dataset,
    limit: int = 3,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    window: str = "h",
    num_partitions: int = 32,
) -> rd.Dataset:
    """Per-key per-window cap: keep at most ``limit`` events per
    (key, window-bucket), earliest first (order ts then id) — the
    ingestion rate-limit / per-user quota shape of streaming curation
    (SQL twin: QUALIFY row_number() OVER (PARTITION BY key,
    date_trunc(window, ts) ORDER BY ts, id) <= limit).

    Same scale skeleton as window_dedup_events: one key-hash shuffle,
    then per partition a single lexsort by (key, bucket, ts, id) and a
    vectorized running-count-within-group mask (cumcount via
    segment-start subtraction — no Python loop). The window bucket is a
    datetime truncation, so a key's events in one bucket always
    co-locate (they share the key hash)."""

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        h = (b[key_col].to_numpy(dtype="uint64")
             if np.issubdtype(b[key_col].dtype, np.integer)
             else hashing.hash_strings(
                 b[key_col].astype(str).to_numpy(dtype=object)))
        out = b[[key_col, ts_col, id_col]].copy()
        out["_part"] = (h % np.uint64(num_partitions)).astype(np.int64)
        return out

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return g.drop(columns=["_part"])
        key = g[key_col].to_numpy()
        ts = g[ts_col].to_numpy().astype("datetime64[us]")
        bucket = ts.astype(f"datetime64[{window}]").astype(np.int64)
        ts64 = ts.astype(np.int64)
        ids = g[id_col].to_numpy(np.int64)
        # dense rank of (key, bucket)
        _, kid = np.unique(
            np.char.add(np.char.add(key.astype("U"), "\x1f"),
                        bucket.astype("U")), return_inverse=True)
        order = np.lexsort((ids, ts64, kid))
        ks = kid[order]
        new = np.ones(len(ks), dtype=bool)
        new[1:] = ks[1:] != ks[:-1]
        idx = np.arange(len(ks), dtype=np.int64)
        starts = np.maximum.accumulate(np.where(new, idx, 0))
        cum = idx - starts  # 0-based rank within (key, bucket)
        keep = np.zeros(len(ks), dtype=bool)
        keep[order] = cum < limit
        return pd.DataFrame({
            key_col: key[keep],
            ts_col: ts[keep],
            id_col: ids[keep],
        })

    tagged = events.map_batches(tag, batch_format="pandas",
                                batch_size=65536)
    return tagged.groupby("_part").map_groups(
        per_part, batch_format="pandas")


def funnel_steps(
    events: rd.Dataset,
    steps: list[str],
    window: pd.Timedelta = pd.Timedelta(hours=24),
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    num_partitions: int = 32,
) -> pd.DataFrame:
    """Ordered funnel analysis: how many users reach each step, where
    step k+1 must occur strictly AFTER the user's step-k time and
    within ``window`` of it (earliest-completion semantics: step 1
    anchors at the user's first step-1 event; each later step at the
    first qualifying event). Returns (step_no, step, n_users).

    Scale shape: ONE key-hash shuffle co-locates each user's events;
    inside a partition the whole chain is a sequence of C-level
    groupby-min / map / filter passes across ALL its users at once (no
    per-user Python). The driver sees partitions x steps count rows."""
    win_us = np.int64(window.total_seconds() * 1e6)

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        out = b[[key_col, ts_col, type_col]]
        out = out[out[type_col].isin(steps)].copy()
        h = (out[key_col].to_numpy(dtype="uint64")
             if np.issubdtype(out[key_col].dtype, np.integer)
             else hashing.hash_strings(
                 out[key_col].astype(str).to_numpy(dtype=object)))
        out["_part"] = (h % np.uint64(num_partitions)).astype(np.int64)
        return out

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"step_no": pd.Series(dtype="int64"),
                                 "n_users": pd.Series(dtype="int64")})
        ts64 = g[ts_col].to_numpy().astype(
            "datetime64[us]").astype(np.int64)
        g = pd.DataFrame({"u": g[key_col].to_numpy(),
                          "t": ts64, "e": g[type_col].to_numpy()})
        # step 1: first occurrence per user
        cur = (g[g["e"] == steps[0]].groupby("u")["t"].min())
        counts = [len(cur)]
        for step in steps[1:]:
            ev = g[g["e"] == step]
            anchor = ev["u"].map(cur)
            ok = anchor.notna()
            t = ev["t"][ok]
            a = anchor[ok].astype(np.int64)
            qual = (t > a) & (t <= a + win_us)
            cur = (pd.DataFrame({"u": ev["u"][ok][qual],
                                 "t": t[qual]})
                   .groupby("u")["t"].min())
            counts.append(len(cur))
        return pd.DataFrame({
            "step_no": np.arange(1, len(steps) + 1, dtype=np.int64),
            "n_users": np.asarray(counts, dtype=np.int64),
        })

    parts = (events.map_batches(tag, batch_format="pandas",
                                batch_size=65536)
             .groupby("_part").map_groups(per_part, batch_format="pandas")
             .to_pandas())
    if "step_no" not in parts.columns:
        parts = pd.DataFrame({"step_no": pd.Series(dtype="int64"),
                              "n_users": pd.Series(dtype="int64")})
    agg = (parts.groupby("step_no", as_index=False)["n_users"].sum()
           .sort_values("step_no").reset_index(drop=True))
    full = pd.DataFrame({"step_no": np.arange(1, len(steps) + 1,
                                              dtype=np.int64),
                         "step": steps})
    out = full.merge(agg, on="step_no", how="left")
    out["n_users"] = out["n_users"].fillna(0).astype("int64")
    return out


def retention_days(
    events: rd.Dataset,
    max_offset: int = 6,
    key_col: str = "user_id",
    ts_col: str = "ts",
    num_partitions: int = 32,
) -> pd.DataFrame:
    """Cohort retention: for each day-offset 0..max_offset, how many
    users had any event exactly that many days after their own first
    active day (day-0 count == total users). Returns (day_offset,
    n_users).

    Scale shape: the tag pass truncates timestamps to DAYS per batch
    (so the shuffle ships (user, day) pairs pre-deduped per batch, not
    raw events), ONE user-hash shuffle co-locates each user's days, and
    a partition computes all its users' offsets with two C-level
    groupby passes; the driver sums partitions x offsets rows."""

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        day = (b[ts_col].to_numpy().astype("datetime64[D]")
               .astype(np.int64))
        out = pd.DataFrame({"u": b[key_col].to_numpy(), "d": day})
        out = out.drop_duplicates()
        h = (out["u"].to_numpy(dtype="uint64")
             if np.issubdtype(out["u"].dtype, np.integer)
             else hashing.hash_strings(
                 out["u"].astype(str).to_numpy(dtype=object)))
        out["_part"] = (h % np.uint64(num_partitions)).astype(np.int64)
        return out

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"day_offset": pd.Series(dtype="int64"),
                                 "n_users": pd.Series(dtype="int64")})
        g = g.drop_duplicates(["u", "d"])
        d0 = g.groupby("u")["d"].transform("min")
        off = (g["d"] - d0).to_numpy(np.int64)
        keep = off <= max_offset
        cnt = np.bincount(off[keep], minlength=max_offset + 1)
        return pd.DataFrame({
            "day_offset": np.arange(max_offset + 1, dtype=np.int64),
            "n_users": cnt.astype(np.int64),
        })

    parts = (events.map_batches(tag, batch_format="pandas",
                                batch_size=65536)
             .groupby("_part").map_groups(per_part, batch_format="pandas")
             .to_pandas())
    if "day_offset" not in parts.columns:
        return pd.DataFrame({"day_offset": pd.Series(dtype="int64"),
                             "n_users": pd.Series(dtype="int64")})
    return (parts.groupby("day_offset", as_index=False)["n_users"].sum()
            .sort_values("day_offset").reset_index(drop=True))


def rolling_distinct(
    events: rd.Dataset,
    window_hours: int = 3,
    key_col: str = "user_id",
    ts_col: str = "ts",
    num_partitions: int = 32,
) -> pd.DataFrame:
    """Sliding-window COUNT DISTINCT: for every hour bucket h, the
    number of distinct keys active in (h - window + 1 .. h] — the
    rolling-active-users shape an exact distinct can't get from
    per-hour counts (distincts don't sum). Returns (hour, n_keys) for
    every hour with at least one active window member.

    Scale shape: each batch pre-dedups to its (hour, key) pairs, then
    REPLICATES each pair to the ``window_hours`` windows it serves —
    shuffle traffic is window x per-batch-distinct pairs, never raw
    events. One (window-hour)-hash shuffle co-locates each window; a
    partition dedups (window, key) across batches and counts. The
    replicate-then-dedup trade is the standard exact sliding-distinct
    plan; for big windows switch to per-hour HLL sketches (mergeable,
    sketches.py) and pay the approximation instead."""

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        hour = (b[ts_col].to_numpy().astype("datetime64[h]")
                .astype(np.int64))
        pairs = pd.DataFrame({"h": hour,
                              "k": b[key_col].to_numpy()}).drop_duplicates()
        reps = []
        for d in range(window_hours):
            w = pairs.copy()
            w["w"] = w["h"] + d
            reps.append(w[["w", "k"]])
        out = pd.concat(reps, ignore_index=True).drop_duplicates()
        out["_part"] = (out["w"].to_numpy(dtype="uint64")
                        % np.uint64(num_partitions)).astype(np.int64)
        return out

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["w", "k"])
        c = d.groupby("w", sort=False).size().reset_index(name="n_keys")
        return c

    parts = (events.map_batches(tag, batch_format="pandas",
                                batch_size=65536)
             .groupby("_part").map_groups(per_part, batch_format="pandas")
             .to_pandas())
    if "w" not in parts.columns:
        return pd.DataFrame({"hour": pd.Series(dtype="datetime64[us]"),
                             "n_keys": pd.Series(dtype="int64")})
    out = parts.groupby("w", as_index=False)["n_keys"].sum()
    return (pd.DataFrame({
        "hour": out["w"].to_numpy("datetime64[h]").astype("datetime64[us]"),
        "n_keys": out["n_keys"].astype("int64"),
    }).sort_values("hour").reset_index(drop=True))


def attribution_credit(
    events: rd.Dataset,
    conv_type: str = "purchase",
    touch_types: tuple = ("click", "view"),
    lookback: pd.Timedelta = pd.Timedelta(days=7),
    num_partitions: int = 32,
) -> pd.DataFrame:
    """Marketing ATTRIBUTION: for every conversion event, credit the
    FIRST-touch and LAST-touch channel among the user's touch events in
    the lookback window ending at the conversion (ties at equal
    timestamps broken by event_id — first = smallest, last = largest).
    Returns (model, channel, n_conversions) counts.

    Scale shape: one user-hash shuffle co-locates each user's events;
    per partition BOTH models come from two searchsorted calls on the
    composed (user-rank, ts) key (window lower bound clamped to the
    user's block — no per-conversion loop, no touches x conversions
    pair materialization, which is what the SQL twin has to build).
    Driver combine is models x channels x partitions rows."""
    look_us = np.int64(lookback.total_seconds() * 1e6)
    kinds = [conv_type, *touch_types]

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        keep = b["event_type"].isin(kinds).to_numpy()
        k = b["user_id"].to_numpy(np.int64)[keep]
        return pd.DataFrame({
            "part": part_tag(k, num_partitions),
            "k": k,
            "ts": b["ts"].to_numpy()[keep],
            "eid": b["event_id"].to_numpy(np.int64)[keep],
            "et": b["event_type"].to_numpy(object)[keep],
        })

    empty = pd.DataFrame({"model": pd.Series([], dtype=object),
                          "channel": pd.Series([], dtype=object),
                          "n_conversions": pd.Series([], dtype="int64")})

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return empty.copy()
        k = g["k"].to_numpy(np.int64)
        ts = g["ts"].to_numpy().astype("datetime64[us]")
        nts = (ts - ts.min()).astype(np.int64)
        eid = g["eid"].to_numpy(np.int64)
        et = g["et"].to_numpy(object)
        _, kid = np.unique(k, return_inverse=True)
        comb, span, div = compose_sort_keys(kid, nts, extra_us=int(look_us))
        is_touch = np.isin(et, list(touch_types))
        is_conv = et == conv_type
        t_comb = comb[is_touch]
        t_order = np.lexsort((eid[is_touch], t_comb))
        t_comb = t_comb[t_order]
        t_et = et[is_touch][t_order]
        c_comb = comb[is_conv]
        c_block = kid[is_conv].astype(np.int64) * span
        lo = np.searchsorted(t_comb,
                             np.maximum(c_comb - look_us // div, c_block),
                             side="left")
        hi = np.searchsorted(t_comb, c_comb, side="right")
        valid = hi > lo
        frames = []
        for model, ch in (("first", t_et[lo[valid]]),
                          ("last", t_et[hi[valid] - 1])):
            vals, cnt = np.unique(ch.astype(str), return_counts=True)
            frames.append(pd.DataFrame({
                "model": model, "channel": vals,
                "n_conversions": cnt.astype("int64")}))
        return pd.concat(frames, ignore_index=True)

    parts = (events.map_batches(tag, batch_format="pandas")
             .groupby("part").map_groups(per_part, batch_format="pandas")
             .to_pandas())
    out = (parts.groupby(["model", "channel"], as_index=False)
           .agg(n_conversions=("n_conversions", "sum")))
    out["n_conversions"] = out["n_conversions"].astype("int64")
    return out.sort_values(["model", "channel"]).reset_index(drop=True)


def coalesce_intervals(
    events: rd.Dataset,
    ts_col: str = "ts",
    key_col: str = "user_id",
    dur_us_col: str = "dur_us",
    num_partitions: int = 32,
) -> pd.DataFrame:
    """Per-key INTERVAL COALESCING (gaps-and-islands): merge each key's
    overlapping-or-touching [ts, ts + dur) intervals into islands and
    report per key the island count and total covered microseconds.

    Scale shape: one key-hash shuffle, then a single vectorized pass
    per partition — intervals lexsorted by (key, start, end), the
    running maximum end computed ONCE with np.maximum.accumulate over
    keys made disjoint by the composed (key-rank, ts) keyspace (a new
    key's start always exceeds the previous key's offset block, so the
    cummax resets itself), islands cut where start > cummax(prev end).
    Nothing is per-row Python; driver sees keys-per-partition rows."""

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        k = b[key_col].to_numpy(np.int64)
        return pd.DataFrame({
            "part": part_tag(k, num_partitions),
            "k": k,
            "ts": b[ts_col],
            "dur": b[dur_us_col].to_numpy(np.int64),
        })

    empty = pd.DataFrame({key_col: pd.Series([], dtype="int64"),
                          "n_islands": pd.Series([], dtype="int64"),
                          "covered_us": pd.Series([], dtype="int64")})

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return empty.copy()
        k = g["k"].to_numpy(np.int64)
        ts = g["ts"].to_numpy().astype("datetime64[us]")
        nts = (ts - ts.min()).astype(np.int64)
        dur = g["dur"].to_numpy(np.int64)
        _, kid = np.unique(k, return_inverse=True)
        comb, span, div = compose_sort_keys(kid, nts,
                                            extra_us=int(dur.max()))
        if div != 1:
            # durations must survive the coarsening exactly
            if (dur % div).any():
                raise OverflowError(
                    "coalesce_intervals: durations not aligned to the "
                    "coarsened time unit; increase num_partitions")
        s = comb
        e = comb + dur // div
        order = np.lexsort((e, s))
        s, e, kid_s = s[order], e[order], kid[order]
        prev_max = np.maximum.accumulate(e)
        new_island = np.empty(len(s), dtype=bool)
        new_island[0] = True
        # strictly-greater start cuts an island; key changes always cut
        # (the composed keyspace makes a new key's s exceed every prior e)
        new_island[1:] = s[1:] > prev_max[:-1]
        isl_start = np.flatnonzero(new_island)
        min_s = s[isl_start]
        max_e = np.maximum.reduceat(e, isl_start)
        covered = (max_e - min_s) * div
        isl_kid = kid_s[isl_start]
        keys, inv = np.unique(isl_kid, return_inverse=True)
        n_islands = np.bincount(inv)
        # int64 accumulation (bincount's float weights would lose
        # exactness past 2^53 µs-sums)
        covered_by_key = np.zeros(len(keys), dtype=np.int64)
        np.add.at(covered_by_key, inv, covered)
        uniq_k = np.unique(k)
        return pd.DataFrame({
            key_col: uniq_k[keys],
            "n_islands": n_islands.astype("int64"),
            "covered_us": covered_by_key,
        })

    out = (events.map_batches(tag, batch_format="pandas")
           .groupby("part").map_groups(per_part, batch_format="pandas")
           .to_pandas())
    return out.sort_values(key_col).reset_index(drop=True)
