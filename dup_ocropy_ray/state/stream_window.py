"""Streaming event-time WINDOW AGGREGATION with watermarks — sharded
raw-Ray actors, the second place this repo leaves the Dataset API: an
unbounded out-of-order stream needs a *shared mutable* set of open
windows that outlives any one batch, which a lazy Dataset cannot hold.

Semantics (the standard event-time contract):
  - fixed windows [w*W, (w+1)*W) over the event timestamp;
  - the watermark is the max event time seen so far minus
    ``allowed_lateness_us`` — rows may arrive out of order by up to the
    lateness bound and still land in their window;
  - a window FINALIZES (emits its exact count/sum, exactly once) when
    the watermark passes its end; rows for already-final windows are
    routed to a LATE side channel (id + how late), never silently
    dropped and never double-counted (the reference analogue is the
    training-diagnostics MovingStats stream, ocrolib/common.py:871,
    which has no lateness story at all).

Topology mirrors state/dedup_index.py: ``num_shards`` num_cpus=0
bookkeeper actors, each owning key-hash % num_shards; one ingest call
fans a batch into at most num_shards sub-calls with vectorized
per-shard updates. Per-shard state is the open-window dict (keys x
open-windows scale — bounded by lateness, not stream length).
Snapshot/restore is one .npz per shard behind a manifest so a killed
ingest resumes exactly; finalized results are emitted, not retained.

Watermark: shards are key-hash slices of ONE logical stream (not
independent source splits), so the watermark is the max event time
seen across shards; the out-of-order bound is the stream-level
``allowed_lateness_us``, applied at finalize. (With genuinely
independent sources, run one aggregator per source and finalize on the
min of their watermarks.)
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

import ray

from ..functions import hashing


@ray.remote(num_cpus=0)
class _WindowShard:
    def __init__(self, window_us: int, lateness_us: int) -> None:
        self.w = int(window_us)
        self.late_bound = int(lateness_us)
        # (key, window_start_us) -> [count, value_sum]
        self.open: dict[tuple[str, int], list[int]] = {}
        self.max_seen = -(1 << 62)
        self.finalized_through = -(1 << 62)  # window ends <= this are out

    def ingest(self, keys: np.ndarray, ts: np.ndarray,
               vals: np.ndarray) -> dict:
        """Add one micro-batch slice; returns the late rows (routed by
        the caller to the side channel)."""
        ws = (ts // self.w) * self.w
        late_mask = (ws + self.w) <= self.finalized_through
        ok = ~late_mask
        if ok.any():
            # pre-combine the slice: the dict loop runs over DISTINCT
            # (key, window) pairs, not rows
            kk, vv, ss = keys[ok], vals[ok], ws[ok]
            order = np.lexsort((ss, kk))
            kk, vv, ss = kk[order], vv[order], ss[order]
            new = np.zeros(len(kk), dtype=bool)
            new[0] = True
            new[1:] = (kk[1:] != kk[:-1]) | (ss[1:] != ss[:-1])
            starts = np.flatnonzero(new)
            cnts = np.diff(np.concatenate([starts, [len(kk)]]))
            sums = np.add.reduceat(vv, starts)
            for k, s, n, v in zip(kk[starts].tolist(), ss[starts].tolist(),
                                  cnts.tolist(), sums.tolist()):
                slot = self.open.get((k, s))
                if slot is None:
                    self.open[(k, s)] = [int(n), int(v)]
                else:
                    slot[0] += int(n)
                    slot[1] += int(v)
        if len(ts):
            self.max_seen = max(self.max_seen, int(ts.max()))
        return {
            "late_keys": keys[late_mask],
            "late_ts": ts[late_mask],
            "late_by_us": (self.finalized_through
                           - (ws[late_mask] + self.w) + self.late_bound),
        }

    def max_event_time(self) -> int:
        return self.max_seen

    def finalize(self, watermark: int) -> pd.DataFrame:
        """Emit (exactly once) every window whose end <= watermark -
        lateness. ``watermark`` is the coordinator's global max event
        time across shards."""
        cut = int(watermark) - self.late_bound
        if cut <= self.finalized_through:
            return _empty_final()
        out_keys, out_ws, out_n, out_sum = [], [], [], []
        for (k, s), (n, v) in list(self.open.items()):
            if s + self.w <= cut:
                out_keys.append(k)
                out_ws.append(s)
                out_n.append(n)
                out_sum.append(v)
                del self.open[(k, s)]
        self.finalized_through = cut
        return pd.DataFrame({
            "key": pd.Series(out_keys, dtype=object),
            "window_start": np.array(out_ws, dtype=np.int64),
            "n_events": np.array(out_n, dtype=np.int64),
            "sum_value": np.array(out_sum, dtype=np.int64)})

    def snapshot(self) -> dict:
        items = list(self.open.items())
        return {
            "keys": np.array([k for (k, _s), _ in items], dtype=object),
            "starts": np.array([s for (_k, s), _ in items],
                               dtype=np.int64),
            "counts": np.array([c for _, (c, _v) in items],
                               dtype=np.int64),
            "sums": np.array([v for _, (_c, v) in items], dtype=np.int64),
            "max_seen": self.max_seen,
            "finalized_through": self.finalized_through,
        }

    def restore(self, snap: dict) -> int:
        self.open = {
            (str(k), int(s)): [int(c), int(v)]
            for k, s, c, v in zip(snap["keys"], snap["starts"],
                                  snap["counts"], snap["sums"])}
        self.max_seen = int(snap["max_seen"])
        self.finalized_through = int(snap["finalized_through"])
        return len(self.open)


def _empty_final() -> pd.DataFrame:
    return pd.DataFrame({
        "key": pd.Series([], dtype=object),
        "window_start": pd.Series([], dtype="int64"),
        "n_events": pd.Series([], dtype="int64"),
        "sum_value": pd.Series([], dtype="int64")})


def _empty_late() -> pd.DataFrame:
    return pd.DataFrame({
        "key": pd.Series([], dtype=object),
        "ts": pd.Series([], dtype="int64"),
        "late_by_us": pd.Series([], dtype="int64")})


class StreamWindowAgg:
    """Driver-facing handle: route, ingest, finalize, checkpoint."""

    def __init__(self, window_us: int = 3_600_000_000,
                 allowed_lateness_us: int = 1_800_000_000,
                 num_shards: int = 4):
        self.window_us = int(window_us)
        self.lateness_us = int(allowed_lateness_us)
        self.num_shards = int(num_shards)
        self.shards = [
            _WindowShard.remote(window_us, allowed_lateness_us)
            for _ in range(num_shards)]
        self._late: list[pd.DataFrame] = []

    def _route(self, keys: np.ndarray) -> np.ndarray:
        return (hashing.hash_strings(keys) % self.num_shards).astype(
            np.int64)

    def ingest(self, batch: pd.DataFrame, key_col: str = "key",
               ts_col: str = "ts", value_col: str = "value") -> None:
        keys = batch[key_col].to_numpy(str)
        ts = batch[ts_col].to_numpy(np.int64)
        vals = batch[value_col].to_numpy(np.int64)
        route = self._route(keys)
        refs = []
        for s in np.unique(route):
            m = route == s
            refs.append(self.shards[int(s)].ingest.remote(
                keys[m], ts[m], vals[m]))
        for r in ray.get(refs):
            if len(r["late_ts"]):
                self._late.append(pd.DataFrame({
                    "key": r["late_keys"],
                    "ts": r["late_ts"].astype(np.int64),
                    "late_by_us": r["late_by_us"].astype(np.int64)}))

    def watermark(self) -> int:
        """Global watermark: max event time seen across the key-hash
        shards of the one logical stream (restored exactly from shard
        snapshots after a resume)."""
        return max(ray.get([s.max_event_time.remote()
                            for s in self.shards]))

    def finalize_ready(self) -> pd.DataFrame:
        """Exactly-once emission of every window closed under the
        current global watermark, across all shards."""
        wm = self.watermark()
        parts = ray.get([s.finalize.remote(wm) for s in self.shards])
        out = pd.concat(parts, ignore_index=True)
        if len(out) == 0:
            return _empty_final()
        return (out.sort_values(["key", "window_start"])
                .reset_index(drop=True))

    def late_rows(self) -> pd.DataFrame:
        if not self._late:
            return _empty_late()
        return pd.concat(self._late, ignore_index=True)

    # ------------------------------------------------------ checkpoint

    def save(self, root: str) -> None:
        """Versioned single-rename snapshot (requires no in-flight
        ingest, same contract as DedupIndex.save)."""
        tmp = root + f".tmp.{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        snaps = ray.get([s.snapshot.remote() for s in self.shards])
        for i, snap in enumerate(snaps):
            np.savez(os.path.join(tmp, f"shard-{i}.npz"),
                     keys=np.array(snap["keys"], dtype=object),
                     starts=snap["starts"], counts=snap["counts"],
                     sums=snap["sums"],
                     meta=np.array([snap["max_seen"],
                                    snap["finalized_through"]],
                                   dtype=np.int64))
        with open(os.path.join(tmp, "_manifest.json"), "w") as f:
            json.dump({"num_shards": self.num_shards,
                       "window_us": self.window_us,
                       "lateness_us": self.lateness_us}, f)
        if os.path.isdir(root):
            import shutil
            shutil.rmtree(root)
        os.rename(tmp, root)

    def restore(self, root: str) -> None:
        with open(os.path.join(root, "_manifest.json")) as f:
            m = json.load(f)
        if (m["num_shards"] != self.num_shards
                or m["window_us"] != self.window_us
                or m["lateness_us"] != self.lateness_us):
            raise RuntimeError(
                "StreamWindowAgg.restore: checkpoint was taken with a "
                "different shard count / window / lateness; restore "
                "into a matching aggregator")
        refs = []
        for i, s in enumerate(self.shards):
            z = np.load(os.path.join(root, f"shard-{i}.npz"),
                        allow_pickle=True)
            refs.append(s.restore.remote({
                "keys": z["keys"], "starts": z["starts"],
                "counts": z["counts"], "sums": z["sums"],
                "max_seen": int(z["meta"][0]),
                "finalized_through": int(z["meta"][1])}))
        ray.get(refs)
