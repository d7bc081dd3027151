"""Sharded streaming dedup index — the one place this repo drops to raw
Ray actors, because a *shared mutable* seen-set across an unbounded
stream of ingest waves is exactly what the Dataset API cannot express
(reference analogue: ocropus-linegen:124 keeps an in-process line-dedup
set; here the corpus outlives any one job).

Topology: ``num_shards`` single-purpose actors, each owning a disjoint
slice of the 64-bit hash space (route = hash % num_shards — same
partitioning key as the batch dedup ops, so a batch splits into at most
``num_shards`` sub-calls). ``check_and_add`` is atomic per shard, so
across concurrent callers EXACTLY ONE claims any given hash
(first-come-first-serve; which physical row survives a same-wave race
is nondeterministic, but one-survivor-per-distinct-text always holds —
and per-wave NEW counts are fully deterministic).

Scale: per-shard state is a plain uint64 set (~40 B/entry); 10^12 docs
at 1% distinct-new per day shards across a few hundred actors on a
cluster's memory. Snapshots are one .npy per shard under a checkpoint
root, so a killed ingest resumes without re-claiming history.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

import ray
import ray.data as rd

from ..functions import hashing


@ray.remote(num_cpus=0)
class _IndexShard:
    """One hash-space slice. num_cpus=0: shards are memory-resident
    bookkeepers that must not reserve executor slots away from the
    data-plane tasks calling into them."""

    def __init__(self) -> None:
        self._seen: set[int] = set()

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        """Bool mask: True where the hash was NOT already present
        (claimed by this call). Duplicates WITHIN the argument also
        resolve to one True (first occurrence)."""
        seen = self._seen
        out = np.zeros(len(hashes), dtype=bool)
        for i, h in enumerate(hashes.tolist()):
            if h not in seen:
                seen.add(h)
                out[i] = True
        return out

    def size(self) -> int:
        return len(self._seen)

    def snapshot(self) -> np.ndarray:
        return np.fromiter(self._seen, dtype=np.uint64, count=len(self._seen))

    def restore(self, hashes: np.ndarray) -> int:
        self._seen.update(int(h) for h in np.asarray(hashes, dtype=np.uint64).tolist())
        return len(self._seen)


class DedupIndex:
    """Handle bundling the shard actors + routing."""

    def __init__(self, num_shards: int = 8):
        self.num_shards = num_shards
        self.shards = [_IndexShard.remote() for _ in range(num_shards)]

    # ---------------------------------------------------------- ingest

    def filter_new(self, ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
        """Rows whose ``text_col`` content hash was never seen before
        (and mark it seen) — streaming: each batch makes one
        ``check_and_add`` round-trip per touched shard."""
        shards = self.shards
        n = self.num_shards

        def f(batch: pd.DataFrame) -> pd.DataFrame:
            h = hashing.hash_strings(batch[text_col].to_numpy(dtype=object))
            shard_of = (h % np.uint64(n)).astype(np.int64)
            keep = np.zeros(len(batch), dtype=bool)
            calls, islands = [], []
            for s in np.unique(shard_of):
                idx = np.flatnonzero(shard_of == s)
                calls.append(shards[int(s)].check_and_add.remote(h[idx]))
                islands.append(idx)
            for idx, mask in zip(islands, ray.get(calls)):
                keep[idx] = mask
            return batch[keep]

        return ds.map_batches(f, batch_format="pandas", batch_size=8192)

    def count_new(self, ds: rd.Dataset, text_col: str = "text") -> int:
        """Ingest a wave and return how many distinct-new texts it
        contributed (deterministic even under same-wave races)."""
        return self.filter_new(ds, text_col).count()

    def size(self) -> int:
        return int(sum(ray.get([s.size.remote() for s in self.shards])))

    # ------------------------------------------------------ checkpoint

    def save(self, root: str) -> None:
        """Publish one consistent, versioned snapshot.

        Consistency contract: callers must quiesce ingest first (no
        ``filter_new`` waves in flight) — per-shard snapshots are atomic
        but a cut taken mid-wave is not a consistent point across shards,
        so a restore could re-admit texts other shards had claimed. The
        directory publish itself IS atomic: all shard .npy files land in
        a temp dir, then one rename exposes ``snap-<n>/`` complete-or-
        absent (a crash mid-save leaves only the previous snapshot
        visible; ``load`` ignores dirs without a MANIFEST)."""
        import json
        import shutil

        os.makedirs(root, exist_ok=True)
        snaps = ray.get([s.snapshot.remote() for s in self.shards])
        n = 1 + max((int(d.split("-")[1]) for d in os.listdir(root)
                     if d.startswith("snap-")), default=-1)
        tmp = os.path.join(root, f".inprogress-{os.getpid()}")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        for i, arr in enumerate(snaps):
            np.save(os.path.join(tmp, f"shard-{i:04d}.npy"), arr)
        with open(os.path.join(tmp, "MANIFEST.json"), "w") as f:
            json.dump({"num_shards": self.num_shards,
                       "sizes": [int(len(a)) for a in snaps]}, f)
        os.replace(tmp, os.path.join(root, f"snap-{n:06d}"))
        # prune: keep the 2 newest complete snapshots (the set is a full
        # copy per save — unbounded growth otherwise) and sweep stale
        # .inprogress-* from crashed saves
        snaps_all = sorted(d for d in os.listdir(root)
                           if d.startswith("snap-"))
        for d in snaps_all[:-2]:
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)
        for d in os.listdir(root):
            if d.startswith(".inprogress-") and d != os.path.basename(tmp):
                shutil.rmtree(os.path.join(root, d), ignore_errors=True)

    def load(self, root: str) -> None:
        """Restore from the newest COMPLETE snapshot (highest snap-<n>
        carrying a manifest). Shard count may differ from the saved
        layout — hashes re-route by value, so restore unions every saved
        shard file into the right live shard."""
        import json

        snaps = sorted(d for d in os.listdir(root) if d.startswith("snap-")
                       and os.path.exists(os.path.join(root, d,
                                                       "MANIFEST.json")))
        if not snaps:
            # legacy flat layout (pre-versioned checkpoints)
            calls = []
            for i in range(self.num_shards):
                p = os.path.join(root, f"shard-{i:04d}.npy")
                if os.path.exists(p):
                    calls.append(self.shards[i].restore.remote(np.load(p)))
            ray.get(calls)
            return
        d = os.path.join(root, snaps[-1])
        with open(os.path.join(d, "MANIFEST.json")) as f:
            manifest = json.load(f)
        calls = []
        for i in range(int(manifest["num_shards"])):
            arr = np.load(os.path.join(d, f"shard-{i:04d}.npy"))
            if int(manifest["num_shards"]) == self.num_shards:
                calls.append(self.shards[i].restore.remote(arr))
            else:
                route = (arr % np.uint64(self.num_shards)).astype(np.int64)
                for s in np.unique(route):
                    calls.append(self.shards[int(s)].restore.remote(
                        arr[route == s]))
        ray.get(calls)

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []
