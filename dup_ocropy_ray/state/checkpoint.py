"""Fragment-grained checkpoint store with per-partition lineage + metrics.

North-rule requirement (BASELINE.json): a killed run resumes without
reprocessing completed fragments, and every partition emits lineage
records and counters (lines segmented, chars decoded, low-confidence
lines).

Layout under the output root:

    out/
      fragment=00003/part-*.parquet   # the fragment's reassembled docs
      _manifest/00003.json            # lineage + counters, written LAST
      _manifest/00003.json.tmp        # atomic write staging

A fragment is complete iff its manifest exists — the parquet directory is
written first, the manifest rename is the commit point. ``pending_fragments``
is the anti-join the resume path runs.
"""

from __future__ import annotations

import json
import os
import time


def manifest_dir(root: str) -> str:
    return os.path.join(root, "_manifest")


def fragment_dir(root: str, frag: int) -> str:
    return os.path.join(root, f"fragment={frag:05d}")


def completed_fragments(root: str) -> set[int]:
    d = manifest_dir(root)
    if not os.path.isdir(d):
        return set()
    out = set()
    for f in os.listdir(d):
        if f.endswith(".json"):
            out.add(int(f[:-5]))
    return out


def pending_fragments(root: str, num_fragments: int) -> list[int]:
    done = completed_fragments(root)
    return [k for k in range(num_fragments) if k not in done]


def commit_fragment(root: str, frag: int, counters: dict,
                    metrics: dict | None = None) -> None:
    """Write the lineage/counter manifest atomically (tmp + rename).
    ``metrics`` carries per-fragment throughput (wall seconds,
    rows/sec) alongside the lineage counters — the per-partition
    metrics record the north rule requires."""
    d = manifest_dir(root)
    os.makedirs(d, exist_ok=True)
    rec = {
        "fragment": frag,
        "completed_at": time.time(),
        "lineage": {
            "engine": "dup_ocropy_ray",
            "output": fragment_dir(root, frag),
        },
        "counters": counters,
        "metrics": metrics or {},
    }
    tmp = os.path.join(d, f"{frag:05d}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(rec, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(d, f"{frag:05d}.json"))


def read_manifests(root: str) -> list[dict]:
    d = manifest_dir(root)
    if not os.path.isdir(d):
        return []
    out = []
    for f in sorted(os.listdir(d)):
        if f.endswith(".json"):
            with open(os.path.join(d, f)) as fh:
                out.append(json.load(fh))
    return out


def aggregate_counters(root: str) -> dict:
    total: dict[str, float] = {}
    for m in read_manifests(root):
        for k, v in m.get("counters", {}).items():
            total[k] = total.get(k, 0) + v
    return total
