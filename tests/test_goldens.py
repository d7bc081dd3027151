"""Pinned stage goldens: binarize + segment outputs must match
tests/goldens/stage_goldens.json exactly (bin-PNG md5, skew angle, seg
scale, line bboxes in reading order). Model-independent — catches silent
numeric drift in the image kernels that text-level gates can miss
(FIXTURES.md §4; regenerate ONLY via scripts/make_goldens.py)."""

import json
import os
import sys

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "stage_goldens.json")


def test_stage_goldens_pinned():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from scripts.make_goldens import compute_goldens

    with open(GOLDEN) as f:
        want = json.load(f)
    got = compute_goldens()
    assert [r["name"] for r in got] == [r["name"] for r in want]
    for g, w in zip(got, want):
        assert g == w, (w["name"], g, w)
