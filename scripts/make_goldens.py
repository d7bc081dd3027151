#!/usr/bin/env python
"""Regenerate pinned stage goldens (tests/goldens/stage_goldens.json).

Pins binarize + segment outputs (bin-PNG md5, skew angle, seg scale,
line bboxes in reading order) for a fixed set of deterministic pages —
model-INDEPENDENT, so recognizer retrains never touch them. Run this
script ONLY when a kernel change intentionally alters stage outputs;
tests/test_goldens.py compares against the pinned values exactly.
"""

import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dup_ocropy_ray.functions import png
from dup_ocropy_ray.sources import glyphs
from dup_ocropy_ray.sources.fixtures import make_doc_texts
from dup_ocropy_ray.stages.binarize import binarize_page
from dup_ocropy_ray.stages.segment import segment_page

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "goldens", "stage_goldens.json")


def golden_pages():
    """Deterministic page set: plain pages + a masked two-column page."""
    rng = np.random.default_rng(20240817)
    pages = []
    for i in range(4):
        lines = make_doc_texts(rng, 3 + i)
        pages.append((f"page-{i}", glyphs.render_page(lines), None))
    # masked two-column page (G7)
    left, right = make_doc_texts(rng, 3), make_doc_texts(rng, 3)
    pl = glyphs.render_page(left, min_width=400)
    pr = glyphs.render_page(right, min_width=400)
    h = max(pl.shape[0], pr.shape[0])

    def padh(p):
        out = np.ones((h, p.shape[1]))
        out[: p.shape[0]] = p
        return out

    page = np.hstack([padh(pl), padh(pr)])
    mask = np.zeros(page.shape, dtype=np.uint8)
    mid = page.shape[1] // 2
    mask[:, mid - 2 : mid + 2] = 1
    pages.append(("page-masked", page, mask))
    return pages


def compute_goldens():
    recs = []
    for name, page, mask in golden_pages():
        b = binarize_page(page)
        bin_png = png.encode_gray(b["bin"])
        kw = {"mask": mask} if mask is not None else {}
        s = segment_page(b["bin"], **kw)
        recs.append(
            {
                "name": name,
                "bin_md5": hashlib.md5(bin_png).hexdigest(),
                "angle": round(float(b["angle"]), 6),
                "scale": round(float(s["scale"]), 6),
                "lines": [
                    [l["order"], l["y0"], l["x0"], l["y1"], l["x1"]]
                    for l in sorted(s["lines"], key=lambda l: l["order"])
                ],
            }
        )
    return recs


if __name__ == "__main__":
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(compute_goldens(), f, indent=1)
    print(f"wrote {OUT}")
