"""compute_line_seeds vectorization parity.

The vectorized transition fill in stages/segment.py must stay bit-equal
to the reference's per-column walk (ocropus-gpageseg:318-327). The walk
is reproduced here, directly from the reference pseudocode, as the spec.
"""

import numpy as np

from dup_ocropy_ray.functions.imgops import label, maximum_filter
from dup_ocropy_ray.stages.segment import compute_line_seeds


def loop_seeds(binary, bottom, top, colseps, scale, threshold=0.2, vscale=1.0):
    """Reference per-column transition walk (the spec)."""
    t = threshold
    vrange = int(vscale * scale)
    bmarked = maximum_filter(
        (bottom == maximum_filter(bottom, (vrange, 1))).astype(np.uint8), (2, 2)
    )
    bmarked = bmarked * (bottom > t * np.amax(bottom) * t) * (1 - colseps)
    tmarked = maximum_filter(
        (top == maximum_filter(top, (vrange, 1))).astype(np.uint8), (2, 2)
    )
    tmarked = tmarked * (top > t * np.amax(top) * t / 2) * (1 - colseps)
    tmarked = maximum_filter(tmarked, (1, 20))
    seeds = np.zeros(binary.shape, dtype=np.int32)
    delta = max(3, int(scale / 2))
    bm = bmarked > 0
    tm = tmarked > 0
    for x in range(binary.shape[1]):
        transitions = sorted(
            [(y, 1) for y in np.nonzero(bm[:, x])[0]]
            + [(y, 0) for y in np.nonzero(tm[:, x])[0]]
        )[::-1]
        transitions.append((0, 0))
        for l in range(len(transitions) - 1):
            y0, s0 = transitions[l]
            if s0 == 0:
                continue
            seeds[max(0, y0 - delta) : y0, x] = 1
            y1, s1 = transitions[l + 1]
            if s1 == 0 and (y0 - y1) < 5 * scale:
                seeds[y1:y0, x] = 1
    seeds = maximum_filter(seeds.astype(np.uint8), (1, int(1 + scale))) > 0
    seeds = seeds * (1 - colseps)
    seed_labels, _ = label(seeds > 0)
    return seed_labels


def _case(rng):
    h = int(rng.integers(30, 160))
    w = int(rng.integers(30, 160))
    scale = float(rng.uniform(3, 20))
    bottom = rng.random((h, w)) ** 3
    top = rng.random((h, w)) ** 3
    bottom[bottom < 0.7] = 0
    top[top < 0.7] = 0
    colseps = (rng.random((h, w)) < 0.02).astype(np.int32)
    binary = (rng.random((h, w)) < 0.1).astype(np.uint8)
    return binary, bottom, top, colseps, scale


def test_vectorized_seeds_match_reference_walk():
    rng = np.random.default_rng(1234)
    for _ in range(12):
        args = _case(rng)
        assert np.array_equal(compute_line_seeds(*args), loop_seeds(*args))


def test_seed_edge_cases():
    # empty markers, all-marked single column, marker on row 0
    z = np.zeros((20, 8))
    col = np.zeros((20, 8), dtype=np.int32)
    b = np.zeros((20, 8), dtype=np.uint8)
    assert np.array_equal(
        compute_line_seeds(b, z, z, col, 4.0), loop_seeds(b, z, z, col, 4.0)
    )
    hot = z.copy()
    hot[:, 3] = 1.0
    hot[0, :] = 1.0
    assert np.array_equal(
        compute_line_seeds(b, hot, hot, col, 4.0),
        loop_seeds(b, hot, hot, col, 4.0),
    )
