"""Property-based tests for the numpy filter kernels: each optimized
implementation (van Herk max, cumsum mean, box-cascade gaussian, run-based
labeling) must agree with the obvious brute-force definition."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from dup_ocropy_ray.functions import imgops

_imgs = arrays(
    np.float32,
    st.tuples(st.integers(1, 23), st.integers(1, 23)),
    elements=st.floats(0, 1, width=32),
)


def _brute_max1d(a, size, axis):
    lo = size // 2
    hi = size - 1 - lo
    out = np.empty_like(a)
    n = a.shape[axis]
    am = np.moveaxis(a, axis, 0)
    om = np.moveaxis(out, axis, 0)
    for i in range(n):
        s = slice(max(0, i - lo), min(n, i + hi + 1))
        om[i] = am[s].max(axis=0)
    return out


@settings(max_examples=60, deadline=None)
@given(_imgs, st.integers(1, 9), st.integers(0, 1))
def test_maximum_filter1d_matches_bruteforce(a, size, axis):
    got = imgops.maximum_filter1d(a, size, axis)
    want = _brute_max1d(a, size, axis)
    assert np.array_equal(got, want)


@settings(max_examples=40, deadline=None)
@given(_imgs, st.integers(1, 7), st.integers(0, 1))
def test_uniform_filter1d_matches_bruteforce(a, size, axis):
    lo = size // 2
    hi = size - 1 - lo
    n = a.shape[axis]
    am = np.moveaxis(np.asarray(a, np.float64), axis, 0)
    want = np.empty_like(am)
    for i in range(n):
        # edge-replicate padding semantics
        idx = np.clip(np.arange(i - lo, i + hi + 1), 0, n - 1)
        want[i] = am[idx].mean(axis=0)
    got = np.moveaxis(imgops.uniform_filter1d(a, size, axis), axis, 0)
    assert np.allclose(got, want, atol=1e-4)


def _brute_label(b):
    """Flood-fill 4-connected labeling."""
    h, w = b.shape
    lab = np.zeros((h, w), dtype=np.int32)
    nxt = 0
    for y in range(h):
        for x in range(w):
            if b[y, x] and lab[y, x] == 0:
                nxt += 1
                stack = [(y, x)]
                while stack:
                    cy, cx = stack.pop()
                    if cy < 0 or cy >= h or cx < 0 or cx >= w:
                        continue
                    if not b[cy, cx] or lab[cy, cx]:
                        continue
                    lab[cy, cx] = nxt
                    stack += [(cy + 1, cx), (cy - 1, cx), (cy, cx + 1), (cy, cx - 1)]
    return lab, nxt


@settings(max_examples=60, deadline=None)
@given(arrays(np.bool_, st.tuples(st.integers(1, 16), st.integers(1, 16))))
def test_label_matches_floodfill(b):
    got, n_got = imgops.label(b)
    want, n_want = _brute_label(b)
    assert n_got == n_want
    # same partition: components must map 1:1 (labels may be permuted)
    if n_got:
        mapping = {}
        for g, w in zip(got.ravel(), want.ravel()):
            assert (g == 0) == (w == 0)
            if g:
                assert mapping.setdefault(g, w) == w
        assert len(set(mapping.values())) == len(mapping)


@settings(max_examples=40, deadline=None)
@given(
    arrays(np.bool_, st.tuples(st.integers(1, 40), st.integers(1, 40))),
)
def test_label_bit_exact_vs_sequential_unionfind(b):
    """The vectorized searchsorted+pointer-jumping labeling must return
    the IDENTICAL label image (not just the same partition) as the
    sequential run-based union-find it replaced."""
    got, n_got = imgops.label(b)
    want, n_want = imgops._label_runs_py(b)
    assert n_got == n_want
    assert np.array_equal(got, want)


def test_label_bit_exact_dense_random():
    rng = np.random.default_rng(7)
    for density in (0.1, 0.45, 0.6, 0.9):
        b = rng.random((120, 83)) < density
        got, n_got = imgops.label(b)
        want, n_want = imgops._label_runs_py(b)
        assert n_got == n_want and np.array_equal(got, want)


@settings(max_examples=30, deadline=None)
@given(_imgs, st.floats(0.5, 30.0))
def test_box_gaussian_preserves_mass_and_range(a, sigma):
    out = imgops.box_gaussian_filter1d(a, sigma, 0)
    assert out.shape == a.shape
    assert out.min() >= -1e-4 and out.max() <= 1 + 1e-4


@settings(max_examples=30, deadline=None)
@given(_imgs, st.lists(st.floats(-3.0, 3.0), min_size=1, max_size=5))
def test_rotate_rowmeans_matches_rotate(a, angles):
    if a.shape[0] < 2 or a.shape[1] < 2:
        return
    got = imgops.rotate_rowmeans(a, angles, cval=1.0)
    for ang, m in zip(angles, got):
        want = imgops.rotate(a, ang, cval=1.0, order=0).mean(axis=1)
        np.testing.assert_array_equal(m, want)
