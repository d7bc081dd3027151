"""Slice-rectangle algebra (behavioral equivalent of reference
ocrolib/sl.py:9-155). Rectangles are pairs of Python slices
(slice_y, slice_x); used by segmentation and line extraction."""

from __future__ import annotations

import numpy as np


def raster(u) -> tuple[int, int, int, int]:
    """(row0, col0, row1, col1) of a slice-pair."""
    return (u[0].start, u[1].start, u[0].stop, u[1].stop)


def box(r0: int, c0: int, r1: int, c1: int):
    return (slice(r0, r1), slice(c0, c1))


def dim0(u) -> int:
    return u[0].stop - u[0].start


def dim1(u) -> int:
    return u[1].stop - u[1].start


def area(u) -> int:
    return max(0, dim0(u)) * max(0, dim1(u))


def aspect(u) -> float:
    return dim1(u) * 1.0 / max(1, dim0(u))


def center(u) -> tuple[float, float]:
    return ((u[0].start + u[0].stop) / 2.0, (u[1].start + u[1].stop) / 2.0)


def xcenter(u) -> float:
    return (u[1].start + u[1].stop) / 2.0


def ycenter(u) -> float:
    return (u[0].start + u[0].stop) / 2.0


def union(u, v):
    return (
        slice(min(u[0].start, v[0].start), max(u[0].stop, v[0].stop)),
        slice(min(u[1].start, v[1].start), max(u[1].stop, v[1].stop)),
    )


def intersect(u, v):
    return (
        slice(max(u[0].start, v[0].start), min(u[0].stop, v[0].stop)),
        slice(max(u[1].start, v[1].start), min(u[1].stop, v[1].stop)),
    )


def empty(u) -> bool:
    return u[0].stop <= u[0].start or u[1].stop <= u[1].start


def xoverlap(u, v) -> int:
    return min(u[1].stop, v[1].stop) - max(u[1].start, v[1].start)


def yoverlap(u, v) -> int:
    return min(u[0].stop, v[0].stop) - max(u[0].start, v[0].start)


def yoverlaps(u, v) -> bool:
    return yoverlap(u, v) > 0


def xoverlaps(u, v) -> bool:
    return xoverlap(u, v) > 0


def before_x(u, v) -> bool:
    """u entirely left of v."""
    return u[1].stop <= v[1].start


def pad(u, d: int, shape=None):
    """Grow by d on all sides, clipped to shape (reference sl.pad_by /
    cut-with-margin, ocrolib/sl.py:127-155)."""
    r0, c0 = u[0].start - d, u[1].start - d
    r1, c1 = u[0].stop + d, u[1].stop + d
    if shape is not None:
        r0, c0 = max(0, r0), max(0, c0)
        r1, c1 = min(shape[0], r1), min(shape[1], c1)
    return (slice(r0, r1), slice(c0, c1))


def cut(image: np.ndarray, u, margin: int = 0, bg: float = 0.0) -> np.ndarray:
    """Extract rectangle with margin; out-of-bounds filled with bg."""
    h, w = image.shape[:2]
    r0, c0 = u[0].start - margin, u[1].start - margin
    r1, c1 = u[0].stop + margin, u[1].stop + margin
    out_h, out_w = r1 - r0, c1 - c0
    out = np.full((out_h, out_w), bg, dtype=image.dtype)
    sr0, sc0 = max(0, r0), max(0, c0)
    sr1, sc1 = min(h, r1), min(w, c1)
    if sr1 > sr0 and sc1 > sc0:
        out[sr0 - r0 : sr1 - r0, sc0 - c0 : sc1 - c0] = image[sr0:sr1, sc0:sc1]
    return out
