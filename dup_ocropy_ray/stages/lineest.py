"""Line normalization (dewarp + height scaling) before recognition.

Behavioral equivalent of the reference's CenterNormalizer
(reference ocrolib/lineest.py:19-59): estimate the vertical
center-of-ink curve from a smoothed ink map, dewarp each column onto that
curve within radius r = 1 + range*MAD, then scale to the model's input
height (48 px) with an affine resize (reference lineest.py:9-17
``scale_to_h``).
"""

from __future__ import annotations

import numpy as np

from ..functions.imgops import (
    box_gaussian_filter1d,
    gaussian_filter1d,
    gaussian_filter_fast,
    uniform_filter,
    zoom_to,
)

TARGET_HEIGHT = 48


def scale_to_h(img: np.ndarray, target_height: int = TARGET_HEIGHT) -> np.ndarray:
    h, w = img.shape
    if h == 0 or w == 0:
        return np.zeros((target_height, 1))
    scale = target_height / h
    target_width = max(1, int(scale * w))
    return zoom_to(img, (target_height, target_width))


class CenterNormalizer:
    """range=4, smoothness=1.0, extra=0.3, target_height=48 per reference
    ocrolib/lineest.py:20."""

    def __init__(self, target_height: int = TARGET_HEIGHT, params=(4, 1.0, 0.3)):
        self.target_height = target_height
        self.range, self.smoothness, self.extra = params

    def measure(self, line: np.ndarray) -> None:
        """`line` is an ink=1 float image (inverted)."""
        h, w = line.shape
        # horizontal smoothing (sigma ≈ h, across a much wider image) uses
        # the O(n) box cascade; the VERTICAL pass stays exact — its sigma
        # (h/2) is comparable to the image height, where box vs gaussian
        # diverge badly and the argmax'd center curve would collapse.
        # Training (scripts/train_fixture_model.py) shares this exact code
        # path, so the model sees the same normalization distribution.
        sx = h * self.smoothness
        smoothed = box_gaussian_filter1d(line, sx, 1) if sx > 8 else (
            gaussian_filter1d(line, sx, 1) if sx > 0 else line)
        smoothed = gaussian_filter1d(smoothed, h * 0.5, 0)
        smoothed = smoothed + 0.001 * uniform_filter(smoothed, (h * 0.5, w))
        self.shape = (h, w)
        a = np.argmax(smoothed, axis=0).astype(np.float32)
        a = gaussian_filter1d(a, h * self.extra, axis=0)
        self.center = np.array(a, dtype=np.int64)
        deltas = np.abs(np.arange(h)[:, None] - self.center[None, :])
        ink = line != 0
        self.mad = float(np.mean(deltas[ink])) if ink.any() else h / 4.0
        self.r = int(1 + self.range * self.mad)

    def dewarp(self, img: np.ndarray, cval: float = 0) -> np.ndarray:
        assert img.shape == self.shape
        h, w = img.shape
        hpad = self.r
        padded = np.vstack(
            [cval * np.ones((hpad, w)), img, cval * np.ones((hpad, w))]
        )
        center = self.center + hpad
        # gather a (2r, w) window column-wise around the center curve
        rows = center[None, :] + np.arange(-self.r, self.r)[:, None]
        cols = np.broadcast_to(np.arange(w)[None, :], rows.shape)
        return padded[rows, cols]

    def normalize(self, img: np.ndarray, cval: float = 0) -> np.ndarray:
        dewarped = self.dewarp(img, cval=cval)
        return scale_to_h(dewarped, self.target_height)


def normalize_line(raw_line_white1: np.ndarray, target_height: int = TARGET_HEIGHT) -> np.ndarray:
    """White-background line image -> dewarped white-background image of
    height 48. The center curve is measured on the inverted (ink=1) copy
    but the dewarp cuts from the original with white fill, exactly as the
    reference does (ocropus-rpred:158-163: measure(inverted),
    normalize(line, cval=amax)). Feed the result to ``prepare_line``."""
    line = np.asarray(raw_line_white1, dtype=np.float32)
    ink = np.amax(line) - line
    mx = ink.max()
    if mx > 0:
        ink = ink / mx
    cn = CenterNormalizer(target_height)
    cn.measure(ink)
    return cn.normalize(line, cval=float(np.amax(line)))


def check_line(ink: np.ndarray) -> str:
    """Line sanity guards (reference ocropus-rpred:82-96); `ink` is the
    ink=1 image. Returns '' when OK."""
    if ink.ndim == 3:
        return "input not monochrome"
    if np.prod(ink.shape) == 0:
        return "image dimensions are zero"
    if np.amax(ink) == np.amin(ink):
        return "image is blank"
    if np.mean(ink) < np.median(ink):
        return "image may be inverted"
    h, w = ink.shape
    if h < 20:
        return "image not tall enough for a line image"
    if h > 200:
        return "image too tall for a line image"
    if w < 1.5 * h:
        return "line too short"
    if w > 4000:
        return "line too wide"
    ratio = w / h
    from ..functions.imgops import label as _label

    _, ncomps = _label(ink > np.mean(ink))
    lo = int(0.5 * ratio + 0.5)
    hi = int(4 * ratio) + 1
    if ncomps < lo:
        return f"too few connected components (got {ncomps}, wanted >={lo})"
    if ncomps > hi * ratio:
        return f"too many connected components (got {ncomps}, wanted <={hi})"
    return ""
