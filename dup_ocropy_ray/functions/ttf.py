"""From-scratch TrueType font parser + rasterizer (no PIL/cairo — same
no-imaging-libs policy as functions/png.py), sufficient to render text
lines with the reference's in-tree DejaVuSans.ttf the way
ocropus-linegen does (reference ocropus-linegen:174-197 renders via
PIL ImageFont; we parse glyf outlines and scanline-fill them directly).

Supported: cmap format 4 (BMP), short/long loca, simple glyphs
(quadratic contours) and composite glyphs with XY offsets/simple scales,
hmtx advances, kern-less layout. That covers DejaVuSans for the Latin-1
range the fixtures use; anything else raises KeyError per char.
"""

from __future__ import annotations

import struct

import numpy as np


class TTFont:
    def __init__(self, data: bytes):
        self.data = data
        (self.sfnt, num_tables) = struct.unpack_from(">IH", data, 0)
        if self.sfnt not in (0x00010000, 0x74727565):  # 'true' legacy
            raise ValueError("not a TrueType font")
        self.tables = {}
        for i in range(num_tables):
            tag, _chk, off, length = struct.unpack_from(
                ">4sIII", data, 12 + 16 * i)
            self.tables[tag.decode("latin1")] = (off, length)
        head = self.tables["head"][0]
        self.units_per_em = struct.unpack_from(">H", data, head + 18)[0]
        self.index_to_loc = struct.unpack_from(">h", data, head + 50)[0]
        maxp = self.tables["maxp"][0]
        self.num_glyphs = struct.unpack_from(">H", data, maxp + 4)[0]
        hhea = self.tables["hhea"][0]
        self.ascent = struct.unpack_from(">h", data, hhea + 4)[0]
        self.descent = struct.unpack_from(">h", data, hhea + 6)[0]
        self.num_hmetrics = struct.unpack_from(">H", data, hhea + 34)[0]
        self._cmap = self._parse_cmap()
        self._loca = self._parse_loca()

    # ------------------------------------------------------------ tables
    def _parse_cmap(self) -> dict[int, int]:
        data = self.data
        base = self.tables["cmap"][0]
        n = struct.unpack_from(">H", data, base + 2)[0]
        sub = None
        for i in range(n):
            pid, eid, off = struct.unpack_from(">HHI", data, base + 4 + 8 * i)
            if (pid, eid) in ((3, 1), (0, 3), (0, 4), (3, 10)):
                fmt = struct.unpack_from(">H", data, base + off)[0]
                if fmt == 4:
                    sub = base + off
                    break
        if sub is None:
            raise ValueError("no format-4 cmap subtable")
        segx2 = struct.unpack_from(">H", data, sub + 6)[0]
        seg = segx2 // 2
        end = np.frombuffer(data, ">u2", seg, sub + 14)
        start = np.frombuffer(data, ">u2", seg, sub + 16 + segx2)
        delta = np.frombuffer(data, ">i2", seg, sub + 16 + 2 * segx2)
        range_off_pos = sub + 16 + 3 * segx2
        range_off = np.frombuffer(data, ">u2", seg, range_off_pos)
        out: dict[int, int] = {}
        for s in range(seg):
            if start[s] == 0xFFFF:
                continue
            for c in range(int(start[s]), int(end[s]) + 1):
                if range_off[s] == 0:
                    g = (c + int(delta[s])) & 0xFFFF
                else:
                    p = range_off_pos + 2 * s + int(range_off[s]) \
                        + 2 * (c - int(start[s]))
                    g = struct.unpack_from(">H", data, p)[0]
                    if g:
                        g = (g + int(delta[s])) & 0xFFFF
                if g:
                    out[c] = g
        return out

    def _parse_loca(self) -> np.ndarray:
        off, _ = self.tables["loca"]
        n = self.num_glyphs + 1
        if self.index_to_loc == 0:
            return np.frombuffer(self.data, ">u2", n, off).astype(np.int64) * 2
        return np.frombuffer(self.data, ">u4", n, off).astype(np.int64)

    def glyph_id(self, ch: str) -> int:
        return self._cmap[ord(ch)]

    def advance(self, gid: int) -> int:
        off = self.tables["hmtx"][0]
        i = min(gid, self.num_hmetrics - 1)
        return struct.unpack_from(">H", self.data, off + 4 * i)[0]

    # ------------------------------------------------------------ glyphs
    def glyph_contours(self, gid: int, _depth: int = 0
                       ) -> list[np.ndarray]:
        """Glyph outline as a list of closed polylines in font units
        (quadratics flattened). Composite glyphs recurse."""
        if _depth > 4:
            return []
        glyf = self.tables["glyf"][0]
        lo, hi = self._loca[gid], self._loca[gid + 1]
        if hi <= lo:
            return []  # empty glyph (e.g. space)
        p = glyf + lo
        ncont = struct.unpack_from(">h", self.data, p)[0]
        if ncont < 0:
            return self._composite(p + 10, _depth)
        ends = np.frombuffer(self.data, ">u2", ncont, p + 10).astype(int)
        npts = int(ends[-1]) + 1
        ilen = struct.unpack_from(">H", self.data, p + 10 + 2 * ncont)[0]
        q = p + 12 + 2 * ncont + ilen
        flags = np.empty(npts, dtype=np.uint8)
        i = 0
        while i < npts:
            f = self.data[q]
            q += 1
            flags[i] = f
            i += 1
            if f & 8:  # repeat
                r = self.data[q]
                q += 1
                flags[i:i + r] = f
                i += r
        xs = np.zeros(npts, dtype=np.int64)
        v = 0
        for i in range(npts):
            f = flags[i]
            if f & 2:
                d = self.data[q]
                q += 1
                v += d if f & 16 else -d
            elif not f & 16:
                v += struct.unpack_from(">h", self.data, q)[0]
                q += 2
            xs[i] = v
        ys = np.zeros(npts, dtype=np.int64)
        v = 0
        for i in range(npts):
            f = flags[i]
            if f & 4:
                d = self.data[q]
                q += 1
                v += d if f & 32 else -d
            elif not f & 32:
                v += struct.unpack_from(">h", self.data, q)[0]
                q += 2
            ys[i] = v
        on = (flags & 1).astype(bool)
        out = []
        s = 0
        for e in ends:
            out.append(_flatten_contour(xs[s:e + 1], ys[s:e + 1], on[s:e + 1]))
            s = e + 1
        return out

    def _composite(self, q: int, depth: int) -> list[np.ndarray]:
        out = []
        while True:
            flags, gi = struct.unpack_from(">HH", self.data, q)
            q += 4
            if flags & 1:  # ARG_1_AND_2_ARE_WORDS
                a1, a2 = struct.unpack_from(">hh", self.data, q)
                q += 4
            else:
                a1, a2 = struct.unpack_from(">bb", self.data, q)
                q += 2
            sx = sy = 1.0
            if flags & 8:  # WE_HAVE_A_SCALE
                sx = sy = struct.unpack_from(">h", self.data, q)[0] / 16384
                q += 2
            elif flags & 0x40:  # X_AND_Y_SCALE
                sx = struct.unpack_from(">h", self.data, q)[0] / 16384
                sy = struct.unpack_from(">h", self.data, q + 2)[0] / 16384
                q += 4
            elif flags & 0x80:  # 2x2 — rare in DejaVu Latin; diagonal only
                sx = struct.unpack_from(">h", self.data, q)[0] / 16384
                sy = struct.unpack_from(">h", self.data, q + 6)[0] / 16384
                q += 8
            dx, dy = (a1, a2) if flags & 2 else (0, 0)  # XY values
            for c in self.glyph_contours(gi, depth + 1):
                out.append(c * np.array([sx, sy]) + np.array([dx, dy]))
            if not flags & 0x20:  # MORE_COMPONENTS
                break
        return out


def _flatten_contour(xs, ys, on, steps: int = 8) -> np.ndarray:
    """TrueType quadratic contour -> closed polyline (N,2) float."""
    pts = np.stack([xs, ys], axis=1).astype(np.float64)
    n = len(pts)
    # expand implied on-curve midpoints between consecutive off points
    exp: list[tuple[np.ndarray, bool]] = []
    for i in range(n):
        cur = (pts[i], bool(on[i]))
        if exp and not exp[-1][1] and not cur[1]:
            exp.append(((exp[-1][0] + cur[0]) / 2, True))
        exp.append(cur)
    if exp and not exp[0][1]:
        if exp[-1][1]:
            exp.insert(0, exp.pop())
        else:
            exp.insert(0, ((exp[0][0] + exp[-1][0]) / 2, True))
    poly = []
    m = len(exp)
    t = (np.arange(1, steps + 1) / steps)[:, None]
    i = 0
    while i < m:
        p0, on0 = exp[i]
        assert on0
        nxt = exp[(i + 1) % m]
        if nxt[1]:
            poly.append(p0[None, :])
            i += 1
        else:
            ctrl = nxt[0]
            p1 = exp[(i + 2) % m][0]
            seg = ((1 - t) ** 2 * p0 + 2 * (1 - t) * t * ctrl + t ** 2 * p1)
            poly.append(p0[None, :])
            poly.append(seg[:-1])
            i += 2
    return np.concatenate(poly) if poly else np.zeros((0, 2))


def _fill_contours(contours: list[np.ndarray], w: int, h: int) -> np.ndarray:
    """Nonzero-winding scanline fill -> uint8 {0,1} ink image (y down)."""
    img = np.zeros((h, w), dtype=np.uint8)
    segs = []
    for c in contours:
        if len(c) < 2:
            continue
        a = c
        b = np.roll(c, -1, axis=0)
        segs.append(np.concatenate([a, b], axis=1))  # x0 y0 x1 y1
    if not segs:
        return img
    e = np.concatenate(segs)
    x0, y0, x1, y1 = e[:, 0], e[:, 1], e[:, 2], e[:, 3]
    nonh = y0 != y1
    x0, y0, x1, y1 = x0[nonh], y0[nonh], x1[nonh], y1[nonh]
    wind = np.where(y1 > y0, 1, -1)
    ylo = np.minimum(y0, y1)
    yhi = np.maximum(y0, y1)
    for row in range(h):
        yc = row + 0.5
        m = (ylo <= yc) & (yc < yhi)
        if not m.any():
            continue
        tt = (yc - y0[m]) / (y1[m] - y0[m])
        xi = x0[m] + tt * (x1[m] - x0[m])
        order = np.argsort(xi, kind="stable")
        xi = xi[order]
        wsum = np.cumsum(wind[m][order])
        inside = wsum != 0
        # spans between crossing i and i+1 where winding nonzero
        lo = np.ceil(xi[:-1][inside[:-1]] - 0.5).astype(int)
        hi2 = np.ceil(xi[1:][inside[:-1]] - 0.5).astype(int)
        # clamp BOTH ends: a span entirely left of x=0 must fill nothing
        # (min(b,w) alone turns negative b into a wrap-around slice)
        for a, b in zip(np.maximum(lo, 0), np.minimum(hi2, w)):
            if b > a:
                img[row, a:b] = 1
    return img


_FONT_CACHE: dict[str, TTFont] = {}


def load_font(path: str) -> TTFont:
    if path not in _FONT_CACHE:
        with open(path, "rb") as f:
            _FONT_CACHE[path] = TTFont(f.read())
    return _FONT_CACHE[path]


def render_text(text: str, font: TTFont | str, size: int = 36,
                pad: int = 8) -> np.ndarray:
    """Render a text line -> float32 white-background [0,1] image
    (1=white, 0=ink), like the reference's genline pre-degradation
    raster (ocropus-linegen:174-185)."""
    if isinstance(font, str):
        font = load_font(font)
    scale = size / font.units_per_em
    asc = int(np.ceil(font.ascent * scale))
    desc = int(np.ceil(-font.descent * scale))
    h = asc + desc + 2 * pad
    # layout: accumulate advances
    xpen = float(pad)
    placed = []
    for ch in text:
        gid = font.glyph_id(ch)
        for c in font.glyph_contours(gid):
            placed.append(c * scale + np.array([xpen, 0.0]))
        xpen += font.advance(gid) * scale
    w = int(np.ceil(xpen)) + pad
    # font y is up; image y is down with baseline at pad+asc
    flipped = [np.stack([c[:, 0], (pad + asc) - c[:, 1]], axis=1)
               for c in placed]
    ink = _fill_contours(flipped, w, h)
    return (1.0 - ink).astype(np.float32)
