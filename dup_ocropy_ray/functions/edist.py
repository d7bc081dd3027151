"""Edit-distance kernels for OCR evaluation.

Behavioral equivalents of reference ocrolib/edist.py:6-83 (``levenshtein``,
``xlevenshtein``), validated against the reference's own unit vectors
(reference tests/run-unit:30-45). The xlevenshtein alignment tie-break
(insertion preferred over deletion preferred over substitution when costs
tie) and the context-window confusion extraction are replicated exactly so
the ported test vectors pass.
"""

from __future__ import annotations

import re

import numpy as np


def levenshtein(a: str, b: str) -> int:
    """Plain edit distance, O(min(n,m)) memory, vectorized over numpy rows."""
    if len(a) < len(b):
        a, b = b, a
    n = len(b)
    if n == 0:
        return len(a)
    bv = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    prev = np.arange(n + 1, dtype=np.int64)
    for i, ch in enumerate(a, 1):
        code = ord(ch)
        sub = prev[:-1] + (bv != code)
        cur = np.empty(n + 1, dtype=np.int64)
        cur[0] = i
        # delete = prev[1:] + 1 ; insert needs a scan because cur[j-1] depends
        # on cur[j-2]; do the standard min-accumulate trick
        cur[1:] = np.minimum(sub, prev[1:] + 1)
        # propagate insertions left-to-right
        for j in range(1, n + 1):
            if cur[j - 1] + 1 < cur[j]:
                cur[j] = cur[j - 1] + 1
        prev = cur
    return int(prev[n])


def xlevenshtein(a: str, b: str, context: int = 1):
    """Edit distance plus aligned confusion pairs with `context` chars of
    surrounding agreement collapsed. Returns (cost, [(pred_frag, gt_frag)]).
    b is the ground truth and must be non-empty."""
    n, m = len(a), len(b)
    if m == 0:
        raise ValueError("xlevenshtein requires non-empty ground truth")
    if a == b:
        return 0, []
    BIG = 1 << 30
    dist = np.full((m + 1, n + 1), BIG, dtype=np.int64)
    dist[0, :] = np.arange(n + 1)
    src = np.full((m + 1, n + 1, 2), -1, dtype=np.int64)  # (-1,-1) = no source
    for i in range(1, m + 1):
        dist[i, 0] = i
        bi = b[i - 1]
        for j in range(1, n + 1):
            best = dist[i, j]
            # order matters for tie-breaks (matches reference alignment)
            if dist[i - 1, j] + 1 < best:
                best = dist[i - 1, j] + 1
                src[i, j] = (i - 1, j)
            if dist[i, j - 1] + 1 < best:
                best = dist[i, j - 1] + 1
                src[i, j] = (i, j - 1)
            d = 0 if a[j - 1] == bi else 1
            if dist[i - 1, j - 1] + d < best:
                best = dist[i - 1, j - 1] + d
                src[i, j] = (i - 1, j - 1)
            dist[i, j] = best
    cost = int(dist[m, n])

    # walk the source chain back from (m, n) and emit two aligned strings
    path = []
    cell = tuple(src[m, n])
    while cell != (-1, -1):
        path.append(cell)
        cell = tuple(src[cell[0], cell[1]])
    path = [(n + 2, m + 2)] + path
    al_rev, bl_rev = [], []
    for k in range(len(path) - 1):
        i, j = path[k]
        i0, j0 = path[k + 1]
        al_rev.append(a[j0] if (j != j0 and j0 < n) else "_")
        bl_rev.append(b[i0] if (i != i0 and i0 < m) else "_")
    al = "".join(reversed(al_rev))
    bl = "".join(reversed(bl_rev))

    # pad with `context` agreeing spaces, blank out agreement runs wider
    # than the context window, split on them -> confusion fragments
    al = " " * context + al + " " * context
    bl = " " * context + bl + " " * context
    agree = np.array([x == y for x, y in zip(al, bl)], dtype=np.int8)
    k = 1 + 2 * context
    # centered sliding minimum with edge padding (all-agree at both ends)
    pad = np.concatenate([np.ones(k // 2, np.int8), agree, np.ones(k // 2, np.int8)])
    wide = np.ones(len(agree), dtype=np.int8)
    for off in range(k):
        wide = np.minimum(wide, pad[off : off + len(agree)])
    al_marked = "".join("~" if wide[i] else al[i] for i in range(len(al)))
    bl_marked = "".join("~" if wide[i] else bl[i] for i in range(len(bl)))
    a_frags = re.split(r"~+", al_marked)
    b_frags = re.split(r"~+", bl_marked)
    confusions = [(x, y) for x, y in zip(a_frags, b_frags) if x != "" or y != ""]
    return cost, confusions
