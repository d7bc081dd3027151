"""RFC 4180 CSV codec + the quote-parity byte-split planner that makes
CSV a *splittable* distributed source.

Why CSV needs a planner at all: a newline inside a quoted field is NOT a
record boundary, and whether a byte position is "inside quotes" depends
on the parity of the count of ``"`` bytes since the start of the file
(RFC 4180 escapes a quote as ``""`` — two bytes — so raw-byte parity is
preserved across escapes).  A naive "split at the next newline" reader
silently corrupts records that straddle split points.

The distributed recipe (used by sources/csvgen.read_csv_dist):

1. cut the file into ``num_splits`` equal byte ranges (driver: offsets
   only, no I/O);
2. **scan pass** — one task per range reads its bytes once and reports
   metadata only: total quote count in the range plus the first
   record-boundary candidate newline under EACH possible incoming parity
   (even/odd).  Vectorized: two ``np.flatnonzero`` + one searchsorted.
3. the driver prefix-sums quote counts (num_splits rows — metadata
   scale) to learn the true incoming parity of every range, picks each
   range's adjusted start boundary, and merges ranges that contain no
   boundary into their successor;
4. **parse pass** — one task per adjusted range re-reads exactly its
   record-aligned bytes and parses them independently.

Two passes over the bytes, both fully parallel, nothing corpus-scale on
the driver.  (At 100 TB the ``open()+seek`` here becomes an object-store
ranged GET; the planner math is unchanged.)

Parsing within a record-aligned chunk uses the stdlib ``csv`` module
(C-implemented state machine); the from-scratch part of this source is
the splitting algebra above, which no stdlib covers.
"""

from __future__ import annotations

import csv
import io

import numpy as np

_NL = 0x0A
_QUOTE = 0x22


def quote_field(s: str) -> str:
    """RFC 4180 minimal quoting."""
    if any(c in s for c in (',', '"', '\n', '\r')):
        return '"' + s.replace('"', '""') + '"'
    return s


def write_csv_bytes(header: list[str], rows) -> bytes:
    """Serialize rows (iterable of tuples of str-able values) with
    minimal RFC 4180 quoting and ``\\n`` record terminators.

    Uses ``quote_field`` rather than ``csv.writer(QUOTE_MINIMAL)``:
    the stdlib writer only quotes characters in its ``lineterminator``,
    so a lone ``\\r`` in a field would be emitted unquoted — bytes that
    ``parse_csv_chunk`` (rightly) rejects."""
    lines = [",".join(quote_field(str(v)) for v in header)]
    for r in rows:
        lines.append(",".join(quote_field(str(v)) for v in r))
    return ("\n".join(lines) + "\n").encode("utf-8")


def range_boundary_stats(buf: bytes) -> dict:
    """Scan-pass metadata for one byte range.

    Returns quote count plus, for each incoming quote parity p∈{0,1},
    the offset (relative to the range start) of the byte AFTER the first
    newline whose preceding in-range quote count has parity matching
    "outside quotes" given p — i.e. the first record boundary if the
    range starts with p quotes already seen globally.  -1 = no such
    newline in this range."""
    a = np.frombuffer(buf, dtype=np.uint8)
    nl = np.flatnonzero(a == _NL)
    qp = np.flatnonzero(a == _QUOTE)
    n_quotes = int(qp.size)
    # quotes strictly before each newline
    before = np.searchsorted(qp, nl)
    out = {"n_quotes": n_quotes, "bound_even": -1, "bound_odd": -1}
    if nl.size:
        even = nl[(before % 2) == 0]
        odd = nl[(before % 2) == 1]
        if even.size:
            out["bound_even"] = int(even[0]) + 1
        if odd.size:
            out["bound_odd"] = int(odd[0]) + 1
    return out


def plan_record_ranges(stats: list[dict], ranges: list[tuple[int, int]],
                       file_size: int) -> list[tuple[int, int]]:
    """Driver-side combine of the scan pass: true record-aligned ranges.

    ``stats[i]`` is range_boundary_stats of byte range ``ranges[i]``.
    Range 0 starts at byte 0 (a record boundary by definition); range
    i>0 starts at its first boundary newline under the true incoming
    parity, or is merged into the next range when it has none."""
    if len(stats) != len(ranges):
        raise ValueError("stats/ranges length mismatch")
    parity = 0
    starts: list[int] = [0]
    for i in range(1, len(ranges)):
        parity = (parity + stats[i - 1]["n_quotes"]) % 2
        rel = stats[i]["bound_even"] if parity == 0 else stats[i]["bound_odd"]
        if rel >= 0:
            starts.append(ranges[i][0] + rel)
    starts = sorted(set(starts))
    out = []
    for j, s in enumerate(starts):
        e = starts[j + 1] if j + 1 < len(starts) else file_size
        if e > s:
            out.append((s, e))
    return out


def parse_csv_chunk(data: bytes, n_cols: int | None) -> list[list[str]]:
    """Parse one record-aligned chunk. Raises on ragged rows so a
    mis-planned split is a loud error, never silent corruption
    (``n_cols=None`` skips the width check — used for the header
    record, whose width is what's being discovered)."""
    rows = list(csv.reader(io.StringIO(data.decode("utf-8")),
                           lineterminator="\n"))
    if n_cols is not None:
        for r in rows:
            if len(r) != n_cols:
                raise ValueError(
                    f"CSV record has {len(r)} fields, expected {n_cols}: "
                    f"{r!r}")
    return rows


def read_first_record(f) -> bytes:
    """Read the first FULL RFC 4180 record from a binary file object:
    physical lines are appended until the quote parity of the bytes so
    far is even, so a header with a quoted comma or a quoted NEWLINE
    parses as one record (``readline`` alone stops mid-field)."""
    rec = f.readline()
    while rec and rec.count(b'"') % 2 == 1:
        nxt = f.readline()
        if not nxt:
            break
        rec += nxt
    return rec
