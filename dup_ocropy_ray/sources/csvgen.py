"""Deterministic dirty-CSV corpus + distributed splittable CSV reader.

The ingestion story this covers: upstream dumps arrive as big CSV files
whose fields embed commas, escaped quotes and NEWLINES — so the file
cannot be split at arbitrary newlines.  ``read_csv_dist`` turns one such
file into a ``ray.data.Dataset`` with record-aligned parallel reads via
the two-pass quote-parity planner in functions/csvx.py: a metadata-only
scan pass (one task per byte range), a num_splits-row driver combine,
then a parse pass (one task per record-aligned range).

``build_csv_corpus`` renders the sandbox ``documents`` table into one
such file with a payload field that is *derived from the text by a
SQL-replicable formula*, so the round-trip oracle (queries.q_csv_read ↔
SQL_CSV_READ) proves the whole chain — quoting, splitting, parsing —
byte-losslessly against DuckDB recomputing the payload from the source
table.  Reference analogue: ocropy ingests work lists from plain text
files (ocrolib/common.py glob/file helpers); this is the
engine-shaped equivalent for tabular sidecar data.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from ..functions import csvx

HEADER = ["doc_id", "payload", "source", "n_chars"]


def _version() -> str:
    from . import content_version

    return content_version(__file__, ("csvgen.py", "../functions/csvx.py"))


def payload_of(text: str, source: str) -> str:
    """The dirty field: embeds a quote, a comma, and a newline.  MUST
    stay in lockstep with the SQL twin (queries.SQL_CSV_READ):
    'q="' || substr(text,1,40) || '", nl:' || chr(10) || source."""
    return f'q="{text[:40]}", nl:\n{source}'


def build_csv_corpus(sf_dir: str, root: str = "/tmp") -> str:
    """Write the documents table as ONE dirty CSV file (cached per
    (sf, code version)); returns the file path.

    The builder is fixture-scale (one serializer task); the *reader* is
    the distributed operator under test.  Publication is atomic
    (tmp + rename) so concurrent builders can't expose a torn file."""
    key = hashlib.sha1(
        f"{os.path.abspath(sf_dir)}|{_version()}".encode()).hexdigest()[:12]
    path = os.path.join(root, f"csv_corpus_{key}.csv")
    if os.path.exists(path):
        return path
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text", "source"])
    df = t.to_pandas().sort_values("doc_id")
    rows = [
        (int(i), payload_of(tx if isinstance(tx, str) else "", s), s,
         len(tx) if isinstance(tx, str) else 0)
        for i, tx, s in zip(df["doc_id"], df["text"], df["source"])
    ]
    blob = csvx.write_csv_bytes(HEADER, rows)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(blob)
    try:
        os.rename(tmp, path)
    except OSError:
        os.unlink(tmp)
    return path


def read_csv_dist(path: str, num_splits: int = 16,
                  header: bool = True) -> rd.Dataset:
    """Distributed record-aligned CSV read → Dataset of string columns.

    Scan pass and parse pass are both one-task-per-range map_batches
    over a from_items range list; only the num_splits-row boundary
    stats land on the driver.  Column names come from the header row
    (or c0..cN when header=False); all values are strings — callers
    cast (schema inference over 100 TB is its own scan; explicit casts
    keep this a single-purpose operator)."""
    size = os.path.getsize(path)
    if size == 0:
        raise ValueError(f"read_csv_dist: empty file {path!r}")
    num_splits = max(1, min(num_splits, size))
    step = size // num_splits
    ranges = [(i * step, (i + 1) * step if i < num_splits - 1 else size)
              for i in range(num_splits)]

    def scan(b: pa.Table) -> pa.Table:
        outs = []
        for s, e in zip(b.column("start").to_pylist(),
                        b.column("end").to_pylist()):
            with open(path, "rb") as f:
                f.seek(s)
                st = csvx.range_boundary_stats(f.read(e - s))
            outs.append((s, st["n_quotes"], st["bound_even"],
                         st["bound_odd"]))
        return pa.table({
            "start": pa.array([o[0] for o in outs], pa.int64()),
            "n_quotes": pa.array([o[1] for o in outs], pa.int64()),
            "bound_even": pa.array([o[2] for o in outs], pa.int64()),
            "bound_odd": pa.array([o[3] for o in outs], pa.int64()),
        })

    rng_ds = rd.from_items(
        [{"start": s, "end": e} for s, e in ranges])
    stats_df = (rng_ds.map_batches(scan, batch_format="pyarrow",
                                   batch_size=1)
                .to_pandas().sort_values("start"))
    stats = [{"n_quotes": int(r.n_quotes), "bound_even": int(r.bound_even),
              "bound_odd": int(r.bound_odd)}
             for r in stats_df.itertuples()]
    rec_ranges = csvx.plan_record_ranges(stats, ranges, size)

    # header row: names + where data starts inside the first range.
    # The first record is read by quote parity and parsed by the real
    # CSV parser — a quoted comma or quoted newline in the header (or
    # in the first record when header=False) yields the true width.
    with open(path, "rb") as f:
        head_rec = csvx.read_first_record(f)
    fields = csvx.parse_csv_chunk(head_rec, None)[0]
    names = fields if header else [f"c{i}" for i in range(len(fields))]
    n_cols = len(fields)
    hdr_skip = len(head_rec) if header else 0

    def parse(b: pa.Table) -> pa.Table:
        cols: list[list[str]] = [[] for _ in range(n_cols)]
        for s, e in zip(b.column("start").to_pylist(),
                        b.column("end").to_pylist()):
            if s == 0:
                s = hdr_skip  # the first range owns (and skips) the header
            if e <= s:
                continue
            with open(path, "rb") as f:
                f.seek(s)
                data = f.read(e - s)
            for r in csvx.parse_csv_chunk(data, n_cols):
                for j, v in enumerate(r):
                    cols[j].append(v)
        return pa.table({nm: pa.array(c, pa.string())
                         for nm, c in zip(names, cols)})

    return rd.from_items(
        [{"start": s, "end": e} for s, e in rec_ranges]
    ).map_batches(parse, batch_format="pyarrow", batch_size=1)
