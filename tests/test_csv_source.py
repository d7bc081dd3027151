"""Distributed splittable CSV source: quote-parity planner + round-trip."""

import os

import numpy as np
import pytest

from dup_ocropy_ray.functions import csvx

SF = "/root/testdata/sf0.001"


def _plan_rows(blob: bytes, num_splits: int, n_cols: int,
               header: bool = True):
    """Pure-function reference of the planner+parse path (no Ray)."""
    size = len(blob)
    num_splits = max(1, min(num_splits, size))
    step = size // num_splits
    ranges = [(i * step, (i + 1) * step if i < num_splits - 1 else size)
              for i in range(num_splits)]
    stats = [csvx.range_boundary_stats(blob[s:e]) for s, e in ranges]
    rec = csvx.plan_record_ranges(stats, ranges, size)
    hdr_skip = blob.index(b"\n") + 1 if header else 0
    rows = []
    for s, e in rec:
        if s == 0:
            s = hdr_skip
        if e > s:
            rows.extend(csvx.parse_csv_chunk(blob[s:e], n_cols))
    return rows


def test_quote_parity_split_pathological():
    """Quoted newlines and escaped quotes deliberately straddle every
    candidate split point; every split count must parse identically."""
    rows = [
        ("1", 'a,"b"\nc', "x"),
        ("2", '""' * 7 + "\n\n\n,", "y"),
        ("3", "plain", 'q"q\nq'),
        ("4", "", ",\n,"),
        ("5", '"' * 5, "tail"),
    ]
    blob = csvx.write_csv_bytes(["id", "f", "g"], rows)
    expect = [list(r) for r in rows]
    for n in range(1, len(blob) + 1):
        got = _plan_rows(blob, n, 3)
        assert got == expect, f"num_splits={n}"


def test_ragged_row_is_loud():
    with pytest.raises(ValueError, match="fields"):
        csvx.parse_csv_chunk(b"a,b\nc\n", 2)


def test_range_boundary_stats_parities():
    # '"ab\ncd",x\n' — the first newline is inside quotes (odd local
    # count before it), the second is a boundary under even incoming
    # parity
    buf = b'"ab\ncd",x\n'
    st = csvx.range_boundary_stats(buf)
    assert st["n_quotes"] == 2
    assert st["bound_even"] == buf.index(b"x") + 2  # after trailing \n
    assert st["bound_odd"] == buf.index(b"\n") + 1


def test_read_csv_dist_roundtrip_and_split_invariance(ray_session):
    from dup_ocropy_ray.sources.csvgen import (build_csv_corpus,
                                               read_csv_dist)

    path = build_csv_corpus(SF)
    base = read_csv_dist(path, num_splits=1).to_pandas()
    base["doc_id"] = base["doc_id"].astype("int64")
    base = base.sort_values("doc_id").reset_index(drop=True)
    assert list(base.columns) == ["doc_id", "payload", "source", "n_chars"]
    assert (base["payload"].str.contains("\n")).all()  # dirtiness held
    for n in (7, 16):
        got = read_csv_dist(path, num_splits=n).to_pandas()
        got["doc_id"] = got["doc_id"].astype("int64")
        got = got.sort_values("doc_id").reset_index(drop=True)
        assert got.equals(base), f"num_splits={n}"
    # payload formula parity with the table it was derived from
    import pyarrow.parquet as pq

    from dup_ocropy_ray.sources.csvgen import payload_of

    t = pq.read_table(os.path.join(SF, "documents.parquet"),
                      columns=["doc_id", "text", "source"]).to_pandas()
    t = t.sort_values("doc_id").reset_index(drop=True)
    assert len(t) == len(base)
    i = int(np.argmax(t["text"].str.len().to_numpy()))
    assert base["payload"].iloc[i] == payload_of(t["text"].iloc[i],
                                                 t["source"].iloc[i])


def test_quoted_header_and_cr_fields(ray_session, tmp_path):
    """Headers with quoted commas/newlines parse to the true width, a
    lone CR in a field survives the writer->parser round trip, and an
    empty file is a loud error (not an IndexError)."""
    from dup_ocropy_ray.sources.csvgen import read_csv_dist

    # quoted comma + quoted NEWLINE in the header record
    blob = csvx.write_csv_bytes(["a,b", "c\nd", "e"],
                                [("1", "2", "3"), ("x,y", "z\nw", "v")])
    p = tmp_path / "hdr.csv"
    p.write_bytes(blob)
    for n in (1, 3, len(blob)):
        df = read_csv_dist(str(p), num_splits=n).to_pandas()
        assert list(df.columns) == ["a,b", "c\nd", "e"], f"splits={n}"
        assert len(df) == 2
        assert sorted(df["c\nd"]) == ["2", "z\nw"]
    # header=False on a first record with quoted separators
    df = read_csv_dist(str(p), num_splits=2, header=False).to_pandas()
    assert list(df.columns) == ["c0", "c1", "c2"]
    assert len(df) == 3
    # lone CR round trip (csv.writer(QUOTE_MINIMAL) leaves \r unquoted;
    # write_csv_bytes must not)
    blob = csvx.write_csv_bytes(["f", "g"], [("a\rb", "plain")])
    rows = csvx.parse_csv_chunk(blob, 2)
    assert rows == [["f", "g"], ["a\rb", "plain"]]
    # empty file -> ValueError
    empty = tmp_path / "empty.csv"
    empty.write_bytes(b"")
    with pytest.raises(ValueError, match="empty"):
        read_csv_dist(str(empty))
