"""Schema-evolution parquet reader: one Dataset over files written at
different schema generations (new columns appended, integer/float
widths widened) — the read a long-lived lakehouse table needs, since
rewriting 10^12 rows on every column addition is not an option.

The unified schema comes from a METADATA-ONLY footer scan on the
driver (pyarrow ``read_schema`` per file — no data bytes move), with an
explicit promotion lattice: integer widths widen among integers, float
widths among floats, int + float promotes to float64, null promotes to
anything, first-seen column order wins. Anything outside the lattice
(string vs int, timestamp unit clash) raises loudly at PLAN time — a
silent cast at task time is how a 10^12-row read corrupts a column.
The actual scan is a single ``ray.data.read_parquet`` with the unified
schema pushed into every fragment scanner: missing columns materialize
as nulls and compatible casts happen inside the read tasks, zero-copy
Arrow end to end.

Reference analogue: ocropy reads directory trees of page files whose
sidecar sets grew over releases (ocrolib/common.py glob helpers);
engine-shaped here as evolving columnar generations."""

from __future__ import annotations

import glob as _glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

_INT_ORDER = {pa.int8(): 0, pa.int16(): 1, pa.int32(): 2, pa.int64(): 3}
_UINT_ORDER = {pa.uint8(): 0, pa.uint16(): 1, pa.uint32(): 2,
               pa.uint64(): 3}
_FLOAT_ORDER = {pa.float16(): 0, pa.float32(): 1, pa.float64(): 2}


def _promote(a: pa.DataType, b: pa.DataType) -> pa.DataType:
    if a == b:
        return a
    if pa.types.is_null(a):
        return b
    if pa.types.is_null(b):
        return a
    if a in _INT_ORDER and b in _INT_ORDER:
        return a if _INT_ORDER[a] >= _INT_ORDER[b] else b
    if a in _UINT_ORDER and b in _UINT_ORDER:
        return a if _UINT_ORDER[a] >= _UINT_ORDER[b] else b
    if a in _FLOAT_ORDER and b in _FLOAT_ORDER:
        return a if _FLOAT_ORDER[a] >= _FLOAT_ORDER[b] else b
    num = lambda t: t in _INT_ORDER or t in _UINT_ORDER or t in _FLOAT_ORDER
    if num(a) and num(b):
        # int x float (or signed x unsigned): float64 holds every int
        # exactly up to 2^53; widening past that is ambiguous -> the
        # conservative common type is float64, same as Arrow's own
        # unify_schemas promotion
        return pa.float64()
    raise TypeError(
        f"read_parquet_evolving: columns disagree beyond the promotion "
        f"lattice ({a} vs {b}); fix the writers or read the generations "
        f"separately")


def unify_parquet_schemas(paths: list[str]) -> pa.Schema:
    """Unified schema for a list of parquet files — footer metadata
    only, no data reads. First-seen column order; per-column type
    promotion via :func:`_promote`; loud error on incompatibles."""
    if not paths:
        raise FileNotFoundError("unify_parquet_schemas: no files")
    order: list[str] = []
    types: dict[str, pa.DataType] = {}
    for p in paths:
        sch = pq.read_schema(p)
        for f in sch:
            if f.name not in types:
                order.append(f.name)
                types[f.name] = f.type
            else:
                types[f.name] = _promote(types[f.name], f.type)
    return pa.schema([(n, types[n]) for n in order])


def read_parquet_evolving(path: str | list[str],
                          columns: list[str] | None = None) -> rd.Dataset:
    """Read a directory (or explicit list) of parquet files written at
    different schema generations as ONE Dataset with the unified
    schema: added columns are null for older files, widened numerics
    cast inside the read tasks. ``columns`` prunes at the read as
    usual (the unified schema is still computed from full footers so
    promotion conflicts surface even in pruned scans)."""
    if isinstance(path, str):
        paths = sorted(_glob.glob(os.path.join(path, "**", "*.parquet"),
                                  recursive=True))
    else:
        paths = list(path)
    schema = unify_parquet_schemas(paths)
    if columns is not None:
        missing = [c for c in columns if c not in schema.names]
        if missing:
            raise KeyError(f"read_parquet_evolving: {missing} not in any "
                           f"generation")
        schema = pa.schema([schema.field(c) for c in columns])
    # prune via the schema alone: passing columns= as well makes Ray's
    # fragment reader project BEFORE null-filling, which crashes on
    # files that predate a requested column
    return rd.read_parquet(paths, schema=schema)
