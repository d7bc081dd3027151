"""Dead-letter quarantine for batch UDF stages: at 10^12 documents a
handful of malformed rows WILL hit every stage, and one poison row must
not kill a fragment (or worse, the whole job). ``with_dead_letters``
wraps a per-batch pandas UDF so rows that make it raise are isolated by
binary bisection — O(k log n) extra UDF calls for k poison rows — and
emitted as schema-stable dead-letter rows carrying the row id and the
error, while every healthy row flows through unchanged.

The wrapped stage has ONE output schema (the declared output columns
plus ``_dlq_id`` / ``_dlq_error``), so Ray Data blocks stay uniform no
matter which rows fail; ``split_dead_letters`` then forks the stream
into the clean dataset and the quarantine dataset with two filters.
Reference analogue: ocropy CLIs wrap every page in a try/except that
prints and skips (e.g. ocropus-gpageseg process1 error handling);
engine-shaped here as a composable stage decorator with a durable
quarantine channel instead of a log line."""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def with_dead_letters(fn: Callable[[pd.DataFrame], pd.DataFrame],
                      out_schema: dict[str, str],
                      id_col: str = "doc_id"):
    """Wrap per-batch ``fn`` with poison-row quarantine.

    ``out_schema`` declares fn's output columns -> pandas dtypes (the
    stage must have a stable schema even for a batch where every row
    fails, so it cannot be inferred). The wrapped UDF returns fn's
    output plus null ``_dlq_id``/``_dlq_error`` for healthy rows, and
    all-null output columns plus the failing row's id and stringified
    exception for quarantined rows."""
    cols = list(out_schema)

    def _ok(out: pd.DataFrame) -> pd.DataFrame:
        out = out.copy()
        out["_dlq_id"] = pd.Series([None] * len(out), dtype="Int64")
        out["_dlq_error"] = pd.Series([None] * len(out), dtype="string")
        return out[cols + ["_dlq_id", "_dlq_error"]]

    def _dead(ids: np.ndarray, err: str) -> pd.DataFrame:
        out = pd.DataFrame(
            {c: pd.Series([pd.NA] * len(ids), dtype=out_schema[c])
             for c in cols})
        out["_dlq_id"] = pd.Series(ids, dtype="Int64")
        out["_dlq_error"] = pd.Series([err] * len(ids), dtype="string")
        return out[cols + ["_dlq_id", "_dlq_error"]]

    def _run(b: pd.DataFrame) -> list[pd.DataFrame]:
        try:
            return [_ok(fn(b))]
        except Exception as ex:  # noqa: BLE001 — quarantine, don't guess
            if len(b) == 1:
                return [_dead(b[id_col].to_numpy(np.int64),
                              f"{type(ex).__name__}: {ex}")]
            mid = len(b) // 2
            return (_run(b.iloc[:mid].reset_index(drop=True))
                    + _run(b.iloc[mid:].reset_index(drop=True)))

    def wrapped(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return _dead(np.array([], dtype=np.int64), "")
        return pd.concat(_run(b), ignore_index=True)

    return wrapped


def split_dead_letters(ds: rd.Dataset) -> tuple[rd.Dataset, rd.Dataset]:
    """Fork a dead-letter-wrapped stage's output into (clean,
    quarantine): clean drops the DLQ columns, quarantine keeps only
    (_dlq_id, _dlq_error)."""
    def clean(b: pd.DataFrame) -> pd.DataFrame:
        return (b[b["_dlq_error"].isna()]
                .drop(columns=["_dlq_id", "_dlq_error"])
                .reset_index(drop=True))

    _DLQ_SCHEMA = pa.schema([("_dlq_id", pa.int64()),
                             ("_dlq_error", pa.string())])

    def dead(b: pd.DataFrame) -> pa.Table:
        m = b["_dlq_error"].notna().to_numpy()
        # explicit Arrow schema: zero-survivor blocks keep typed columns
        # (empty pandas string/object blocks trip Ray's size estimator)
        return pa.table({
            "_dlq_id": pa.array(
                b["_dlq_id"].to_numpy(dtype="float64", na_value=np.nan)[m]
                .astype(np.int64)),
            "_dlq_error": pa.array(b["_dlq_error"][m].astype(str)),
        }, schema=_DLQ_SCHEMA)

    return (ds.map_batches(clean, batch_format="pandas"),
            ds.map_batches(dead, batch_format="pandas"))
