"""Execution-context tuning for this engine's workload shape.

The OCR chain is many chained map stages with TINY inter-stage outputs
(KBs of text rows) but heavy per-batch CPU (image kernels, LSTM matmuls).
Ray Data's default per-operator resource reservation
(``ReservationOpResourceAllocator``: 50% of cluster CPUs split evenly
across operators) throttles the one hot map stage to ~1-2 concurrent
tasks when the DAG has 6+ operators on a small node — measured 3.5x
end-to-end slowdown at 8 CPUs. Reservation exists to bound memory for
large inter-stage outputs, which this pipeline never produces, so we
disable it and let the streaming executor schedule by demand.

Must run BEFORE datasets are created (each Dataset snapshots the
context); every reader/pipeline builder in this package calls it.
"""

from __future__ import annotations

from ray.data import DataContext


def configure_data_context(ctx: DataContext | None = None) -> DataContext:
    ctx = ctx or DataContext.get_current()
    ctx.op_resource_reservation_enabled = False
    return ctx


def parquet_schema(path: str, columns=None):
    """Footer-only read of a parquet file's schema, with pandas/user
    metadata stripped.  Passed to ``read_parquet(schema=...)`` so every
    block's schema is hashable — pyarrow Schemas carrying metadata raise
    ``unhashable type: 'dict'`` inside Ray's schema-dedup fast path
    (transform_pyarrow.unify_schemas), which both defeats the early-exit
    and spams a warning per task."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "**", "*.parquet"),
                                 recursive=True))
        if not files:
            return None
        path = files[0]
    sch = pq.read_schema(path)
    if columns is not None:
        return pa.schema([sch.field(c) for c in columns])
    return sch.remove_metadata()
