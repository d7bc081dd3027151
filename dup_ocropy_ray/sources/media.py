"""Media (image blob) resolution for ``media_ref`` columns.

Two scale regimes (SURVEY.md §1.3, ray_guide "Joins and lookups"):

- **broadcast** (default here; media store fits the object store): the
  driver ``ray.put``s a {media_ref: bytes} dict ONCE; each resolver task
  reads it zero-copy from the object store — never re-shipped per batch.
- **join** (100 TB path): the media store is its own Dataset keyed by
  ``media_ref``; pages join to blobs with a hash-partitioned
  ``Dataset.join`` so neither side is materialized on one node.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import ray


def load_media_table(path: str) -> pa.Table:
    if path.endswith(".lance"):
        import lance

        return lance.dataset(path).to_table()
    return pq.read_table(path)


def put_media_store(path: str) -> "ray.ObjectRef":
    """Broadcast the media blob store once (driver side)."""
    t = load_media_table(path)
    store = dict(zip(t.column("media_ref").to_pylist(), t.column("bytes").to_pylist()))
    return ray.put(store)


class MediaResolver:
    """Actor-pool UDF: media_ref -> page_png via the broadcast store.
    The ray.get in __init__ is once per actor and zero-copy."""

    def __init__(self, store_ref):
        self.store = ray.get(store_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        blobs = [self.store.get(r) for r in refs]
        out = batch.append_column("page_png", pa.array(blobs, pa.binary()))
        # G7: sibling "<ref>.mask" = user separator mask (reference
        # ocropus-gpageseg:268-276); null where absent
        return out.append_column(
            "mask_png",
            pa.array([self.store.get(r + ".mask") for r in refs], pa.binary()),
        )


def resolve_media_join(pages, media, num_partitions: int = 16):
    """Scale path: hash-partitioned join pages⋈media on media_ref
    (both sides large). Returns pages with a page_png column."""
    media = media.map_batches(
        lambda t: t.rename_columns(
            ["media_ref", "page_png"]
        ),
        batch_format="pyarrow",
    )
    return pages.join(
        media,
        join_type="inner",
        num_partitions=num_partitions,
        on=("media_ref",),
    )
