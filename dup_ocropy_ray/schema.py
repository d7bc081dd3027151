"""Arrow schemas for the interleaved text+media document table and its
sidecars (shape per BASELINE.json input_hint / FIXTURES.md §1)."""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),  # 'text' | 'media'
        pa.field("text", pa.string()),  # non-null iff kind=='text'
        pa.field("media_ref", pa.string()),  # non-null iff kind=='media'
        pa.field("offset", pa.int32()),  # position within the document
    ]
)

DOCS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
    ]
)

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_ref", pa.string()),
        pa.field("bytes", pa.binary()),
    ]
)

GROUNDTRUTH_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("line_order", pa.int32()),
        pa.field("gt_text", pa.string()),
    ]
)

# per-line rows between segmentation and recognition
LINE_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("span_offset", pa.int32()),
        pa.field("line_order", pa.int32()),
        pa.field("y0", pa.int32()),
        pa.field("x0", pa.int32()),
        pa.field("y1", pa.int32()),
        pa.field("x1", pa.int32()),
        pa.field("line_png", pa.binary()),
    ]
)
