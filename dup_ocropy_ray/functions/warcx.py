"""From-scratch WARC 1.0 codec (ISO 28500 record grammar, the web-archive
container format Common Crawl ships crawl data in).

No external WARC library — the grammar is tiny and writing it ourselves
keeps the reader dependency-free and byte-auditable:

- one record = ``WARC/1.0\r\n`` + header lines (``Name: value\r\n``) +
  ``\r\n`` + exactly ``Content-Length`` payload bytes + ``\r\n\r\n``;
- a ``.warc.gz`` shard is a CONCATENATION of independently-gzipped
  records (one gzip member per record).  That member-per-record layout
  is the load-bearing scale property: a CDX-style index of
  ``(offset, length)`` pairs lets a reader decompress ONE record out of
  a multi-GiB shard with a single ranged read — no full-shard scan.
  ``read_record_at`` below exercises exactly that path.

Determinism: gzip members are written with ``mtime=0`` and records carry
a fixed ``WARC-Date`` plus a content-derived ``WARC-Record-ID``, so the
same logical corpus always produces byte-identical shards (required for
the cache-keyed fixture corpus and the resume story).
"""

from __future__ import annotations

import gzip
import hashlib
import io
import zlib

_CRLF = b"\r\n"
_FIXED_DATE = "2026-01-01T00:00:00Z"


def _record_id(uri: str, payload: bytes) -> str:
    h = hashlib.md5(uri.encode() + b"\x00" + payload).hexdigest()
    return f"<urn:md5:{h}>"


def build_record(
    uri: str,
    payload: bytes,
    rec_type: str = "response",
    content_type: str = "text/html; charset=utf-8",
    date: str = _FIXED_DATE,
    extra_headers: dict | None = None,
) -> bytes:
    """Serialize one uncompressed WARC record."""
    if not isinstance(payload, bytes):
        raise TypeError("payload must be bytes")
    headers = [
        ("WARC-Type", rec_type),
        ("WARC-Target-URI", uri),
        ("WARC-Date", date),
        ("WARC-Record-ID", _record_id(uri, payload)),
        ("Content-Type", content_type),
        ("Content-Length", str(len(payload))),
    ]
    for k, v in (extra_headers or {}).items():
        headers.append((k, str(v)))
    buf = io.BytesIO()
    buf.write(b"WARC/1.0" + _CRLF)
    for k, v in headers:
        buf.write(f"{k}: {v}".encode() + _CRLF)
    buf.write(_CRLF)
    buf.write(payload)
    buf.write(_CRLF + _CRLF)
    return buf.getvalue()


def _parse_one(data: bytes, start: int) -> tuple[dict, int]:
    """Parse the record starting at ``start``; returns (record, end).

    record = {"headers": {lower-name: value}, "payload": bytes}.
    """
    head_end = data.find(_CRLF + _CRLF, start)
    if head_end < 0:
        raise ValueError("truncated WARC record: no header terminator")
    head = data[start:head_end].decode("utf-8", "replace")
    lines = head.split("\r\n")
    if not lines[0].startswith("WARC/"):
        raise ValueError(f"bad WARC version line: {lines[0]!r}")
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        if not ln:
            continue
        k, _, v = ln.partition(":")
        headers[k.strip().lower()] = v.strip()
    try:
        clen = int(headers["content-length"])
    except KeyError:
        raise ValueError("WARC record missing Content-Length")
    body_start = head_end + 4
    body_end = body_start + clen
    if data[body_end:body_end + 4] != _CRLF + _CRLF:
        raise ValueError("WARC record missing trailing CRLFCRLF")
    return ({"headers": headers, "payload": data[body_start:body_end]},
            body_end + 4)


def iter_warc(data: bytes):
    """Yield records from an UNCOMPRESSED .warc byte string."""
    pos = 0
    while pos < len(data):
        rec, pos = _parse_one(data, pos)
        yield rec


def iter_warc_gz(data: bytes):
    """Yield ``(offset, length, record)`` from a member-per-record
    ``.warc.gz`` byte string.  offset/length address the COMPRESSED
    member inside the shard — exactly what a CDX index stores."""
    pos = 0
    n = len(data)
    # feed each member in bounded chunks off a memoryview: handing the
    # whole remaining shard to decompress() would both copy it on the
    # slice AND get the tail copied back out via d.unused_data after
    # every member — O(records x shard_size) memcpy on a 10k-member
    # shard. Chunked, unused_data is at most one chunk.
    view = memoryview(data)
    chunk = 1 << 20
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        parts = []
        fed = 0
        while not d.eof and pos + fed < n:
            nxt = min(pos + fed + chunk, n)
            parts.append(d.decompress(view[pos + fed:nxt]))
            fed = nxt - pos
        if not d.eof:
            raise ValueError("truncated gzip member in .warc.gz")
        consumed = fed - len(d.unused_data)
        rec, _ = _parse_one(b"".join(parts), 0)
        yield pos, consumed, rec
        pos += consumed


def read_record_at(data: bytes, offset: int, length: int) -> dict:
    """Ranged record fetch: decompress ONE gzip member addressed by a
    CDX-style (offset, length) pair.  At 100 TB this is the random-access
    path — the caller reads only ``length`` bytes from storage."""
    member = data[offset:offset + length]
    raw = gzip.decompress(member)
    rec, _ = _parse_one(raw, 0)
    return rec


def write_warc_gz(records: list[tuple]) -> tuple[bytes, list[dict]]:
    """Serialize ``[(uri, payload[, content_type]), ...]`` into
    member-per-record .warc.gz bytes plus its CDX-style index
    ``[{uri, offset, length}, ...]``.  Deterministic (mtime=0)."""
    out = io.BytesIO()
    index: list[dict] = []
    for rec in records:
        uri, payload = rec[0], rec[1]
        kwargs = {"content_type": rec[2]} if len(rec) > 2 else {}
        member = gzip.compress(build_record(uri, payload, **kwargs), mtime=0)
        index.append({"uri": uri, "offset": out.tell(), "length": len(member)})
        out.write(member)
    return out.getvalue(), index
