"""Deterministic interleaved-document corpus builder.

Synthesizes the engine's primary input shape (FIXTURES.md §1 /
BASELINE.json input_hint): a ``docs`` table
``(doc_id:string, spans:list<struct<kind,text,media_ref,offset>>)``, a
``media(media_ref, bytes)`` blob sidecar of PNG page images, and a
``groundtruth(doc_id, media_ref, line_order, gt_text)`` table for the
span-sequence / CER invariants. Mirrors the reference's fixture families
(reference tests/: uw3-500 line corpus, testpage.png full pages,
check_page skip cases — see run-test-ci:20-133) without any external data.

Written as parquet (Lance is not installed in this sandbox; the writer
upgrades to ``write_lance`` transparently when the ``lance`` package is
available — see ``_write_table``).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions import png
from ..schema import DOCS_SCHEMA, GROUNDTRUTH_SCHEMA, MEDIA_SCHEMA
from . import glyphs

# deterministic word pool in the same spirit as the testdata tables
_WORDS = (
    "key agg row scan slow fast table value part hash merge batch data query "
    "small big line customer order column join window stream filter sort group "
    "the a spark index block shard split plan push prune stage actor arrow"
).split()


def make_doc_texts(rng: np.random.Generator, n_lines: int) -> list[str]:
    lines = []
    for _ in range(n_lines):
        k = int(rng.integers(2, 5))
        lines.append(" ".join(rng.choice(_WORDS, size=k)))
    return lines


def _write_table(table: pa.Table, path: str) -> str:
    """Parquet by default; Lance when available (same logical table)."""
    try:
        import lance  # noqa: F401

        lance.write_dataset(table, path + ".lance")
        return path + ".lance"
    except ImportError:
        pq.write_table(table, path + ".parquet")
        return path + ".parquet"


def renderer_version() -> str:
    """Content hash of the rendering code — cache keys for corpora built
    from these modules MUST include it, or stale /tmp corpora rendered by
    an older glyph renderer silently mismatch a model trained on the
    current one."""
    from . import content_version

    return content_version(__file__, ("glyphs.py", "fixtures.py"))


def build_corpus(
    root: str,
    num_docs: int = 20,
    seed: int = 42,
    lines_per_page: tuple[int, int] = (3, 7),
    skew_doc_pages: int = 6,
    include_edge_cases: bool = True,
    texts: list[str] | None = None,
    max_line_chars: int = 24,
) -> dict:
    """Build a deterministic corpus under `root`.

    - doc 0 is the "skew" document with `skew_doc_pages` pages (drives the
      salt+repartition path, FIXTURES.md F5);
    - the last doc (when include_edge_cases) carries a too-small page that
      must take the check_page skip path (reference ocropus-nlbin:61-69);
    - every other doc has 1 page. Docs get a leading kind='text' title
      span that must pass through recognition untouched.

    When `texts` is given, page line content comes from wrapping those
    strings (e.g. the testdata documents table) instead of the word pool.

    Returns {"docs": path, "media": path, "groundtruth": path,
             "num_pages": int}.
    """
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)

    doc_rows: list[dict] = []
    media_rows: list[dict] = []
    gt_rows: list[dict] = []
    num_pages = 0

    for d in range(num_docs):
        doc_id = f"doc-{d:06d}"
        spans = []
        offset = 0
        spans.append(
            {"kind": "text", "text": f"title of {doc_id}", "media_ref": None, "offset": offset}
        )
        offset += 1
        if d == 0:
            n_pages = max(1, skew_doc_pages)
        else:
            n_pages = 1
        is_edge = include_edge_cases and d == num_docs - 1 and num_docs > 1
        for p in range(n_pages):
            ref = f"mem://{doc_id}/page-{p:04d}.png"
            if is_edge:
                # too-small page: check_page must mark it skipped
                img = np.ones((120, 200), dtype=np.float64)
                img[40:60, 40:120] = 0.0
                lines: list[str] = []
            else:
                if texts is not None:
                    src = texts[(d * 7 + p) % len(texts)]
                    lines = glyphs.wrap_text(src, max_chars=max_line_chars)[
                        : int(rng.integers(*lines_per_page))
                    ]
                    if not lines:
                        lines = make_doc_texts(rng, 3)
                else:
                    lines = make_doc_texts(rng, int(rng.integers(*lines_per_page)))
                img = glyphs.render_page(lines)
            media_rows.append({"media_ref": ref, "bytes": png.encode_gray(img)})
            spans.append({"kind": "media", "text": None, "media_ref": ref, "offset": offset})
            offset += 1
            for i, t in enumerate(lines):
                gt_rows.append(
                    {"doc_id": doc_id, "media_ref": ref, "line_order": i, "gt_text": t}
                )
            num_pages += 1
        if is_edge:
            # two-column page with a user separator mask (G7 apply_mask,
            # reference ocropus-gpageseg:268-276 + tests/table.mask.png):
            # reading order = left column top-down, then right column
            left = make_doc_texts(rng, 3)
            right = make_doc_texts(rng, 3)
            pl = glyphs.render_page(left, min_width=400)
            pr = glyphs.render_page(right, min_width=400)
            h = max(pl.shape[0], pr.shape[0])

            def _padh(p):
                out = np.ones((h, p.shape[1]))
                out[: p.shape[0]] = p
                return out

            page = np.hstack([_padh(pl), _padh(pr)])
            mask = np.zeros(page.shape, dtype=np.float64)
            mid = page.shape[1] // 2
            mask[:, mid - 2 : mid + 2] = 1.0  # bright stripe = separator
            ref = f"mem://{doc_id}/page-mask.png"
            media_rows.append({"media_ref": ref, "bytes": png.encode_gray(page)})
            media_rows.append(
                {"media_ref": ref + ".mask", "bytes": png.encode_gray(mask)}
            )
            spans.append(
                {"kind": "media", "text": None, "media_ref": ref, "offset": offset}
            )
            offset += 1
            for i, t in enumerate(left + right):
                gt_rows.append(
                    {"doc_id": doc_id, "media_ref": ref, "line_order": i, "gt_text": t}
                )
            num_pages += 1
            # skewed page (B4 estimate_skew + deskew end-to-end,
            # reference ocropus-nlbin:71-81,131-144): rendered straight,
            # rotated 0.75 deg; the chain must deskew and still read it
            from dup_ocropy_ray.functions.imgops import rotate as _rot

            sk_lines = make_doc_texts(rng, 4)
            sk_img = _rot(glyphs.render_page(sk_lines), 0.75, cval=1.0)
            ref = f"mem://{doc_id}/page-skewed.png"
            media_rows.append({"media_ref": ref, "bytes": png.encode_gray(sk_img)})
            spans.append(
                {"kind": "media", "text": None, "media_ref": ref, "offset": offset}
            )
            offset += 1
            for i, t in enumerate(sk_lines):
                gt_rows.append(
                    {"doc_id": doc_id, "media_ref": ref, "line_order": i, "gt_text": t}
                )
            num_pages += 1
        doc_rows.append({"doc_id": doc_id, "spans": spans})

    docs = pa.Table.from_pylist(doc_rows, schema=DOCS_SCHEMA)
    media = pa.Table.from_pylist(media_rows, schema=MEDIA_SCHEMA)
    gt = pa.Table.from_pylist(gt_rows, schema=GROUNDTRUTH_SCHEMA)
    out = {
        "docs": _write_table(docs, os.path.join(root, "docs")),
        "media": _write_table(media, os.path.join(root, "media")),
        "groundtruth": _write_table(gt, os.path.join(root, "groundtruth")),
        "num_pages": num_pages,
    }
    return out


def _random_char_words(rng: np.random.Generator, chars: list[str],
                       n_words: int) -> str:
    """Words of uniformly random charset chars — coverage for rare chars
    (x, z, digits) in arbitrary neighbor contexts, which the English-ish
    word pool never produces (no 'z' word, 'x' only inside 'index')."""
    return " ".join(
        "".join(rng.choice(chars, size=int(rng.integers(2, 6))))
        for _ in range(n_words)
    )


def training_lines(num: int = 400, seed: int = 7, max_chars: int = 26):
    """(text, line_image) pairs for recognizer training — the reference's
    linegen-style training-set synthesis (ocropus-linegen:174-240)."""
    rng = np.random.default_rng(seed)
    pairs = []
    chars = [c for c in glyphs.CHARSET if c != " "]
    for i in range(num):
        if i < len(chars) * 2:
            # space-free coverage lines first: every char seen in context
            c = chars[i % len(chars)]
            other = chars[int(rng.integers(len(chars)))]
            text = (c + other + c + c)[: max_chars]
        elif i < len(chars) * 3:
            # spaced coverage
            c = chars[i % len(chars)]
            text = (c + " ") * 2 + c
        elif rng.random() < 0.25:
            # random-char words: rare chars beside arbitrary neighbors
            text = _random_char_words(rng, chars, int(rng.integers(2, 5)))
            text = text[:max_chars].strip()
        else:
            k = int(rng.integers(2, 6))
            text = " ".join(rng.choice(_WORDS, size=k))
            text = text[:max_chars].strip()
        pairs.append((text, glyphs.render_line(text)))
    return pairs


def training_lines_from_pages(
    num_pages: int = 200,
    seed: int = 11,
    max_line_chars: int = 24,
    lines_per_page: tuple[int, int] = (3, 8),
):
    """(text, crop) training pairs whose images went through the REAL
    binarize→segment→extract_masked chain, so the recognizer trains on
    the exact distribution inference sees (mask padding, neighbor-ink
    removal, threshold artifacts) — the residual gap that clean
    ``render_line`` images can't cover. Pages are simple line stacks, so
    reading-order rank equals render order; pages where segmentation
    disagrees on the line count are dropped rather than misaligned.
    Mirrors reference ocropus-linegen's role (ocropus-linegen:174-240)
    but with the production page chain as the degradation model."""
    from dup_ocropy_ray.stages.binarize import binarize_page
    from dup_ocropy_ray.stages.segment import segment_page

    rng = np.random.default_rng(seed)
    pairs = []
    for _ in range(num_pages):
        lines = [
            t[:max_line_chars].strip()
            for t in make_doc_texts(rng, int(rng.integers(*lines_per_page)))
        ]
        lines = [t for t in lines if t]
        if not lines:
            continue
        b = binarize_page(glyphs.render_page(lines))
        if b["status"]:
            continue
        s = segment_page(b["bin"])
        if s["status"] or len(s["lines"]) != len(lines):
            continue
        recs = sorted(s["lines"], key=lambda r: r["order"])
        for text, rec in zip(lines, recs):
            pairs.append((text, png.decode_gray(rec["png"])))
    return pairs
