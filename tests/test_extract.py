"""Main-content extraction (functions/htmlx.py, pipelines/extract.py)."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from dup_ocropy_ray.functions.htmlx import (
    extract_main_text,
    extract_spans,
    parse_html,
)
from dup_ocropy_ray.sources.webgen import wrap_html


def test_parse_tolerates_malformed_html():
    root = parse_html(
        "<div><p>alpha<p>beta</div></span><b>gamma"  # unclosed p, stray end
    )
    texts = []

    def grab(n):
        for c in n.children:
            if isinstance(c, str):
                texts.append(c)
            else:
                grab(c)

    grab(root)
    assert "".join(texts) == "alphabetagamma"


def test_extract_generic_page_without_class_hints():
    """No positive/negative class names anywhere: pure density + link
    heuristics must still pick the content div over link-heavy junk."""
    junk_links = "".join(f'<a href="/x{i}">item {i}</a> ' for i in range(20))
    body = (
        f"<div><ul>{junk_links}</ul></div>"
        "<div><p>The quick brown fox jumps over the lazy dog, repeatedly, "
        "and keeps going with a second sentence of real prose.</p>"
        "<p>Another paragraph with enough text mass, commas, and periods "
        "to dominate the candidate scoring.</p></div>"
        f"<div>{junk_links}</div>"
    )
    out = extract_main_text(f"<html><body>{body}</body></html>")
    assert "quick brown fox" in out
    assert "Another paragraph" in out
    assert "item 3" not in out


def test_extract_drops_script_style_and_nav():
    html = (
        "<html><head><script>var a=1;</script><style>p{}</style></head>"
        "<body><nav><a href='/'>Home</a><a href='/b'>B</a></nav>"
        "<div><p>Real content paragraph, long enough to be scored as the "
        "main candidate of this small page, with punctuation.</p></div>"
        "<footer>copyright junk</footer></body></html>"
    )
    out = extract_main_text(html)
    assert out.startswith("Real content")
    assert "Home" not in out and "copyright" not in out and "var a" not in out


def test_span_sequence_interleaves_media_in_order():
    html = (
        "<html><body><article>"
        "<p>First paragraph of the story, with plenty of words to score.</p>"
        '<img src="img://a/1">'
        "<p>Second paragraph continues after the figure, also long enough.</p>"
        '<img src="img://a/2">'
        "</article></body></html>"
    )
    spans = extract_spans(html)
    seq = [(s["kind"], s["media_ref"]) for s in spans]
    assert [k for k, _ in seq] == ["text", "media", "text", "media"]
    assert seq[1][1] == "img://a/1" and seq[3][1] == "img://a/2"
    assert [s["offset"] for s in spans] == [0, 1, 2, 3]


def test_wrap_extract_identity_property():
    """extract(wrap(t)) == 'Story i ' + normalized t across templates,
    including whitespace-dirty and empty inputs."""
    rng = np.random.default_rng(11)
    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    for i in range(12):
        n = int(rng.integers(0, 120))
        t = " ".join(rng.choice(words, n)) if n else ""
        if i % 5 == 4 and t:
            t = "  " + t.replace(" ", "   ", 3) + "\n\t"
        import re

        norm = re.sub(r"\s+", " ", t).strip()
        want = f"Story {i} {norm}".strip()
        assert extract_main_text(wrap_html(i, t)) == want, f"doc {i}"


def test_extract_pipeline_spans_match_scalar_kernel(ray_session):
    from dup_ocropy_ray.pipelines.extract import extract_spans_table

    df = pd.DataFrame({
        "doc_id": np.arange(9, dtype="int64"),
        "text": [f"word{j} " * (5 + 7 * j) for j in range(9)],
    })
    got = (extract_spans_table(rd.from_pandas(df).repartition(3))
           .to_pandas().sort_values(["doc_id", "offset"])
           .reset_index(drop=True))
    rows = []
    for i, t in zip(df.doc_id, df.text):
        for s in extract_spans(wrap_html(int(i), t)):
            rows.append((int(i), s["offset"], s["kind"], s["text"],
                         s["media_ref"]))
    want = pd.DataFrame(rows, columns=["doc_id", "offset", "kind", "text",
                                       "media_ref"])
    assert len(got) == len(want)
    assert (got["kind"].to_numpy() == want["kind"].to_numpy()).all()
    assert got["text"].fillna("").tolist() == want["text"].fillna("").tolist()
    assert (got["media_ref"].fillna("").to_numpy()
            == want["media_ref"].fillna("").to_numpy()).all()


# ------------------------------------------------------------- PDF leg


def test_pdf_roundtrip_identity_both_compressions():
    import re

    from dup_ocropy_ray.functions.pdfx import extract_pdf_text
    from dup_ocropy_ray.sources.pdfgen import render_pdf

    rng = np.random.default_rng(3)
    words = "scan merge sort join filter group" .split()
    for i in range(8):
        n = int(rng.integers(0, 400))
        t = " ".join(rng.choice(words, n)) if n else ""
        norm = re.sub(r"\s+", " ", t).strip()
        for compress in (True, False):
            got = extract_pdf_text(render_pdf(i, t, compress=compress))
            assert got == norm, (i, compress)


def test_pdf_string_escapes_and_parens():
    from dup_ocropy_ray.functions.pdfx import extract_pdf_text
    from dup_ocropy_ray.sources.pdfgen import render_pdf

    t = r"a (b) c \ d (nested (deep)) e)f"
    assert extract_pdf_text(render_pdf(2, t)) == t


def test_pdf_two_column_reading_order():
    """Odd doc_id renders two balanced columns; the extractor must read
    the LEFT column fully before the right one."""
    from dup_ocropy_ray.functions.pdfx import extract_pdf_lines
    from dup_ocropy_ray.sources.pdfgen import render_pdf

    words = [f"w{k}" for k in range(60)]
    lines = extract_pdf_lines(render_pdf(5, " ".join(words)))
    flat = " ".join(lines).split()
    assert flat == words


def test_pdf_multipage_pagination():
    from dup_ocropy_ray.functions.pdfx import extract_pdf_runs, extract_pdf_text
    from dup_ocropy_ray.sources.pdfgen import render_pdf

    t = " ".join(f"t{k}" for k in range(1200))  # > one page both layouts
    for i in (4, 5):
        pdf = render_pdf(i, t)
        assert len(extract_pdf_runs(pdf)) > 1  # really paginated
        assert extract_pdf_text(pdf) == t


def test_pdf_tokenizer_handles_tj_array_and_tstar():
    """Hand-written content stream (not from our generator): TL/T*,
    TJ arrays with kerning numbers, quote operator."""
    import zlib

    from dup_ocropy_ray.functions.pdfx import extract_pdf_text

    content = (b"BT /F1 10 Tf 14 TL 1 0 0 1 50 700 Tm "
               b"[(he) -20 (llo)] TJ T* (world) Tj 0 -14 Td (again) Tj ET")
    data = zlib.compress(content)
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Kids [4 0 R] /Count 1 >>\nendobj\n"
           b"4 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>\nendobj\n"
           b"5 0 obj\n<< /Length " + str(len(data)).encode() +
           b" /Filter /FlateDecode >>\nstream\n" + data +
           b"\nendstream\nendobj\n"
           b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n")
    assert extract_pdf_text(pdf) == "hello world again"


def test_pdf_pipeline_matches_scalar(ray_session):
    import re

    from dup_ocropy_ray.pipelines.extract import pdf_extract_docs

    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype="int64"),
        "text": [f"word{j} " * (3 + 11 * j) for j in range(6)],
    })
    got = (pdf_extract_docs(rd.from_pandas(df).repartition(2))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = [re.sub(r"\s+", " ", t).strip() for t in df.text]
    assert got["pdf_text"].tolist() == want


def test_interleaved_span_sequence_equality(ray_session):
    """North-rule invariant: (kind, text, media_ref, order) equality of
    the extracted interleaved sequence against ground truth — html spans
    expand in place, neighbors pass through, offsets dense."""
    import pyarrow as pa

    from dup_ocropy_ray.pipelines.extract import (
        _span_list_type,
        extract_interleaved,
    )

    body = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
    docs = pa.table({
        "doc_id": ["a", "b"],
        "spans": pa.array([
            [
                {"kind": "text", "text": "intro", "media_ref": None, "offset": 0},
                {"kind": "html", "text": wrap_html(6, body), "media_ref": None,
                 "offset": 1},
                {"kind": "media", "text": None, "media_ref": "pg://raw",
                 "offset": 2},
            ],
            [{"kind": "text", "text": "plain only", "media_ref": None,
              "offset": 0}],
        ], _span_list_type()),
    })
    out = (extract_interleaved(rd.from_arrow(docs)).to_pandas()
           .set_index("doc_id"))
    got_a = [(s["kind"], s["text"], s["media_ref"], s["offset"])
             for s in out.loc["a", "spans"]]
    # doc 6: template 2, chunk k=16 -> one chunk; doc_id%3==0 -> one img
    want_a = [
        ("text", "intro", None, 0),
        ("text", "Story 6", None, 1),
        ("text", body, None, 2),
        ("media", None, "img://6/0", 3),
        ("media", None, "pg://raw", 4),
    ]
    assert got_a == want_a
    got_b = [(s["kind"], s["text"], s["media_ref"], s["offset"])
             for s in out.loc["b", "spans"]]
    assert got_b == [("text", "plain only", None, 0)]


def test_extract_checkpoint_resume(ray_session, tmp_path):
    """Kill-resume contract for the extraction pipeline: completed
    fragments are never reprocessed; a fragment whose manifest is
    missing (simulated kill after data write, before commit) reruns
    cleanly with identical output."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from dup_ocropy_ray.pipelines.extract import (
        _span_list_type,
        run_extract_with_checkpoint,
    )
    from dup_ocropy_ray.state import checkpoint as ckpt

    docs_path = str(tmp_path / "docs.parquet")
    spans = [[{"kind": "html", "text": wrap_html(i, f"body words {i} " * 6),
               "media_ref": None, "offset": 0}] for i in range(24)]
    pq.write_table(pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(24)], pa.string()),
        "spans": pa.array(spans, _span_list_type()),
    }), docs_path)

    out_root = str(tmp_path / "out")
    r1 = run_extract_with_checkpoint(docs_path, out_root, num_fragments=3)
    assert sorted(r1["fragments_run"]) == [0, 1, 2]
    c1 = r1["counters"]
    assert c1["docs"] == 24 and c1["text_spans"] > 0

    # resume with nothing pending: no fragment reruns
    r2 = run_extract_with_checkpoint(docs_path, out_root, num_fragments=3)
    assert r2["fragments_run"] == []
    assert r2["counters"] == c1

    # simulate a kill between data write and manifest commit
    os.remove(os.path.join(ckpt.manifest_dir(out_root), "00001.json"))
    r3 = run_extract_with_checkpoint(docs_path, out_root, num_fragments=3)
    assert r3["fragments_run"] == [1]
    assert r3["counters"] == c1


def test_extract_checkpoint_file_fragments(ray_session, tmp_path):
    """Multi-file input takes the per-FILE-GROUP fragment path: one read
    of each input file across the whole job (no N-scan hash filters),
    same counters as the single-file run, resume semantics intact."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from dup_ocropy_ray.pipelines.extract import (
        _span_list_type,
        run_extract_with_checkpoint,
    )
    from dup_ocropy_ray.state import checkpoint as ckpt

    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    for part in range(3):
        ids = [f"d{i}" for i in range(part * 8, (part + 1) * 8)]
        spans = [[{"kind": "html", "text": wrap_html(i, f"body words {i} " * 6),
                   "media_ref": None, "offset": 0}]
                 for i in range(part * 8, (part + 1) * 8)]
        pq.write_table(pa.table({
            "doc_id": pa.array(ids, pa.string()),
            "spans": pa.array(spans, _span_list_type()),
        }), str(docs_dir / f"part-{part}.parquet"))

    out_root = str(tmp_path / "out")
    r1 = run_extract_with_checkpoint(str(docs_dir), out_root,
                                     num_fragments=2)
    assert sorted(r1["fragments_run"]) == [0, 1]  # min(2, 3 files)
    c1 = r1["counters"]
    assert c1["docs"] == 24 and c1["text_spans"] > 0

    r2 = run_extract_with_checkpoint(str(docs_dir), out_root,
                                     num_fragments=2)
    assert r2["fragments_run"] == []
    os.remove(os.path.join(ckpt.manifest_dir(out_root), "00000.json"))
    r3 = run_extract_with_checkpoint(str(docs_dir), out_root,
                                     num_fragments=2)
    assert r3["fragments_run"] == [0]
    assert r3["counters"] == c1

    # drift protection: a file that lands in the input dir AFTER the
    # plan was pinned must NOT reassign docs across committed fragments
    # — the resume keeps reading the recorded groups
    pq.write_table(pa.table({
        "doc_id": pa.array(["late-1"], pa.string()),
        "spans": pa.array([[{"kind": "html",
                             "text": wrap_html(99, "late words " * 6),
                             "media_ref": None, "offset": 0}]],
                          _span_list_type()),
    }), str(docs_dir / "part-late.parquet"))
    os.remove(os.path.join(ckpt.manifest_dir(out_root), "00001.json"))
    r4 = run_extract_with_checkpoint(str(docs_dir), out_root,
                                     num_fragments=2)
    assert r4["fragments_run"] == [1]
    assert r4["counters"] == c1  # still 24 docs: late file not absorbed


# --------------------------------------------------------- fuzz hardening


def test_html_extractor_never_crashes_on_garbage():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=150, deadline=None)
    @given(st.text(
        alphabet=st.sampled_from(list("<>/=\"' abcdefp&;!-[]()")),
        max_size=400,
    ))
    def run(s):
        spans = extract_spans(s)  # must not raise
        for sp in spans:
            assert sp["kind"] in ("text", "media")

    run()


def test_pdf_parser_never_crashes_on_mutations():
    """Random byte corruptions of a valid PDF must never raise — worst
    case is missing/garbled text."""
    import numpy as np

    from dup_ocropy_ray.functions.pdfx import extract_pdf_text
    from dup_ocropy_ray.sources.pdfgen import render_pdf

    rng = np.random.default_rng(13)
    base = bytearray(render_pdf(5, "alpha beta gamma " * 30))
    for _ in range(120):
        buf = bytearray(base)
        for _ in range(int(rng.integers(1, 20))):
            buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
        extract_pdf_text(bytes(buf))  # must not raise
    # truncations too
    for cut in (0, 5, 37, 200, len(base) // 2, len(base) - 3):
        extract_pdf_text(bytes(base[:cut]))


def test_extract_tables_structure_and_kill_scope():
    from dup_ocropy_ray.functions.htmlx import extract_tables

    html = (
        "<html><body>"
        "<nav><table><tr><td>menu</td></tr></table></nav>"  # killed scope
        "<table><tr><th>a</th><th>b</th></tr>"
        "<tr><td>1</td><td>x <b>y</b></td></tr></table>"
        "<div><table><tr><td>only</td></tr></table></div>"
        "</body></html>"
    )
    tables = extract_tables(html)
    assert tables == [[["a", "b"], ["1", "x y"]], [["only"]]]


def test_extract_tables_nested_reported_once():
    from dup_ocropy_ray.functions.htmlx import extract_tables

    html = ("<table><tr><td>outer"
            "<table><tr><td>inner</td></tr></table>"
            "</td></tr></table>")
    tables = extract_tables(html)
    assert len(tables) == 1
    flat = [c for rows in tables for r in rows for c in r]
    assert any("inner" in c for c in flat) and any("outer" in c for c in flat)


def test_boilerplate_strip_per_site(ray_session):
    """Planted template: the shared footer is stripped from every doc
    of site A (3/4 docs >= ceil(0.5*4)=2), the same words on site B
    (1 doc) survive, and unique body text is untouched."""
    import pandas as pd
    import ray.data as rd

    from dup_ocropy_ray.pipelines.extract import boilerplate_strip

    footer = "subscribe to our newsletter"   # k=4 -> one paragraph
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "source": ["a", "a", "a", "a", "b"],
        "text": [f"alpha beta gamma delta {footer}",
                 f"epsilon zeta eta theta {footer}",
                 f"iota kappa lambda mu {footer}",
                 "nu xi omicron pi unique tail words here",
                 f"rho sigma tau upsilon {footer}"],
    })
    out = (boilerplate_strip(rd.from_pandas(docs), k=4)
           .to_pandas().set_index("doc_id").sort_index())
    assert footer not in out.loc[1, "clean_text"]
    assert out.loc[1, "clean_text"] == "alpha beta gamma delta"
    assert (out.loc[[1, 2, 3], "n_kept"] == 1).all()
    assert (out.loc[[1, 2, 3], "n_para"] == 2).all()
    # site A doc without the footer is untouched
    assert out.loc[4, "n_kept"] == 2
    # site B's sole doc keeps the same words (not template THERE)
    assert footer in out.loc[5, "clean_text"]


# ------------------------------------------------------------- markdown


def test_markdown_block_syntax_golden():
    from dup_ocropy_ray.functions.mdx import to_markdown

    html = (
        "<html><body><article>"
        "<h2>Title</h2>"
        '<p>Para with <a href="u">link</a> and <b>bold</b></p>'
        "<ul><li>first</li><li>second</li></ul>"
        "<ol><li>a</li><li>b</li></ol>"
        "<blockquote><p>quoted text here</p></blockquote>"
        "<pre>code  here\n  indented</pre>"
        "<table><tr><th>k</th><th>v</th></tr><tr><td>1</td><td>2</td></tr>"
        "</table><hr></article></body></html>"
    )
    assert to_markdown(html) == (
        "## Title\n\n"
        "Para with [link](u) and **bold**\n\n"
        "- first\n- second\n\n"
        "1. a\n2. b\n\n"
        "> quoted text here\n\n"
        "```\ncode  here\n  indented\n```\n\n"
        "| k | v |\n| --- | --- |\n| 1 | 2 |\n\n"
        "---"
    )


def test_markdown_strips_chrome_like_extractor():
    from dup_ocropy_ray.functions.mdx import to_markdown

    md = to_markdown(wrap_html(5, "alpha beta gamma delta " * 10))
    assert md.startswith("# Story 5\n\n")
    # chrome never leaks: no nav/ads/comment/footer text
    for junk in ("comment", "Home", "sponsored", "widget"):
        assert junk not in md
    # paragraphs are blank-line separated plain word runs
    body = md.split("\n\n")[1:]
    assert all(b and "\n" not in b for b in body)


def test_markdown_empty_and_garbage_never_crash():
    from dup_ocropy_ray.functions.mdx import to_markdown

    assert to_markdown("") == ""
    assert isinstance(to_markdown("<p>&#xx;<x <"), str)
    assert to_markdown("<body><script>x</script></body>") == ""


def test_markdown_image_blocks_and_inline_code():
    from dup_ocropy_ray.functions.mdx import to_markdown

    html = ('<body><article><p>uses <code>fn()</code> calls</p>'
            '<img src="img://1/0" alt="fig">'
            '<p>tail paragraph of words</p></article></body>')
    assert to_markdown(html) == (
        "uses `fn()` calls\n\n![fig](img://1/0)\n\ntail paragraph of words"
    )


# ------------------------------------------------------------- metadata


def test_metadata_harvest_fields_and_tolerance():
    from dup_ocropy_ray.functions.metax import extract_metadata

    m = extract_metadata(wrap_html(7, "one two three four five six seven eight nine"))
    assert m == {"og_title": "Story 7",
                 "description": "one two three four five six seven eight",
                 "ld_type": "Article", "ld_headline": "Story 7",
                 "word_count": 9}
    # malformed JSON-LD -> None fields, no crash; array form -> first object
    bad = '<head><script type="application/ld+json">{oops</script></head>'
    assert extract_metadata(bad)["ld_type"] is None
    arr = ('<head><script type="application/ld+json">'
           '[1, {"@type": "NewsArticle", "wordCount": 3.0}]</script></head>')
    m2 = extract_metadata(arr)
    assert m2["ld_type"] == "NewsArticle" and m2["word_count"] == 3
    # boolean wordCount is not a count; first meta occurrence wins
    dup = ('<head><meta name="description" content="first">'
           '<meta name="description" content="second">'
           '<script type="application/ld+json">'
           '{"wordCount": true}</script></head>')
    m3 = extract_metadata(dup)
    assert m3["description"] == "first" and m3["word_count"] is None
    assert extract_metadata("")["og_title"] is None
