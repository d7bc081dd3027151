"""jusText boilerplate classifier (functions/htmlx.py segment_blocks /
justext_classify — Pomikálek 2011, language-independent mode) and its
distributed per-doc stats query (pipelines/extract.justext_table)."""

import duckdb
import numpy as np
import pandas as pd

import ray.data as rd

from dup_ocropy_ray.functions.htmlx import (
    classify_context_free,
    justext_classify,
    justext_stats,
    segment_blocks,
)
from dup_ocropy_ray.sources.webgen import wrap_html


GOOD_TEXT = ("The quick brown fox jumps over the lazy dog while the "
             "patient grey owl watches from a very tall oak tree nearby, "
             "and nothing about this sentence is boilerplate chrome.")
assert len(GOOD_TEXT) >= 150


def _block(text, link_density=0.0):
    return {"text": text, "link_density": link_density}


# --------------------------------------------------------- segmentation


def test_inline_tags_merge_into_enclosing_block():
    blocks = segment_blocks(
        "<p>alpha <b>beta</b> <span>gamma <i>delta</i></span> end</p>")
    assert [b["text"] for b in blocks] == ["alpha beta gamma delta end"]
    assert blocks[0]["link_density"] == 0.0


def test_non_inline_boundary_starts_new_block():
    blocks = segment_blocks("<div>one<p>two</p>three</div>")
    assert [b["text"] for b in blocks] == ["one", "two", "three"]


def test_kill_list_subtrees_dropped():
    blocks = segment_blocks(
        "<p>keep</p><nav><a href='/'>menu item</a></nav>"
        "<script>var x=1;</script><footer>junk</footer><p>also keep</p>")
    assert [b["text"] for b in blocks] == ["keep", "also keep"]


def test_link_density_counts_anchor_chars_only():
    blocks = segment_blocks('<p>aaaa <a href="/">bbbb</a></p>')
    (b,) = blocks
    assert b["text"] == "aaaa bbbb"
    # 4 anchor chars of 9 total
    assert abs(b["link_density"] - 4 / 9) < 1e-9


# ------------------------------------------------------- classification


def test_context_free_thresholds():
    blocks = [
        _block("x" * 10),            # short
        _block("x" * 40),            # neargood (>= length_low)
        _block("x" * 150),           # good (>= length_high)
        _block("x" * 200, 0.5),      # bad (link density wins)
    ]
    assert classify_context_free(blocks) == [
        "short", "neargood", "good", "bad"]


def test_neargood_promoted_next_to_one_good():
    # good | neargood | bad: boundary -> neargood leans good
    blocks = [_block("g" * 150), _block("n" * 80), _block("b" * 99, 1.0)]
    assert justext_classify(blocks) == ["good", "good", "bad"]


def test_short_needs_good_on_both_sides():
    blocks = [_block("g" * 150), _block("s" * 10), _block("g" * 150)]
    assert justext_classify(blocks) == ["good", "good", "good"]
    # good | short | bad: short leans bad
    blocks = [_block("g" * 150), _block("s" * 10), _block("b" * 99, 1.0)]
    assert justext_classify(blocks) == ["good", "bad", "bad"]


def test_doubtful_between_bads_is_bad_and_edges_are_bad():
    # neargood with bad on one side and the page edge (implicit bad) on
    # the other resolves bad; so does a doubtful run with no good at all
    blocks = [_block("b" * 99, 1.0), _block("n" * 80)]
    assert justext_classify(blocks) == ["bad", "bad"]
    blocks = [_block("s" * 10), _block("n" * 80), _block("s" * 12)]
    assert justext_classify(blocks) == ["bad", "bad", "bad"]


def test_anchors_skip_doubtful_blocks():
    # good | short | neargood | good: both doubtfuls see good on both
    # non-doubtful sides -> promoted
    blocks = [_block("g" * 150), _block("s" * 10), _block("n" * 80),
              _block("g" * 151)]
    assert justext_classify(blocks) == ["good"] * 4


def test_stats_on_handcrafted_page():
    html = (
        f"<body><div class='x'><a href='/'>{'l' * 50}</a></div>"
        f"<p>{GOOD_TEXT}</p><p>middling sentence of medium length that "
        "reaches neargood size</p><h2>hdr</h2></body>")
    s = justext_stats(html)
    assert s["n_blocks"] == 4
    assert (s["n_bad"], s["n_short"], s["n_neargood"], s["n_good"]) == (
        1, 1, 1, 1)
    # neargood sits between the good paragraph and the edge-bad -> good;
    # the trailing short leans bad at that boundary
    assert s["n_good_final"] == 2
    assert s["good_chars"] == len(GOOD_TEXT) + len(
        "middling sentence of medium length that reaches neargood size")


# ------------------------------------------- wrapped pages + SQL parity


def test_wrapped_page_chrome_never_classifies_good():
    """On the synthetic wrap every chrome block must resolve bad/short —
    the oracle's determinism argument."""
    for doc_id in range(4):  # one per template
        html = wrap_html(doc_id, "word " * 3)
        blocks = segment_blocks(html)
        final = justext_classify(blocks)
        assert "good" not in final
        s = justext_stats(html)
        assert s["n_good"] == 0 and s["good_chars"] == 0


def test_query_matches_duckdb_twin(ray_session):
    from dup_ocropy_ray.pipelines.extract import justext_table
    from dup_ocropy_ray.pipelines.queries import SQL_JUSTEXT_STATS

    corpus = [
        " ".join([GOOD_TEXT] * 3),      # long chunks -> good blocks
        "short doc",                    # one short chunk
        "w " * 200,                     # many tiny-word chunks
        GOOD_TEXT,                      # chunk lengths straddle 150
        "",                             # empty text
        None,                           # NULL text
        "supercalifragilistic " * 40,   # long words -> good chunks
        "pad",
        # doc_id 8 -> tpl 0, k=10: engineered chunk sequence
        # good / neargood / good / short / good to exercise both
        # context promotions in the SQL window pass
        " ".join(["x" * 20] * 10 + ["y" * 4] * 10 + ["z" * 20] * 10
                 + ["a" * 2] * 10 + ["b" * 20] * 10),
    ]
    df = pd.DataFrame({
        "doc_id": np.arange(len(corpus), dtype="int64"),
        "text": corpus,
    })
    got = (justext_table(rd.from_pandas(df).repartition(3)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    con = duckdb.connect()
    con.register("docs_src", df)
    con.sql("CREATE VIEW documents AS SELECT * FROM docs_src")
    want = con.sql(SQL_JUSTEXT_STATS).df()
    for c in want.columns:
        if c != "doc_id":
            want[c] = want[c].astype("int64")
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))
