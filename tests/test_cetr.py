"""CETR tag-ratio main-content extraction (functions/cetr.py —
Weninger, Hsu & Han, WWW 2010) and its distributed per-doc quality
table (pipelines/extract.cetr_table)."""

import numpy as np
import pandas as pd

import ray.data as rd

from dup_ocropy_ray.functions.cetr import (
    cetr_stats,
    extract_main_text_cetr,
    kmeans1d_content_mask,
    line_tag_ratios,
    smooth_ratios,
)
from dup_ocropy_ray.sources.webgen import wrap_html


ARTICLE = ("The quick brown fox jumps over the lazy dog while the patient "
           "grey owl watches from a very tall oak tree nearby and the "
           "evening light fades slowly across the quiet valley floor. " * 3)


# ----------------------------------------------------------- kernels


def test_line_tag_ratios_minified_page_gets_lines():
    html = wrap_html(7, ARTICLE)
    assert "\n" not in html  # the synthetic render is one line
    texts, ttr = line_tag_ratios(html)
    assert len(texts) == len(ttr) > 10  # re-lining found structure
    assert ttr.min() >= 0.0


def test_line_tag_ratios_strips_script_style_comments():
    html = ("<div><script>var boilerplate_code = 12345;</script>"
            "<style>.x{color:red}</style><!-- hidden words -->"
            "<p>visible words</p></div>")
    texts, _ = line_tag_ratios(html)
    joined = " ".join(texts)
    assert "visible words" in joined
    assert "boilerplate_code" not in joined
    assert "hidden" not in joined


def test_line_tag_ratios_tagless_text():
    texts, ttr = line_tag_ratios("just plain text\nno markup at all")
    assert texts == ["just plain text", "no markup at all"]
    assert (ttr == [len(texts[0]), len(texts[1])]).all()


def test_smooth_ratios_preserves_constant_and_length():
    x = np.full(9, 3.0)
    s = smooth_ratios(x)
    assert s.shape == x.shape
    np.testing.assert_allclose(s, x)
    assert smooth_ratios(np.zeros(0)).shape == (0,)


def test_kmeans1d_separates_two_groups():
    v = np.array([0.5, 1.0, 0.7, 40.0, 55.0, 0.2, 60.0])
    mask = kmeans1d_content_mask(v)
    assert mask.tolist() == [False, False, False, True, True, False, True]


def test_kmeans1d_all_equal_is_all_content():
    assert kmeans1d_content_mask(np.full(5, 2.0)).all()
    assert kmeans1d_content_mask(np.zeros(0)).shape == (0,)


def test_extract_deterministic():
    html = wrap_html(11, ARTICLE)
    assert extract_main_text_cetr(html) == extract_main_text_cetr(html)


def test_extract_empty_and_trivial():
    assert extract_main_text_cetr("") == ""
    assert extract_main_text_cetr("<p></p>") == ""
    assert extract_main_text_cetr("hello world") == "hello world"


# ----------------------------------------- quality on synthetic pages


def test_cetr_recall_and_precision_on_wrapped_pages():
    """Across all four chrome templates: CETR must keep every main-text
    word (the article lines carry the page's text mass) and must beat
    the no-op extractor (whole visible page) on precision."""
    import html as _h
    import re

    tag = re.compile(r"<[^>]*>")
    recalls, precs, page_precs = [], [], []
    for doc_id in range(16):
        text = f"doc {doc_id} " + ARTICLE
        want = set(text.split())
        html = wrap_html(doc_id, text)
        got = set(extract_main_text_cetr(html).split())
        page = set(_h.unescape(tag.sub(" ", html)).split())
        recalls.append(len(want & got) / len(want))
        precs.append(len(want & got) / max(1, len(got)))
        page_precs.append(len(want & page) / max(1, len(page)))
    assert min(recalls) >= 0.95
    assert np.mean(precs) >= 0.7
    assert np.mean(precs) > np.mean(page_precs) + 0.2


def test_cetr_stats_fields():
    s = cetr_stats(wrap_html(3, ARTICLE))
    assert s["n_lines"] >= s["n_content_lines"] >= 1
    assert s["content_chars"] == len(s["content_text"])


# -------------------------------------------------- distributed table


def test_cetr_table_matches_local(ray_session):
    from dup_ocropy_ray.pipelines.extract import cetr_stage, cetr_table

    df = pd.DataFrame({
        "doc_id": np.arange(12, dtype="int64"),
        "text": [f"doc {i} " + ARTICLE for i in range(12)],
    })
    out = cetr_table(rd.from_pandas(df), batch_size=5).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    local = cetr_stage(df).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, local)
    assert (out["recall_permille"] == 1000).all()
    assert (out["precision_permille"] >= 500).all()


def test_extract_ensemble_agreement(ray_session):
    """The three families must agree substantially on unambiguous
    synthetic pages (DOM vs CETR especially: CETR keeps every main
    word, the DOM scorer keeps exactly the main words)."""
    from dup_ocropy_ray.pipelines.extract import ensemble_table

    df = pd.DataFrame({
        "doc_id": np.arange(12, dtype="int64"),
        "text": [f"doc {i} " + ARTICLE for i in range(12)],
    })
    out = ensemble_table(rd.from_pandas(df), batch_size=5).to_pandas()
    assert (out["agree_dom_cetr"] >= 500).all()
    assert out["agree_dom_cetr"].mean() >= 700
    assert out["agree_dom_justext"].mean() >= 700
    assert (out["dom_chars"] > 0).all()
    assert (out["justext_chars"] > 0).all()
    # CETR keeps every main-text word but may drop the short h1 line,
    # so compare with a small tolerance rather than strictly >=
    assert (out["cetr_chars"] * 10 >= out["dom_chars"] * 8).all()
