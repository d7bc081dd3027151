"""Named quality-rule filters: Gopher rules (Rae et al. 2021 App. A,
textstats.gopher_quality_table) and C4 line cleaning (Raffel et al. 2020
§2.2, curate.c4_clean). The driver fixtures are single-line texts, so
these tests plant a synthetic multi-line corpus that exercises every
rule branch and checks value parity against the DuckDB SQL twins."""

import duckdb
import numpy as np
import pandas as pd

import ray.data as rd


GOOD = " ".join(
    ["the quick brown fox jumps over and that lazy dog have fun with it"]
    * 5
)  # 65 words, all alpha, 4+ distinct Gopher stopwords


def _docs(texts):
    return rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype="int64"),
        "text": texts,
    })).repartition(2)


def _oracle(sql, texts):
    con = duckdb.connect()
    con.register("docs_src", pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype="int64"),
        "text": texts,
    }))
    con.sql("CREATE VIEW documents AS SELECT * FROM docs_src")
    return con.sql(sql).df()


CORPUS = [
    GOOD,                                    # passes everything
    "too few words here.",                   # fails r_words (short)
    "the of " + "x " * 60,                   # mean word len < 3 -> r_mwl
    GOOD + " " + "#" * 1 + " ### ### ###",   # many '#' -> r_sym
    GOOD.replace("the", "123").replace("and", "456")
        .replace("that", "789").replace("have", "000")
        .replace("with", "111"),             # no stopwords -> r_stop
    "\n".join(["- the bullet item list of and"] * 10),   # r_bullet
    "\n".join([GOOD, "trailing thought..."] * 3),        # ellipsis lines
    "12 34 " * 40 + "the of",                # digits -> r_alpha
    "",                                      # empty text
    None,                                    # NULL text
]


def test_gopher_rules_match_duckdb_twin(ray_session):
    from dup_ocropy_ray.pipelines.queries import SQL_GOPHER_QUALITY
    from dup_ocropy_ray.pipelines.textstats import gopher_quality_table

    got = (gopher_quality_table(_docs(CORPUS)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = _oracle(SQL_GOPHER_QUALITY, CORPUS)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)],
        want[sorted(want.columns)].astype(got[sorted(got.columns)].dtypes
                                          .to_dict()))
    byid = got.set_index("doc_id")
    assert byid.loc[0, "passed"] == 1
    assert byid.loc[1, "r_words"] == 0
    assert byid.loc[2, "r_mwl"] == 0
    assert byid.loc[3, "r_sym"] == 0
    assert byid.loc[4, "r_stop"] == 0 and byid.loc[4, "n_stop"] == 0
    assert byid.loc[5, "r_bullet"] == 0
    assert byid.loc[6, "r_ellip"] == 0
    assert byid.loc[7, "r_alpha"] == 0
    assert byid.loc[8, "passed"] == 0 and byid.loc[9, "passed"] == 0
    # only the planted-good doc survives every rule
    assert got["passed"].sum() == 1


C4_CORPUS = [
    # 3 qualifying lines -> kept
    "\n".join(["this line has enough words to stay."] * 3),
    # only 2 qualifying lines -> dropped
    "\n".join(["this line has enough words to stay."] * 2 + ["short."]),
    # line-level filters: no terminal punct / too short / javascript
    "\n".join(["this line has enough words to stay.",
               "no terminal punctuation on this long line",
               "tiny line.",
               "enable javascript to view this content.",
               "  padded line with many words survives the trim.  ",
               "another good line with plenty of words here!",
               'quoted line with enough words to qualify."']),
    # doc-level vetoes
    "\n".join(["this line has enough words to stay."] * 3) + "\nlorem ipsum",
    "\n".join(["this line has enough words to stay."] * 3) + "\ncode { x }",
    "",
    None,
]


def test_c4_clean_matches_duckdb_twin(ray_session):
    from dup_ocropy_ray.pipelines.curate import c4_clean
    from dup_ocropy_ray.pipelines.queries import SQL_C4_CLEAN

    got = (c4_clean(_docs(C4_CORPUS)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = _oracle(SQL_C4_CLEAN, C4_CORPUS)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)],
        want[sorted(want.columns)].astype(got[sorted(got.columns)].dtypes
                                          .to_dict()))
    byid = got.set_index("doc_id")
    assert byid.loc[0, "kept"] == 1
    assert byid.loc[1, "kept"] == 0 and byid.loc[1, "clean_text"] == ""
    # line filters: of the 7 lines only the 4 qualifying ones remain
    assert byid.loc[2, "n_kept_lines"] == 4
    kept_lines = byid.loc[2, "clean_text"].split("\n")
    assert kept_lines[0] == "this line has enough words to stay."
    assert kept_lines[1] == "padded line with many words survives the trim."
    assert byid.loc[3, "kept"] == 0          # lorem ipsum veto
    assert byid.loc[4, "kept"] == 0          # '{' veto
    assert byid.loc[5, "kept"] == 0 and byid.loc[6, "kept"] == 0
    assert got["kept"].sum() == 2  # docs 0 and 2


def test_dsir_weights_favor_target_like_docs(ray_session):
    """DSIR (Xie et al. 2023): docs sharing the target slice's
    distinctive vocabulary must outweigh raw-typical docs; values match
    the DuckDB twin exactly."""
    import duckdb

    from dup_ocropy_ray.pipelines.queries import SQL_DSIR_WEIGHTS

    tgt_text = "alpha beta gamma delta alpha beta gamma delta"
    raw_text = "zig zag zip zap zig zag zip zap"
    df = pd.DataFrame({
        "doc_id": np.arange(8, dtype="int64"),
        "lang": ["en"] * 3 + ["de"] * 5,
        "text": [tgt_text] * 3            # the en target slice
        + [raw_text] * 4                  # raw-typical docs
        + [tgt_text],                     # de doc that LOOKS like target
    })
    import tempfile

    import pyarrow as pa_
    import pyarrow.parquet as pq

    from dup_ocropy_ray.pipelines.queries import q_dsir_weights

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa_.Table.from_pandas(df), f"{d}/documents.parquet")
        got = q_dsir_weights(d)
    con = duckdb.connect()
    con.register("docs_src", df)
    con.sql("CREATE VIEW documents AS SELECT * FROM docs_src")
    want = con.sql(SQL_DSIR_WEIGHTS).df().sort_values(
        "doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)],
        want[sorted(want.columns)].astype(got[sorted(got.columns)]
                                          .dtypes.to_dict()))
    byid = got.set_index("doc_id")["weight"]
    # target-looking docs (0-2 and the de look-alike 7) beat raw docs
    assert byid[7] == byid[0]
    assert byid[0] > byid[3] + 1.0


def test_mix_corpus_rebalances_skewed_sources(ray_session):
    """mix_corpus: an oversampled source is cut toward the uniform
    budget share while a rare source keeps 100%."""
    from dup_ocropy_ray.pipelines.curate import mix_corpus

    df = pd.DataFrame({
        "doc_id": np.arange(300, dtype="int64"),
        "source": ["big"] * 280 + ["rare"] * 20,
        "n_chars": np.full(300, 100, dtype="int64"),
    })
    out = mix_corpus(rd.from_pandas(df).repartition(3), budget_pct=50)
    byid = out.set_index("source")
    # uniform share = 50% * 30000 / 2 = 7500 chars per source
    assert byid.loc["rare", "pct"] == 100      # 2000 < 7500: keep all
    assert byid.loc["rare", "n_kept"] == 20
    assert byid.loc["big", "pct"] == 26        # 7500*100 // 28000
    assert 0 < byid.loc["big", "n_kept"] < 280


def test_event_outliers_flags_planted_spike(ray_session):
    """event_outliers: a planted 100-sigma spike is flagged; the tight
    cluster around the mean is not."""
    import tempfile

    import pyarrow as pa_
    import pyarrow.parquet as pq

    from dup_ocropy_ray.pipelines.queries import q_event_outliers

    rng = np.random.default_rng(2)
    vals = np.concatenate([rng.normal(10, 1, 200), [10_000.0]])
    df = pd.DataFrame({
        "event_id": np.arange(201, dtype="int64"),
        "event_type": ["click"] * 201,
        "value": vals,
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa_.Table.from_pandas(df), f"{d}/events.parquet")
        out = q_event_outliers(d)
    assert 200 in set(out["event_id"])
    assert len(out) < 10
