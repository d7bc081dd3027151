"""Sequence/lifecycle/trend queries (queries.py): per-user event paths,
day-over-day trending types, Heaps-law vocabulary growth, and the
INTERSECT/EXCEPT user-lifecycle report — value-exact against their
DuckDB twins at sf0.001 plus structural invariants."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "documents", "orders"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF}/{t}.parquet')")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_event_paths_oracle(ray_session, con):
    from dup_ocropy_ray.pipelines import queries as q

    got = _canon(q.q_event_paths(SF))
    want = _canon(con.sql(q.SQL_EVENT_PATHS).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["n_steps"] <= 8).all()
    assert (got["path"].str.split(">").str.len()
            == got["n_steps"]).all()


def test_trending_types_oracle(ray_session, con):
    from dup_ocropy_ray.pipelines import queries as q

    got = _canon(q.q_trending_types(SF))
    want = _canon(con.sql(q.SQL_TRENDING_TYPES).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # first day of every type has no predecessor -> sentinel ratios
    first = got[got["prev_n"] == -1]
    assert (first["ratio_permille"] == -1).all()
    # every type appears with its earliest day carrying the sentinel
    g = got.sort_values(["event_type", "day"]).groupby("event_type")
    assert (g.head(1)["prev_n"] == -1).all()


def test_vocab_growth_oracle(ray_session, con):
    from dup_ocropy_ray.pipelines import queries as q

    got = _canon(q.q_vocab_growth(SF))
    want = _canon(con.sql(q.SQL_VOCAB_GROWTH).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    curve = got.sort_values("decile")["n_words"].to_numpy()
    assert (np.diff(curve) >= 0).all()           # monotone growth
    total = con.sql(
        r"""SELECT count(DISTINCT word) FROM (
              SELECT unnest(regexp_split_to_array(lower(trim(text)),
                                                  '\s+')) AS word
              FROM documents) WHERE word <> ''""").fetchone()[0]
    assert curve[-1] == total                    # decile 10 = full vocab


def test_user_lifecycle_oracle(ray_session, con):
    from dup_ocropy_ray.pipelines import queries as q

    got = _canon(q.q_user_lifecycle(SF))
    want = _canon(con.sql(q.SQL_USER_LIFECYCLE).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert set(got["status"]) <= {"both", "early_only", "late_only"}
    # every user with any event is classified exactly once
    n_users = con.sql(
        "SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert len(got) == n_users


def test_event_paths_synthetic_truncation(ray_session):
    """A user with 12 events keeps exactly the first 8 in ts order;
    ties on ts break by event_id."""
    import ray.data as rd

    from dup_ocropy_ray.pipelines import queries as q

    base = pd.Timestamp("2024-01-01")
    rows = []
    for i in range(12):
        rows.append((i, 7, base + pd.Timedelta(minutes=i), f"t{i}"))
    # user 8: two events at the SAME ts -> event_id orders them
    rows.append((100, 8, base, "late"))
    rows.append((99, 8, base, "early"))
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                     "event_type"])
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "events.parquet"))
        out = q.q_event_paths(d).set_index("user_id")
    assert out.loc[7, "path"] == ">".join(f"t{i}" for i in range(8))
    assert out.loc[7, "n_steps"] == 8
    assert out.loc[8, "path"] == "early>late"


def test_frontier_dedup_oracle(ray_session, con):
    from dup_ocropy_ray.pipelines import queries as q

    got = _canon(q.q_frontier_dedup(SF))
    want = _canon(con.sql(q.SQL_FRONTIER_DEDUP).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["n_dupes"] >= 0).all()
    # the t=5 template collapses all of a source's docs to ONE norm_url,
    # so at least one domain must show dupes at sf0.001
    assert got["n_dupes"].sum() > 0


def test_crawl_schedule_oracle(ray_session, con):
    from dup_ocropy_ray.pipelines import queries as q

    got = _canon(q.q_crawl_schedule(SF))
    want = _canon(con.sql(q.SQL_CRAWL_SCHEDULE).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # politeness invariant: within a domain, slots are 0..n-1 and
    # fetch_at_ms is slot-proportional
    g = got.groupby("domain")
    assert (g["slot"].max() + 1 == g.size()).all()
    assert (got["fetch_at_ms"] % 200 == 0).all()


def test_anchor_text_planted(ray_session):
    """Exact rollup on a hand-built page set: counts, distinct texts,
    and the dominant-text tie rule (max count, then lexicographically
    smallest)."""
    import ray.data as rd

    from dup_ocropy_ray.pipelines.queries import anchor_text_rollup

    pages = pd.DataFrame({"html": [
        '<p><a href="/a">Alpha</a> <a href="/a">Alpha</a> '
        '<a href="/b">Beta</a></p>',
        '<p><a href="/a">Other</a> <a href="/b">beta2</a> '
        '<a href="/b">Beta</a></p>',
        # tie on /c: "x" and "y" once each -> "x" wins lexicographically
        '<p><a href="/c">y</a> <a href="/c">x</a> <a>no href</a></p>',
    ]})
    out = anchor_text_rollup(rd.from_pandas(pages).repartition(3)) \
        .set_index("href").sort_index()
    assert out.loc["/a", "n_links"] == 3
    assert out.loc["/a", "n_texts"] == 2
    assert out.loc["/a", "top_text"] == "Alpha"
    assert out.loc["/b", "n_links"] == 3
    assert out.loc["/b", "top_text"] == "Beta"
    assert out.loc["/c", "n_links"] == 2
    assert out.loc["/c", "top_text"] == "x"
    assert len(out) == 3          # the hrefless anchor never appears


def test_anchor_text_total_parity(ray_session, con):
    """Sum of per-href link counts == sum of per-doc outlink counts
    (the two views walk the same DOM)."""
    from dup_ocropy_ray.pipelines import queries as q

    anchors = q.q_anchor_text(SF)
    outlinks = q.q_outlink_stats(SF)
    assert anchors["n_links"].sum() == outlinks["n_links"].sum()
    assert (anchors["href"].str.startswith("/")).all()


def test_redirect_chains_oracle(ray_session, con):
    from dup_ocropy_ray.pipelines import queries as q

    got = _canon(q.q_redirect_chains(SF))
    want = _canon(con.sql(q.SQL_REDIRECT_CHAINS).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every redirect doc resolves, finals are never redirects
    assert (got["doc_id"] % 6 == 3).all()
    assert (got["final_id"] % 6 != 3).all()
    # the chaining rule plants real 2-hop chains
    assert got["hops"].max() == 2
    idx = got.set_index("doc_id")
    # doc 57 (k=9, 9%3==0) -> 51 (redirect) -> 49
    assert idx.loc[57, "final_id"] == 49 and idx.loc[57, "hops"] == 2
    # doc 27 (k=4) exits directly: 27-1-2 = 24
    assert idx.loc[27, "final_id"] == 24 and idx.loc[27, "hops"] == 1


def test_scd2_history_oracle(ray_session, con):
    from dup_ocropy_ray.pipelines import queries as q

    got = _canon(q.q_scd2_history(SF))
    want = _canon(con.sql(q.SQL_SCD2_HISTORY).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # exactly one current version per surviving key; deleted keys
    # (doc_id % 9 == 0, closed by the delete op) have none
    cur = got[got["is_current"]]
    assert cur["doc_id"].is_unique
    deleted = got["doc_id"] % 9 == 0
    assert not got.loc[deleted & (got["doc_id"] < 2_000_000),
                       "is_current"].any()
    # intervals chain: a non-current version's valid_to is a later seq
    noncur = got[~got["is_current"]]
    assert (noncur["valid_to"] > noncur["seq"]).all()


def test_unicode_clean_oracle(ray_session, con):
    from dup_ocropy_ray.pipelines import queries as q

    got = _canon(q.q_unicode_clean(SF))
    want = _canon(con.sql(q.SQL_UNICODE_CLEAN).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the corpus is ASCII: every damaged doc must restore exactly
    assert (got["n_restored"] == got["n_docs"]).all()
    assert got["n_dirty"].sum() > 0


def test_compression_ratio_planted(ray_session):
    """Repetitive text compresses far below the flag threshold; a
    high-entropy string stays above it; empty text gets the 1000
    sentinel; results are deterministic."""
    import ray.data as rd

    from dup_ocropy_ray.pipelines.queries import compression_ratio_stats

    rng = np.random.RandomState(7)
    noisy = "".join(chr(33 + rng.randint(90)) for _ in range(4000))
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "source": ["rep", "noise", "empty"],
        "text": ["spam ham " * 500, noisy, ""],
    })
    out = compression_ratio_stats(
        rd.from_pandas(docs).repartition(2)).set_index("source")
    assert out.loc["rep", "n_flagged"] == 1          # boilerplate caught
    assert out.loc["rep", "mean_permille"] < 100
    assert out.loc["noise", "n_flagged"] == 0
    assert out.loc["noise", "mean_permille"] > 700
    assert out.loc["empty", "mean_permille"] == 1000
    out2 = compression_ratio_stats(
        rd.from_pandas(docs).repartition(2)).set_index("source")
    pd.testing.assert_frame_equal(out, out2)


def test_compression_ratio_runs_on_corpus(ray_session):
    from dup_ocropy_ray.pipelines import queries as q

    out = q.q_compression_ratio(SF)
    assert (out["mean_permille"] > 0).all()
    assert (out["mean_permille"] <= 1000).all()
    assert out["n_docs"].sum() == 500


def test_ivfpq_exhaustive_equals_brute(ray_session):
    """nprobe == num_centroids + rerank >= corpus reduces IVF-PQ to
    exact brute force (the re-rank stage computes true cosine over ALL
    candidates); a pruned config still clears a recall gate."""
    import tempfile

    import ray.data as rd

    from dup_ocropy_ray.pipelines import queries as q
    from dup_ocropy_ray.pipelines import similarity

    ds = q._read(SF, "embeddings", ["vec_id", "embedding"])
    n = ds.count()
    qv = np.asarray(q._read_pd(SF, "embeddings")
                    .set_index("vec_id").loc[0, "embedding"])
    d = tempfile.mkdtemp()
    similarity.build_ivfpq_index(ds, d, num_centroids=4, m=8, n_codes=32)
    brute = similarity.knn_brute(ds, qv, k=10)
    exact = similarity.knn_ivfpq(d, qv, k=10, nprobe=4, rerank=n)
    assert list(exact.vec_id) == list(brute.vec_id)
    np.testing.assert_allclose(exact.cos_sim, brute.cos_sim, atol=1e-6)
    approx = similarity.knn_ivfpq(d, qv, k=10, nprobe=2, rerank=40)
    recall = len(set(approx.vec_id) & set(brute.vec_id)) / 10
    assert recall >= 0.5
    # deterministic end to end
    approx2 = similarity.knn_ivfpq(d, qv, k=10, nprobe=2, rerank=40)
    pd.testing.assert_frame_equal(approx, approx2)


def test_balanced_shards_oracle(ray_session, con):
    from dup_ocropy_ray.pipelines import queries as q

    got = _canon(q.q_balanced_shards(SF))
    want = _canon(con.sql(q.SQL_BALANCED_SHARDS).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # snake packing: shard token totals differ by less than one
    # max-size doc (the greedy-balance guarantee for sorted snakes)
    docs = con.sql(
        r"""SELECT max(len(list_filter(regexp_split_to_array(
              trim(coalesce(text, '')), '\s+'), w -> w <> '')))
            FROM documents""").fetchone()[0]
    spread = got["total_tokens"].max() - got["total_tokens"].min()
    assert spread <= docs
    assert got["n_docs"].sum() == 500


def test_domain_prior_oracle(ray_session, con):
    from dup_ocropy_ray.pipelines import queries as q

    got = _canon(q.q_domain_prior(SF))
    want = _canon(con.sql(q.SQL_DOMAIN_PRIOR).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # shrinkage pulls every source toward the corpus prior
    total_f = got["n_flagged"].sum()
    total_n = got["n_docs"].sum()
    prior = total_f * 1000 // total_n
    away = (got["shrunk_permille"] - prior).abs()
    raw_away = (got["raw_permille"] - prior).abs()
    assert (away <= raw_away + 1).all()


def test_epoch_sample_oracle(ray_session, con):
    from dup_ocropy_ray.pipelines import queries as q

    got = _canon(q.q_epoch_sample(SF))
    want = _canon(con.sql(q.SQL_EPOCH_SAMPLE).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # weight classes: w=1000 sources copy exactly once; w=500 can only
    # downsample; w=1500 can only upsample
    w = 500 * (1 + got["source"].str.len() % 3)
    ident = got[w == 1000]
    assert (ident["n_copies"] == ident["n_docs"]).all()
    down = got[w == 500]
    assert (down["n_copies"] <= down["n_docs"]).all()
    up = got[w == 1500]
    assert (up["n_copies"] >= up["n_docs"]).all()


def test_range_shards_oracle_and_balance(ray_session, con):
    from dup_ocropy_ray.pipelines import queries as q

    got = _canon(q.q_range_shards(SF))
    want = _canon(con.sql(q.SQL_RANGE_SHARDS).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    total = con.sql("SELECT count(*) FROM orders").fetchone()[0]
    assert got["n_orders"].sum() == total
    # quantile split points balance shards to within ~tie mass
    assert got["n_orders"].max() <= 2 * got["n_orders"].min() + 8
    # ranges are disjoint and ordered
    s = got.sort_values("shard").reset_index(drop=True)
    assert (s["min_price"] <= s["max_price"]).all()
    assert (s["max_price"].iloc[:-1].to_numpy()
            <= s["min_price"].iloc[1:].to_numpy()).all()


def test_mojibake_repair_oracle(ray_session, con):
    from dup_ocropy_ray.pipelines import queries as q

    got = _canon(q.q_mojibake_repair(SF))
    want = _canon(con.sql(q.SQL_MOJIBAKE_REPAIR).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # a fifth of the corpus was damaged, and every row hash-matches the
    # expected repaired text (the oracle compares md5 value-for-value),
    # so the repair restored every damaged doc exactly
    assert got["was_damaged"].sum() == (got["doc_id"] % 5 == 0).sum()


def test_range_write_physical_layout(ray_session, con, tmp_path):
    """The sink writes a REAL hive range layout: pruned reads of one
    shard directory see only that range, the manifest records bounds +
    total rows, and a second call short-circuits on the manifest."""
    import json
    import os

    import ray.data as rd
    from dup_ocropy_ray.pipelines import queries as q
    from dup_ocropy_ray.pipelines.relational import write_range_partitioned

    ds = q._read(SF, "orders", ["o_orderkey", "o_totalprice"])
    out = str(tmp_path / "rw")
    man = write_range_partitioned(ds, "o_totalprice", out, nshards=4)
    assert man["rows"] == con.sql("SELECT count(*) FROM orders").fetchone()[0]
    assert len(man["bounds"]) == 3
    with open(os.path.join(out, "_bounds.json")) as f:
        assert json.load(f) == man
    # pruned read: shard 0 never exceeds the first bound
    s0 = rd.read_parquet(os.path.join(out, "shard=0")).to_pandas()
    assert s0["o_totalprice"].max() <= man["bounds"][0]
    # shard column came back via the hive partition, payload intact
    assert "o_orderkey" in s0.columns
    # idempotent: second call returns the published manifest unchanged
    assert write_range_partitioned(ds, "o_totalprice", out,
                                   nshards=4) == man


def test_attribution_oracle(ray_session, con):
    from dup_ocropy_ray.pipelines import queries as q

    got = _canon(q.q_attribution(SF))
    want = _canon(con.sql(q.SQL_ATTRIBUTION).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # both models attribute the same conversion set -> equal totals
    t = got.groupby("model")["n_conversions"].sum()
    assert t["first"] == t["last"]
    assert set(got["channel"]) <= {"click", "view"}


def test_attribution_tie_and_window_edges(ray_session, tmp_path):
    """Planted edges: a touch exactly at the lookback boundary counts,
    one just outside does not; equal-timestamp ties break by event_id
    (first = smallest, last = largest)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from dup_ocropy_ray.pipelines import queries as q

    base = np.datetime64("2000-01-10T00:00:00", "us")
    day = np.timedelta64(1, "D")
    rows = [
        # user 1: touch at exactly conv-7d (in), touch at conv-8d (out)
        (1, base - 8 * day, 1, "view"),
        (2, base - 7 * day, 1, "click"),
        (3, base, 1, "purchase"),
        # user 2: two touches at the SAME ts -> first=min id, last=max id
        (10, base - day, 2, "view"),
        (11, base - day, 2, "click"),
        (12, base, 2, "purchase"),
        # user 3: no touch in window
        (20, base, 3, "purchase"),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
    })
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    got = q.q_attribution(str(tmp_path)).set_index(["model", "channel"])
    # user 1: window touch is the 7d-boundary click (the 8d view is out)
    # user 2: first -> id 10 (view), last -> id 11 (click)
    assert got.loc[("first", "click"), "n_conversions"] == 1
    assert got.loc[("first", "view"), "n_conversions"] == 1
    assert got.loc[("last", "click"), "n_conversions"] == 2
    assert int(got["n_conversions"].sum()) == 4  # user 3 unattributed


def test_percentile_cont_oracle(ray_session, con):
    from dup_ocropy_ray.pipelines import queries as q

    got = q.q_percentile_cont(SF)
    want = con.sql(q.SQL_PERCENTILE_CONT).df()
    g = got.sort_values(["event_type", "q"]).reset_index(drop=True)
    w = want.sort_values(["event_type", "q"]).reset_index(drop=True)
    # bit-exact float equality — the interpolation replicates DuckDB's
    # IEEE evaluation order
    assert list(g["event_type"]) == list(w["event_type"])
    assert np.array_equal(g["value"].to_numpy(), w["value"].to_numpy())
    # quantiles are nondecreasing in q within every group
    for _, sub in g.groupby("event_type"):
        v = sub.sort_values("q")["value"].to_numpy()
        assert (np.diff(v) >= 0).all()
