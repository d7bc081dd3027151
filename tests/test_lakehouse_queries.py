"""Lakehouse maintenance queries: time travel, expectations gate,
incremental aggregate maintenance — value-exact against their DuckDB
twins at sf0.001, plus the group-deletion edge a full recompute never
shows (a type whose events are all CDC-deleted must vanish)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "documents", "orders", "customer"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF}/{t}.parquet')")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_time_travel_oracle(ray_session, con):
    from dup_ocropy_ray.pipelines import queries as q

    got = _canon(q.q_time_travel(SF))
    want = _canon(con.sql(q.SQL_TIME_TRAVEL).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    n_docs = con.sql("SELECT count(*) FROM documents").fetchone()[0]
    byv = got.set_index("version")
    # v0 is the base load; v1 applies the deletes (doc_id%9==0) and
    # the inserts (%9==3)
    assert byv.loc[0, "n_rows"] == n_docs
    d, i = con.sql("SELECT sum((doc_id % 9 = 0)::INT), "
                   "sum((doc_id % 9 = 3)::INT) FROM documents").fetchone()
    assert byv.loc[1, "n_rows"] == n_docs - d + i
    # v2 only rewrites existing keys -> row count is stable v1 -> v2
    assert byv.loc[2, "n_rows"] == byv.loc[1, "n_rows"]


def test_expectations_oracle(ray_session, con):
    from dup_ocropy_ray.pipelines import queries as q

    got = _canon(q.q_expectations(SF))
    want = _canon(con.sql(q.SQL_EXPECTATIONS).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    by = got.set_index("constraint")["n_violations"]
    assert by["any_violation"] >= by.drop("any_violation").max()
    assert by["any_violation"] <= by.drop("any_violation").sum()


def test_incremental_agg_oracle(ray_session, con):
    from dup_ocropy_ray.pipelines import queries as q

    got = _canon(q.q_incremental_agg(SF))
    want = _canon(con.sql(q.SQL_INCREMENTAL_AGG).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["n_events"] > 0).all()


def test_incremental_agg_group_deletion(ray_session, tmp_path):
    """A type whose every event is CDC-deleted (all ids % 13 == 0, none
    % 17 == 0) must DROP from the refreshed view — the delta algebra's
    group-deletion rule; a phantom zero-row would diverge from any full
    recompute."""
    from dup_ocropy_ray.pipelines import queries as q

    gone_ids = [13, 26, 39]            # %13==0, none %17==0
    keep_ids = [1, 2, 17]              # 17 -> also spawns an insert
    t = pa.table({
        "event_id": pa.array(gone_ids + keep_ids, pa.int64()),
        "event_type": pa.array(["gone"] * 3 + ["keep"] * 3),
        "value": pa.array([1.0, 2.0, 3.0, 10.0, 20.0, 30.0]),
    })
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    out = q.q_incremental_agg(str(tmp_path))
    assert list(out["event_type"]) == ["keep"]
    # keep: 3 base rows + 1 insert (id 17, value 30.0 -> 3100 cents)
    assert int(out["n_events"].iloc[0]) == 4
    assert int(out["sum_cents"].iloc[0]) == 1000 + 2000 + 3000 + 3100


def test_coalesce_intervals_oracle(ray_session, con):
    from dup_ocropy_ray.pipelines import queries as q

    got = _canon(q.q_coalesce_intervals(SF))
    want = _canon(con.sql(q.SQL_COALESCE_INTERVALS).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["n_islands"] >= 1).all()


def test_coalesce_intervals_touch_and_gap(ray_session):
    """Planted edges: touching intervals merge (start == running end),
    a strictly-later start cuts a new island, containment collapses."""
    import ray.data as rd

    from dup_ocropy_ray.pipelines.windows import coalesce_intervals

    base = np.datetime64("2000-01-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    rows = pd.DataFrame({
        "user_id": np.array([1, 1, 1, 1, 2], dtype="int64"),
        # [0,10] [10,15] (touch -> merge), [16,30] (gap), [17,20] (contained)
        "ts": [base, base + 10 * s, base + 16 * s, base + 17 * s, base],
        "dur_us": np.array([10, 5, 14, 3, 0], dtype="int64") * 1_000_000,
    })
    out = coalesce_intervals(rd.from_pandas(rows)).set_index("user_id")
    assert out.loc[1, "n_islands"] == 2
    assert out.loc[1, "covered_us"] == (15 + 14) * 1_000_000
    # zero-length interval is still an island
    assert out.loc[2, "n_islands"] == 1
    assert out.loc[2, "covered_us"] == 0


def test_typo_pairs_oracle_and_false_positives(ray_session, con):
    from dup_ocropy_ray.pipelines import queries as q

    got = _canon(q.q_typo_pairs(SF))
    want = _canon(con.sql(q.SQL_TYPO_PAIRS).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["dist"] == 1).all()  # distinct terms -> dist exactly 1

    # direct core: deletion-variant false positives must be verified away
    import ray.data as rd

    from dup_ocropy_ray.functions.edist import levenshtein
    from dup_ocropy_ray.pipelines.dedup import typo_pairs

    terms = ["ab", "ba", "abc", "abcd", "xabc", "zz", "az"]
    out = typo_pairs(rd.from_pandas(pd.DataFrame({"term": terms})))
    expect = sorted(
        (a, b) for i, a in enumerate(terms) for b in terms[i + 1:]
        if levenshtein(*sorted((a, b))) <= 1
        for a, b in [tuple(sorted((a, b)))])
    assert sorted(zip(out["a"], out["b"])) == expect
    assert ("ab", "ba") not in set(zip(out["a"], out["b"]))


def test_skyline_oracle(ray_session, con):
    from dup_ocropy_ray.pipelines import queries as q

    c = duckdb.connect()
    c.sql(f"CREATE VIEW lineitem AS SELECT * FROM "
          f"read_parquet('{SF}/lineitem.parquet')")
    got = _canon(q.q_skyline(SF))
    want = _canon(c.sql(q.SQL_SKYLINE).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # Pareto frontier: price strictly decreasing as qty increases
    srt = got.sort_values("qty")["price_cents"].to_numpy()
    assert (np.diff(srt) < 0).all()


def test_transition_matrix_oracle(ray_session, con):
    from dup_ocropy_ray.pipelines import queries as q

    got = _canon(q.q_transition_matrix(SF))
    want = _canon(con.sql(q.SQL_TRANSITION_MATRIX).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # total transitions = sum over users of (n_events - 1)
    exp = con.sql("SELECT sum(n - 1) FROM (SELECT count(*) AS n "
                  "FROM events GROUP BY user_id)").fetchone()[0]
    assert int(got["n"].sum()) == exp


def test_benford_digits_oracle(ray_session, con):
    from dup_ocropy_ray.pipelines import queries as q

    c = duckdb.connect()
    c.sql(f"CREATE VIEW orders AS SELECT * FROM "
          f"read_parquet('{SF}/orders.parquet')")
    got = _canon(q.q_benford_digits(SF))
    want = _canon(c.sql(q.SQL_BENFORD_DIGITS).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["n"].sum() == c.sql(
        "SELECT count(*) FROM orders WHERE o_totalprice >= 1").fetchone()[0]
    assert 990 <= got["permille"].sum() <= 1000  # floor rounding


def test_trend_by_source_oracle(ray_session, con):
    from dup_ocropy_ray.pipelines import queries as q

    got = _canon(q.q_trend_by_source(SF))
    want = _canon(con.sql(q.SQL_TREND_BY_SOURCE).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # exact rational: num/den reproduces the float OLS slope
    docs = con.sql("SELECT source, doc_id, n_chars FROM documents").df()
    for _, r in got.iterrows():
        sub = docs[docs["source"] == r["source"]]
        ref = np.polyfit(sub["doc_id"], sub["n_chars"], 1)[0]
        assert abs(r["slope_num"] / r["slope_den"] - ref) < 1e-8


def test_weighted_sample_oracle(ray_session, con):
    from dup_ocropy_ray.pipelines import queries as q

    got = q.q_weighted_sample(SF)
    want = con.sql(q.SQL_WEIGHTED_SAMPLE).df()
    assert list(got["doc_id"]) == list(want["doc_id"])  # ordered top-20
    assert np.array_equal(got["priority"].to_numpy(),
                          want["priority"].to_numpy())  # bit-exact
    # A-Res invariant: priorities sorted descending, exactly k rows
    p = got["priority"].to_numpy()
    assert len(got) == 20 and (np.diff(p) <= 0).all()


def test_incremental_join_oracle(ray_session, con):
    """Delta-join MV maintenance equals the from-scratch recompute,
    including sign cancellation for orders that are BOTH CDC-deleted
    and owned by a nation-changed customer."""
    from dup_ocropy_ray.pipelines import queries as q

    got = _canon(q.q_incremental_join(SF))
    want = _canon(con.sql(q.SQL_INCREMENTAL_JOIN).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the overlap class (o_orderkey%13==0 AND c_custkey%11==0) must be
    # non-empty or the cancellation path went untested
    n = con.sql("""SELECT count(*) FROM orders o JOIN customer c
                   ON o.o_custkey = c.c_custkey
                   WHERE o.o_orderkey % 13 = 0 AND c.c_custkey % 11 = 0
                """).fetchone()[0]
    assert n > 0


def test_scd2_join_oracle(ray_session, con):
    """Temporal fact x SCD2 join equals the interval-predicate twin;
    deleted keys (doc_id%9==0 probed past seq 0) drop from the result."""
    from dup_ocropy_ray.pipelines import queries as q

    got = _canon(q.q_scd2_join(SF))
    want = _canon(con.sql(q.SQL_SCD2_JOIN).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every probe matches at most one version
    assert got["doc_id"].is_unique
    # some deleted-doc probe at t>=1 exists and is absent from the join
    dele = con.sql("""SELECT count(*) FROM documents
                      WHERE doc_id % 9 = 0 AND n_chars % 4 >= 1
                   """).fetchone()[0]
    assert dele > 0
    deleted_ids = con.sql("""SELECT doc_id FROM documents
                             WHERE doc_id % 9 = 0 AND n_chars % 4 >= 1
                          """).df()["doc_id"]
    assert not got["doc_id"].isin(set(deleted_ids)).any()


def test_drift_emd_oracle_and_invariants(ray_session, con):
    """Integer EMD drift: oracle-exact, zero for a source whose
    distribution equals the corpus, positive for a planted shift,
    symmetric-scale identity emd(s) bounded by n_s * N."""
    from dup_ocropy_ray.pipelines import queries as q

    got = _canon(q.q_drift_emd(SF))
    want = _canon(con.sql(q.SQL_DRIFT_EMD).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["emd_scaled"] >= 0).all()

    # planted: identical distribution -> 0; shifted -> positive
    import numpy as np
    import ray.data as rd

    base = pd.DataFrame({
        "source": ["a"] * 4 + ["b"] * 4,
        "n_chars": [50, 150, 250, 350] * 2,
    })
    # monkey-free: drive the same math through a temp parquet dir
    import tempfile, os
    d = tempfile.mkdtemp(dir="/tmp")
    base.assign(doc_id=range(8)).to_parquet(
        os.path.join(d, "documents.parquet"))
    out = q.q_drift_emd(d).set_index("source")
    assert out.loc["a", "emd_scaled"] == 0
    assert out.loc["b", "emd_scaled"] == 0

    shifted = pd.DataFrame({
        "source": ["a"] * 4 + ["b"] * 4,
        "n_chars": [50, 50, 50, 50, 350, 350, 350, 350],
    })
    shifted.assign(doc_id=range(8)).to_parquet(
        os.path.join(d, "documents.parquet"))
    out2 = q.q_drift_emd(d).set_index("source")
    assert out2.loc["a", "emd_scaled"] > 0
    assert out2.loc["a", "emd_scaled"] == out2.loc["b", "emd_scaled"]
