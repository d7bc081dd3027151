"""Window/session/as-of operators (pipelines/windows.py)."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


@pytest.fixture(scope="module")
def events(ray_session):
    base = pd.Timestamp("2024-01-01")
    rows = []
    # user 1: two sessions (gap 45 min between event 2 and 3)
    for i, mins in enumerate([0, 10, 20, 65, 70]):
        rows.append((1, base + pd.Timedelta(minutes=mins), float(i)))
    # user 2: one session
    for i, mins in enumerate([0, 29, 58]):
        rows.append((2, base + pd.Timedelta(minutes=mins), 10.0 + i))
    return pd.DataFrame(rows, columns=["user_id", "ts", "value"])


def test_sessionize(events):
    from dup_ocropy_ray.pipelines.windows import sessionize

    out = sessionize(rd.from_pandas(events)).to_pandas().set_index("user_id")
    assert out.loc[1, "n_sessions"] == 2
    assert out.loc[1, "max_session_events"] == 3
    assert out.loc[1, "n_events"] == 5
    assert out.loc[2, "n_sessions"] == 1
    assert out.loc[2, "n_events"] == 3


def test_rolling_last(events):
    from dup_ocropy_ray.pipelines.windows import rolling_last

    out = rolling_last(rd.from_pandas(events), window=4).to_pandas()
    byid = out.set_index("user_id")
    # user 1: last 4 values = 1,2,3,4 -> 2.5; user 2: all 3 -> 11.0
    assert byid.loc[1, "last_ma"] == pytest.approx(2.5)
    assert byid.loc[2, "last_ma"] == pytest.approx(11.0)


def test_asof_join_aggregate(events):
    from dup_ocropy_ray.pipelines.windows import asof_join_aggregate

    ev = events.assign(event_type=["a", "a", "b", "b", "a", "b", "a", "b"])
    base = pd.Timestamp("2023-12-01")
    orders = pd.DataFrame(
        {
            # custkey = user_id + 1; user 1 -> custkey 2 has two orders,
            # the later one (key 7) before all events; user 2 -> custkey 3
            # has one order AFTER every event (never matches)
            "o_custkey": [2, 2, 3],
            "o_orderdate": [base, base + pd.Timedelta(days=5),
                            pd.Timestamp("2025-01-01")],
            "o_orderkey": [6, 7, 8],
            "o_totalprice": [100.0, 250.5, 999.0],
        }
    )
    out = asof_join_aggregate(
        rd.from_pandas(ev[["user_id", "ts", "event_type"]]),
        rd.from_pandas(orders),
    ).set_index("event_type")
    # user 1 events always match order 7 (250.5 -> 25050 cents)
    assert out.loc["a", "n_events"] == 4
    # events: user1 has types a,a,b,b,a ; user2: b,a,b
    assert out.loc["a", "n_matched"] == 3  # user 1's three 'a' events
    assert out.loc["a", "sum_price_cents"] == 3 * 25050
    assert out.loc["b", "n_matched"] == 2
    assert out.loc["b", "sum_price_cents"] == 2 * 25050


def test_sessionize_single_event_users(ray_session):
    from dup_ocropy_ray.pipelines.windows import sessionize

    df = pd.DataFrame(
        {"user_id": [5], "ts": [pd.Timestamp("2024-06-01")], "value": [1.0]}
    )
    out = sessionize(rd.from_pandas(df)).to_pandas()
    assert out.iloc[0]["n_sessions"] == 1
    assert out.iloc[0]["n_events"] == 1


def test_kmeans_separable_blobs(ray_session):
    """Distributed Lloyd k-means recovers a clean 3-blob partition."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dup_ocropy_ray.pipelines.similarity import kmeans_assign, kmeans_fit

    rng = np.random.default_rng(0)
    centers = np.eye(3)
    rows = []
    for i in range(90):
        c = i % 3
        v = centers[c] + rng.normal(0, 0.05, size=3)
        rows.append({"vec_id": i, "embedding": v.tolist(), "true": c})
    ds = rd.from_pandas(pd.DataFrame(rows))
    C = kmeans_fit(ds, k=3, iters=5)
    assert C.shape == (3, 3)
    out = kmeans_assign(ds, C).to_pandas()
    # every true blob maps to exactly one k-means cluster
    m = out.groupby("true")["cluster"].nunique()
    assert (m == 1).all()
    assert out.groupby("cluster").size().tolist() == [30, 30, 30]
    assert (out["centroid_sim"] > 0.9).all()


def test_range_join_self(ray_session):
    """Interval self-join: follow-ups within the window counted exactly,
    self-pair excluded, duplicates on the same date handled."""
    import pandas as pd
    import ray.data as rd

    from dup_ocropy_ray.pipelines.windows import range_join_aggregate

    rows = [
        # cust 1: three orders, 2nd and 3rd within 10 days of the 1st
        dict(o_custkey=1, o_orderdate=pd.Timestamp("2020-01-01"),
             o_orderpriority="P1", o_totalprice=10.0),
        dict(o_custkey=1, o_orderdate=pd.Timestamp("2020-01-05"),
             o_orderpriority="P2", o_totalprice=20.0),
        dict(o_custkey=1, o_orderdate=pd.Timestamp("2020-01-09"),
             o_orderpriority="P1", o_totalprice=30.0),
        # cust 2: two orders on the SAME date -> each is the other's pair
        dict(o_custkey=2, o_orderdate=pd.Timestamp("2020-06-01"),
             o_orderpriority="P1", o_totalprice=5.0),
        dict(o_custkey=2, o_orderdate=pd.Timestamp("2020-06-01"),
             o_orderpriority="P1", o_totalprice=7.0),
        # cust 3: lone order -> no pairs
        dict(o_custkey=3, o_orderdate=pd.Timestamp("2020-01-01"),
             o_orderpriority="P2", o_totalprice=99.0),
    ]
    out = range_join_aggregate(rd.from_pandas(pd.DataFrame(rows)),
                               window_days=10).set_index("o_orderpriority")
    # P1 anchors: 2020-01-01 (pairs: 01-05, 01-09 -> 2), 2020-01-09 (0),
    # cust2 both (1 each) -> 4 pairs; cents 2000+3000 + 700 + 500
    assert out.loc["P1", "n_pairs"] == 4
    assert out.loc["P1", "sum_price_cents"] == 2000 + 3000 + 700 + 500
    # P2 anchor 2020-01-05: pair 01-09 only
    assert out.loc["P2", "n_pairs"] == 1
    assert out.loc["P2", "sum_price_cents"] == 3000


def test_compose_sort_keys_overflow_fallback():
    """int64 headroom: µs encoding silently wrapped past ~40k keys over a
    multi-year span; the composer must coarsen resolution (exact for
    date-aligned data) instead, and raise rather than wrap when the
    timestamps genuinely need µs."""
    import numpy as np
    import pytest

    from dup_ocropy_ray.pipelines.windows import compose_sort_keys

    day = 86_400_000_000
    # small case: µs resolution fits untouched
    kid = np.array([0, 0, 1], dtype=np.int64)
    nts = np.array([0, 5, 3], dtype=np.int64)
    comb, span, div = compose_sort_keys(kid, nts)
    assert div == 1 and list(comb) == [0, 5, span + 3]

    # 1M keys over ~8 years of day-aligned dates: overflows at µs,
    # exact at coarser resolution; ordering within/across keys preserved
    kid = np.arange(1_000_000, dtype=np.int64)
    nts = (np.arange(1_000_000, dtype=np.int64) % 3000) * day
    comb, span, div = compose_sort_keys(kid, nts, extra_us=90 * day)
    assert div > 1
    assert (comb == kid * span + nts // div).all()
    assert comb.max() < 2**63 and (np.diff(comb) > 0).all()

    # same key count but µs-unaligned timestamps: must raise, not wrap
    nts_bad = nts.copy()
    nts_bad[1] += 1  # 1µs off any coarser grid
    with pytest.raises(OverflowError):
        compose_sort_keys(kid, nts_bad)


def test_minhash_dedup_distributed(ray_session):
    """MinHash+LSH end-to-end: near-dup pair found and exact-Jaccard
    verified with nothing text-sized on the driver; zero-dup corpus
    returns an empty typed result (no empty-join crash)."""
    import pandas as pd
    import ray.data as rd

    from dup_ocropy_ray.pipelines.dedup import minhash_dedup_pairs

    base = ("the quick brown fox jumps over the lazy dog while the "
            "sun sets slowly behind the quiet hills of the valley")
    near = base.replace("quiet", "silent")
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [f"u{i}" for i in range(12)] + ["dupA", "dupB"],
        "text": [f"utterly distinct {i} prose about topic-{i * 13} with "
                 f"flavour {i * 29} and spice {i * 7}" for i in range(12)]
                + [base, near],
    }))
    out = minhash_dedup_pairs(docs, threshold=0.6)
    assert list(zip(out.doc_a, out.doc_b)) == [("dupA", "dupB")]
    assert out.jaccard.iloc[0] > 0.65  # one word of ~21 shingles changed

    lone = rd.from_pandas(pd.DataFrame({
        "doc_id": ["a", "b"],
        "text": ["completely different words here",
                 "nothing shared at all between them"],
    }))
    empty = minhash_dedup_pairs(lone, threshold=0.6)
    assert len(empty) == 0 and list(empty.columns) == ["doc_a", "doc_b",
                                                       "jaccard"]


def test_oversize_group_lsh_prefilter(ray_session):
    """ngram/embedding dedup: groups over the cap switch to an LSH
    prefilter + exact verify; the true near-dups must still be found
    (here: exact path and prefilter path agree on an easy corpus)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dup_ocropy_ray.pipelines.dedup import (
        embedding_dup_pairs,
        ngram_jaccard_pairs,
    )

    rng = np.random.default_rng(3)
    texts = [" ".join(f"w{rng.integers(0, 5000)}" for _ in range(30))
             for _ in range(40)]
    texts += [texts[0] + " extra", texts[5]]
    docs = pd.DataFrame({
        "doc_id": [f"d{i:03d}" for i in range(len(texts))],
        "text": texts, "lang": "en", "source": "web",
    })
    ds = rd.from_pandas(docs)
    exact = ngram_jaccard_pairs(ds, ["lang", "source"],
                                threshold=0.5).to_pandas()
    lsh = ngram_jaccard_pairs(ds, ["lang", "source"], threshold=0.5,
                              max_group_rows=5).to_pandas()
    key = lambda df: sorted(zip(df.doc_a, df.doc_b, df.jaccard.round(6)))
    assert key(exact) == key(lsh) and len(exact) == 2

    vecs = rng.standard_normal((40, 16))
    vecs = np.concatenate([vecs, vecs[:3] + 0.01 * rng.standard_normal((3, 16))])
    emb = pd.DataFrame({
        "vec_id": [f"v{i:03d}" for i in range(len(vecs))],
        "embedding": list(vecs), "label": "a",
    })
    eds = rd.from_pandas(emb)
    ex = embedding_dup_pairs(eds, threshold=0.95).to_pandas()
    ap = embedding_dup_pairs(eds, threshold=0.95,
                             max_group_rows=5).to_pandas()
    k2 = lambda df: sorted(zip(df.id_a, df.id_b))
    assert k2(ex) == k2(ap) and len(ex) >= 3


def test_connected_components(ray_session):
    """Cluster collapse over dup pairs: transitive closure (a~b, b~c =>
    one cluster), per-cluster canonical min id, INT ids survive the
    nullable-union float64 coercion (hash(120.0) != hash(120) once sent
    a node's messages to two partitions), and a chain needs several
    propagation rounds."""
    import pandas as pd
    import ray.data as rd

    from dup_ocropy_ray.pipelines.dedup import connected_components

    edges = rd.from_pandas(pd.DataFrame({
        "doc_a": ["a", "b", "x", "m"], "doc_b": ["b", "c", "y", "n"],
    }))
    cc = connected_components(edges).to_pandas()
    got = dict(zip(cc.doc_id, cc.cluster_id))
    assert got == {"a": "a", "b": "a", "c": "a",
                   "m": "m", "n": "m", "x": "x", "y": "x"}
    assert len(cc) == cc.doc_id.nunique()  # no duplicate label rows

    n = 10  # int-id chain 0-1-...-9: diameter forces multi-round
    chain = rd.from_pandas(pd.DataFrame({
        "doc_a": list(range(n - 1)), "doc_b": list(range(1, n)),
    }))
    out = connected_components(chain).to_pandas()
    assert len(out) == n and set(out.cluster_id) == {0}

    empty = connected_components(rd.from_pandas(pd.DataFrame({
        "doc_a": pd.Series([], dtype="int64"),
        "doc_b": pd.Series([], dtype="int64"),
    })))
    assert empty.count() == 0


def test_keep_best(ray_session):
    """Per-cluster argmax-score keep/drop: highest score wins, ties break
    to min doc_id, unlabeled docs keep themselves, string ids work."""
    import pandas as pd
    import ray.data as rd

    from dup_ocropy_ray.pipelines.dedup import keep_best

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": ["a", "b", "c", "m", "n", "solo"],
        "score": [1.0, 5.0, 5.0, 2.0, 2.0, 0.5],
    }))
    labels = rd.from_pandas(pd.DataFrame({
        "doc_id": ["a", "b", "c", "m", "n"],
        "cluster_id": ["a", "a", "a", "m", "m"],
    }))
    out = keep_best(docs, labels).to_pandas()
    got = dict(zip(out.doc_id, out.cluster_id))
    # cluster a: b and c tie at 5.0 -> b (min id); cluster m: m (tie,
    # min id); solo has no label -> keeps itself
    assert got == {"b": "a", "m": "m", "solo": "solo"}

    # int ids survive the nullable-union float64 coercion
    idocs = rd.from_pandas(pd.DataFrame({
        "doc_id": [10, 20, 30], "score": [1.0, 9.0, 1.0],
    }))
    ilabels = rd.from_pandas(pd.DataFrame({
        "doc_id": [10, 20], "cluster_id": [10, 10],
    }))
    iout = keep_best(idocs, ilabels).to_pandas()
    assert dict(zip(iout.doc_id, iout.cluster_id)) == {20: 10, 30: 30}


def test_ngram_dense_matches_loop(ray_session):
    """The dense docs x vocab matmul path and the per-pair loop fallback
    produce identical pairs and jaccard values (budget patched to force
    the loop)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dup_ocropy_ray.pipelines import dedup

    rng = np.random.default_rng(11)
    words = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(words, size=12, replace=False))
             for _ in range(30)]
    texts += [texts[0] + " extra", texts[5]]
    df = pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype="int64"),
        "text": texts,
        "lang": "en", "source": "web",
    })
    ds = rd.from_pandas(df)
    dense = dedup.ngram_jaccard_pairs(
        ds, ["lang", "source"], threshold=0.3).to_pandas()
    old_budget = dedup._DENSE_BUDGET
    try:
        dedup._DENSE_BUDGET = 0  # force the per-pair loop
        loop = dedup.ngram_jaccard_pairs(
            ds, ["lang", "source"], threshold=0.3).to_pandas()
    finally:
        dedup._DENSE_BUDGET = old_budget
    key = lambda d: d.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(key(dense), key(loop))
    assert len(dense) >= 2  # the planted near-dup + exact-dup pairs


def test_grouped_topk(ray_session):
    """Per-group top-k across multiple blocks equals the pandas
    reference: local prunes can't drop a true top-k row, and mixed
    ascending plus a tie-break column make the result deterministic."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dup_ocropy_ray.pipelines.relational import grouped_topk

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "grp": rng.choice(list("abcde"), size=200),
        "score": rng.integers(0, 20, size=200),  # many ties
        "id": np.arange(200),
    })
    got = (
        grouped_topk(rd.from_pandas(df).repartition(4), "grp",
                     ["score", "id"], k=3, ascending=[False, True])
        .to_pandas().sort_values(["grp", "id"]).reset_index(drop=True)
    )
    want = (
        df.sort_values(["score", "id"], ascending=[False, True], kind="stable")
        .groupby("grp", sort=False).head(3)
        .sort_values(["grp", "id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["grp", "score", "id"]],
                                  want[["grp", "score", "id"]])


def test_ordered_scan_matches_pandas(ray_session):
    """ordered_scan's distributed prefix sums/maxima must equal a
    single-threaded pandas scan regardless of block boundaries."""
    from dup_ocropy_ray.pipelines.windows import ordered_scan

    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame({
        "k": rng.permutation(n).astype("int64"),
        "x": rng.integers(-100, 100, n).astype("int64"),
        "m": rng.integers(0, 10**9, n).astype("int64"),
    })
    ds = rd.from_pandas(df).repartition(16)
    out = (ordered_scan(ds, "k", sum_cols=("x",), max_cols=("m",))
           .to_pandas().sort_values("k").reset_index(drop=True))

    ref = df.sort_values("k").reset_index(drop=True)
    exp_run = ref["x"].cumsum().astype("int64")
    exp_wm = ref["m"].cummax().shift(1)  # exclusive max; first row NaN
    assert (out["run_x"].to_numpy() == exp_run.to_numpy()).all()
    assert out["wm_m"].iloc[0] == np.iinfo(np.int64).min
    assert (out["wm_m"].to_numpy()[1:] ==
            exp_wm.to_numpy()[1:].astype("int64")).all()


def test_window_dedup_events(ray_session):
    import pandas as pd
    import ray.data as rd
    from dup_ocropy_ray.pipelines.windows import window_dedup_events

    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5],
        "user_id": [7, 7, 7, 7, 8],
        "event_type": ["click", "click", "click", "view", "click"],
        # click at 0min kept, 30min suppressed, 70min suppressed too
        # (debounce vs PREVIOUS event at 30min, kept or not)
        "ts": [base, base + pd.Timedelta(minutes=30),
               base + pd.Timedelta(minutes=70), base, base],
    })
    out = (window_dedup_events(rd.from_pandas(df).repartition(2),
                               num_partitions=2)
           .to_pandas().sort_values("event_id"))
    assert list(out.event_id) == [1, 4, 5]


def test_connected_components_long_chain_pointer_jump(ray_session):
    """Diameter >> plain-round budget: the jump phase must collapse a
    200-edge path to ONE component with the min label (the plain loop
    used to hit its cap silently and return a partial labeling)."""
    import pandas as pd
    import ray.data as rd
    from dup_ocropy_ray.pipelines.dedup import connected_components

    n = 200
    chain = pd.DataFrame({"doc_a": list(range(n)),
                          "doc_b": list(range(1, n + 1))})
    out = connected_components(rd.from_pandas(chain).repartition(4)
                               ).to_pandas()
    assert out.cluster_id.nunique() == 1
    assert set(out.cluster_id) == {0}
    assert len(out) == n + 1


def test_grouped_quantiles_serial_parity(ray_session):
    """grouped_quantiles matches the quantile_disc selection rule
    (sorted[max(ceil(q*n)-1, 0)]) and is block-layout independent."""
    import math

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dup_ocropy_ray.pipelines.relational import grouped_quantiles

    rng = np.random.default_rng(6)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], size=500),
        "v": rng.normal(size=500),
    })
    outs = [grouped_quantiles(rd.from_pandas(df).repartition(p), "k", "v")
            for p in (1, 6)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    for (k_, q), sub in outs[0].groupby(["k", "q"]):
        v = np.sort(df.loc[df["k"] == k_, "v"].to_numpy())
        idx = max(int(math.ceil(q * len(v))) - 1, 0)
        assert sub["value"].iloc[0] == v[idx], (k_, q)


def test_minhash_recall_eval(ray_session):
    from dup_ocropy_ray.pipelines.dedup import minhash_recall

    rng = np.random.default_rng(31)
    vocab = [f"tok{j}" for j in range(200)]
    texts = []
    for i in range(40):
        words = list(rng.choice(vocab, size=30))
        texts.append(" ".join(words))
        # planted near-dup: mutate two words -> high shingle overlap
        mut = list(words)
        mut[5], mut[20] = "zzz", "yyy"
        texts.append(" ".join(mut))
    texts += ["", "   "]  # empty/empty pairs at jaccard 1.0 on both legs
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype="int64"),
        "text": texts,
    })).repartition(4)

    # sample_mod=1: evaluate on every doc; full-band config (one row per
    # band) makes any J>=0.5 pair a guaranteed candidate -> recall 1.0
    out = minhash_recall(docs, sample_mod=1, threshold=0.5,
                         num_perm=64, num_bands=64)
    assert out.loc[0, "n_true_pairs"] > 0
    assert out.loc[0, "n_extra"] == 0       # precision invariant
    assert out.loc[0, "recall"] == 1.0

    # production banding (r=4) on the same corpus: still sound
    # (detected subset of truth), recall reported in [0, 1]
    out2 = minhash_recall(docs, sample_mod=1, threshold=0.5,
                          num_perm=64, num_bands=16)
    assert out2.loc[0, "n_extra"] == 0
    assert 0.0 <= out2.loc[0, "recall"] <= 1.0


def test_paragraph_dedup_planted(ray_session):
    """CCNet paragraph dedup: cross-doc dup paragraph keeps only the
    earliest (doc_id, ord) copy, a within-doc repeat keeps its first
    occurrence, an all-dup doc vanishes, an empty doc produces no row."""
    import duckdb

    from dup_ocropy_ray.pipelines.dedup import paragraph_dedup
    from dup_ocropy_ray.pipelines.queries import SQL_PARAGRAPH_DEDUP

    P = ["alpha beta gamma", "delta epsilon zeta", "eta theta iota",
         "kappa lambda mu"]
    rows = [
        {"doc_id": 0, "text": f"{P[0]} {P[1]} {P[2]}"},
        # doc 1 repeats P[1] (cross-doc dup) and has a unique tail
        {"doc_id": 1, "text": f"{P[1]} {P[3]} unique one tail"},
        # doc 2 is built entirely of already-seen paragraphs -> vanishes
        {"doc_id": 2, "text": f"{P[0]} {P[2]}"},
        # doc 3 repeats its own first paragraph within itself
        {"doc_id": 3, "text": "solo dup para solo dup para rest of it"},
        {"doc_id": 4, "text": ""},          # empty -> no row
        {"doc_id": 5, "text": None},        # NULL -> no row
    ]
    df = pd.DataFrame(rows)
    got = paragraph_dedup(rd.from_pandas(df).repartition(3), k=3) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)

    assert got.doc_id.tolist() == [0, 1, 3]
    assert got.loc[got.doc_id == 1, "clean_text"].iloc[0] == \
        f"{P[3]} unique one tail"
    assert got.loc[got.doc_id == 3, "clean_text"].iloc[0] == \
        "solo dup para rest of it"
    assert got.loc[got.doc_id == 0, "n_kept"].iloc[0] == 3

    con = duckdb.connect()
    con.register("docs_src", df)
    con.sql("CREATE VIEW documents AS SELECT * FROM docs_src")
    want = con.sql(SQL_PARAGRAPH_DEDUP).df()
    out = pd.DataFrame({
        "doc_id": got.doc_id.astype("int64"),
        "clean_text": got.clean_text,
        "n_kept": got.n_kept.astype("int64"),
        "n_para": got.n_para.astype("int64"),
    })
    pd.testing.assert_frame_equal(out, want.reset_index(drop=True),
                                  check_dtype=False)


def test_rate_limit_events_binding_caps(ray_session):
    """Synthetic bursts where the cap binds: limit=2 over per-hour
    buckets, ties on ts broken by event_id, bursts crossing the hour
    boundary reset the count, multiple users interleaved."""
    from dup_ocropy_ray.pipelines.windows import rate_limit_events

    base = pd.Timestamp("2024-03-01 10:00:00")
    rows = []
    eid = 0
    # user 1: 5 events in hour A (keep first 2), 3 in hour B (keep 2)
    for m in [1, 2, 3, 4, 5]:
        rows.append((eid, base + pd.Timedelta(minutes=m), 1)); eid += 1
    for m in [61, 62, 63]:
        rows.append((eid, base + pd.Timedelta(minutes=m), 1)); eid += 1
    # user 2: two events at the SAME ts (tie -> lower event_id wins)
    t = base + pd.Timedelta(minutes=30)
    rows.append((eid, t, 2)); eid += 1
    rows.append((eid, t, 2)); eid += 1
    rows.append((eid, t, 2)); eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])
    # shuffle input order: result must not depend on arrival order
    df = df.sample(frac=1.0, random_state=5).reset_index(drop=True)

    got = (rate_limit_events(rd.from_pandas(df).repartition(3), limit=2,
                             num_partitions=4)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    want = (df.assign(h=df["ts"].dt.floor("h"))
            .sort_values(["user_id", "h", "ts", "event_id"]))
    want["rank"] = want.groupby(["user_id", "h"]).cumcount()
    want = (want[want["rank"] < 2][["event_id", "ts", "user_id"]]
            .sort_values("event_id").reset_index(drop=True))
    assert got["event_id"].tolist() == want["event_id"].tolist()
    # the cap really bound: 11 events in, 2 per (user, hour) survive
    assert len(got) == 6


def test_funnel_steps_window_and_order(ray_session):
    """Hand-built funnel: step order matters (click before the first
    view doesn't count), the per-step window binds, and earliest
    completion anchors each step."""
    from dup_ocropy_ray.pipelines.windows import funnel_steps

    base = pd.Timestamp("2024-04-01")
    H = pd.Timedelta(hours=1)
    rows = []  # (user, ts, type)
    # u1 completes: view @0, click @2h (in 24h), purchase @3h
    rows += [(1, base, "view"), (1, base + 2 * H, "click"),
             (1, base + 3 * H, "purchase")]
    # u2: click BEFORE its first view -> click leg never qualifies
    rows += [(2, base, "click"), (2, base + 1 * H, "view"),
             (2, base + 2 * H, "purchase")]
    # u3: click outside the 24h window of the first view
    rows += [(3, base, "view"), (3, base + 30 * H, "click")]
    # u4: completes with the SECOND click (first is pre-view);
    #     purchase is within 24h of the QUALIFYING click
    rows += [(4, base - H, "click"), (4, base, "view"),
             (4, base + 5 * H, "click"), (4, base + 6 * H, "purchase")]
    # u5: view only
    rows += [(5, base, "view")]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    df = df.sample(frac=1.0, random_state=3).reset_index(drop=True)

    out = funnel_steps(rd.from_pandas(df).repartition(3),
                       ["view", "click", "purchase"],
                       window=pd.Timedelta(hours=24), num_partitions=4)
    got = dict(zip(out["step"], out["n_users"]))
    assert got == {"view": 5, "click": 2, "purchase": 2}
    assert out["step_no"].tolist() == [1, 2, 3]


def test_retention_days_offsets(ray_session):
    """Retention offsets anchor at each user's OWN first day; gaps and
    beyond-horizon days drop out; same-day repeats count once."""
    from dup_ocropy_ray.pipelines.windows import retention_days

    rows = []
    d = pd.Timestamp("2024-05-10")
    D = pd.Timedelta(days=1)
    # u1 active days 0,1,3 and day 9 (beyond max_offset)
    for off in [0, 0, 1, 3, 9]:
        rows.append((1, d + off * D + pd.Timedelta(hours=off)))
    # u2 starts later; active its day 0 and 2
    for off in [0, 2]:
        rows.append((2, d + 5 * D + off * D))
    # u3 single event
    rows.append((3, d))
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    out = retention_days(rd.from_pandas(df).repartition(3), max_offset=6,
                         num_partitions=4)
    got = dict(zip(out["day_offset"], out["n_users"]))
    assert got == {0: 3, 1: 1, 2: 1, 3: 1, 4: 0, 5: 0, 6: 0}


def test_rolling_distinct_window_membership(ray_session):
    """Hand-built: a user active only at hour H serves windows H, H+1,
    H+2; repeats within an hour count once; disjoint users add."""
    from dup_ocropy_ray.pipelines.windows import rolling_distinct

    H = pd.Timestamp("2024-07-01 10:00:00")
    hr = pd.Timedelta(hours=1)
    rows = [
        (1, H), (1, H + pd.Timedelta(minutes=30)),   # u1 hour 10 twice
        (2, H + 2 * hr),                             # u2 hour 12
        (3, H + 5 * hr),                             # u3 hour 15
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    out = rolling_distinct(rd.from_pandas(df).repartition(2),
                           window_hours=3, num_partitions=4)
    got = {pd.Timestamp(h).hour: n for h, n in
           zip(out["hour"], out["n_keys"])}
    # windows: 10,11 -> {u1}; 12 -> {u1,u2}; 13,14 -> {u2};
    # 15,16,17 -> {u3}
    assert got == {10: 1, 11: 1, 12: 2, 13: 1, 14: 1,
                   15: 1, 16: 1, 17: 1}
