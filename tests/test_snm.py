"""Sorted-Neighborhood dedup (dedup.sorted_neighborhood_pairs)."""

import numpy as np
import pandas as pd

import ray.data as rd

from dup_ocropy_ray.pipelines.dedup import sorted_neighborhood_pairs


def _brute(df: pd.DataFrame, window: int, threshold: float,
           key_len: int = 8) -> pd.DataFrame:
    t = df.assign(key=df.text.fillna("").str.strip().str.lower()
                  .str.slice(0, key_len))
    t = t.sort_values(["key", "doc_id"]).reset_index(drop=True)
    rows = []
    for i in range(len(t)):
        for j in range(i + 1, min(i + window, len(t))):
            a = set((t.text.iloc[i] or "").split())
            b = set((t.text.iloc[j] or "").split())
            u = len(a | b)
            jac = len(a & b) / u if u else 1.0
            if jac >= threshold:
                da, db = int(t.doc_id.iloc[i]), int(t.doc_id.iloc[j])
                rows.append((min(da, db), max(da, db), round(jac, 6)))
    return (pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))


def test_brute_parity_with_dup_families(ray_session):
    rng = np.random.RandomState(3)
    vocab = np.array([f"w{i}" for i in range(120)])
    texts = [" ".join(rng.choice(vocab, rng.randint(3, 25)))
             for _ in range(150)]
    # planted: shared-prefix families so they sort adjacently
    for j in range(10):
        texts.append("zza common prefix family " + " ".join(
            rng.choice(vocab, 4)))
    texts.extend(["", None, "   "])
    df = pd.DataFrame({"doc_id": pd.Series(range(len(texts)),
                                           dtype="int64"),
                       "text": texts})
    for w, thr in ((5, 0.3), (3, 0.5)):
        got = (sorted_neighborhood_pairs(rd.from_pandas(df), window=w,
                                         threshold=thr)
               .to_pandas().astype({"doc_a": "int64", "doc_b": "int64"})
               .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
        want = _brute(df, w, thr)
        pd.testing.assert_frame_equal(got, want)
        assert len(want) > 0


def test_window_one_yields_nothing(ray_session):
    df = pd.DataFrame({"doc_id": pd.Series([1, 2], dtype="int64"),
                       "text": ["a b", "a b"]})
    out = sorted_neighborhood_pairs(rd.from_pandas(df),
                                    window=1).to_pandas()
    assert len(out) == 0  # distance must be < window


# ------------------------------------------------------ KLL sketch


def test_kll_rank_error_and_merge(ray_session):
    import numpy as np

    from dup_ocropy_ray.pipelines.sketches import KLL

    rng = np.random.RandomState(1)
    x = rng.lognormal(3, 1, 100_000)
    xs = np.sort(x)
    s = KLL(200)
    for chunk in np.array_split(x, 37):
        s.update(chunk)
    for q in (0.01, 0.5, 0.99):
        rank = np.searchsorted(xs, s.quantile(q)) / len(xs)
        assert abs(rank - q) < 0.01, q
    # mergeable: two halves merged give the same error class
    a, b = KLL(200), KLL(200)
    a.update(x[:50_000])
    b.update(x[50_000:])
    a.merge(b)
    for q in (0.25, 0.75):
        rank = np.searchsorted(xs, a.quantile(q)) / len(xs)
        assert abs(rank - q) < 0.01, q
    # summary stays sublinear
    assert sum(len(lv) for lv in a.levels) < 2_000
    # round-trip
    c = KLL.from_blob(a.to_blob())
    assert c.quantile(0.5) == a.quantile(0.5) and c.n == a.n


def test_kll_distributed_query(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dup_ocropy_ray.pipelines.sketches import kll_quantiles

    rng = np.random.RandomState(2)
    x = rng.uniform(0, 1000, 30_000)
    ds = rd.from_pandas(pd.DataFrame({"value": x}))
    out = kll_quantiles(ds, "value")
    assert int(out["n"].iloc[0]) == 30_000
    xs = np.sort(x)
    for q, v in zip(out["q"], out["value"]):
        rank = np.searchsorted(xs, v) / len(xs)
        assert abs(rank - q) < 0.015, (q, v)


def test_dedup_eval_calibration(ray_session):
    from dup_ocropy_ray.pipelines.queries import q_dedup_eval

    out = q_dedup_eval("/root/testdata/sf0.001").set_index("method")
    assert out.loc["minhash_lsh", "recall_permille"] == 1000
    assert out.loc["minhash_lsh", "precision_permille"] == 1000
    assert out.loc["ppjoin_exact", "recall_permille"] == 1000
    assert out.loc["ppjoin_exact", "precision_permille"] == 1000
    # simhash banding targets near-identity; at J=0.8 recall is partial
    assert out.loc["simhash_h10", "recall_permille"] < 1000
    assert (out["n_pred"] >= out["tp"]).all()


# ------------------------------------------------------ MMR select


def test_mmr_select_diversity_and_parity(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dup_ocropy_ray.pipelines.similarity import knn_brute, mmr_select

    rng = np.random.RandomState(5)
    # two tight clusters near the query + diffuse background: pure
    # relevance ranking fills top-4 from cluster A; MMR must mix in B
    q = np.array([1.0, 0.0, 0.0, 0.0])
    A = q + 0.05 * rng.randn(6, 4)            # very close to q
    B = np.array([0.7, 0.7, 0.0, 0.0]) + 0.05 * rng.randn(6, 4)
    C = rng.randn(30, 4)
    V = np.vstack([A, B, C])
    df = pd.DataFrame({"vec_id": pd.Series(range(len(V)), dtype="int64"),
                       "embedding": [list(map(float, v)) for v in V]})
    ds = rd.from_pandas(df)
    top = knn_brute(ds, q, k=6)
    sel = mmr_select(ds, q, k=6, pool=20, lam=0.3)
    # rank 0 is the pure-relevance winner in both
    assert sel["vec_id"].iloc[0] == top["vec_id"].iloc[0]
    # pure relevance stays inside tight cluster A; diversity-weighted
    # MMR escapes it (background + cluster B are more marginal)
    assert set(top["vec_id"]) <= set(range(6))
    assert sum(v >= 6 for v in sel["vec_id"]) >= 3
    # deterministic
    sel2 = mmr_select(ds, q, k=6, pool=20, lam=0.3)
    pd.testing.assert_frame_equal(sel, sel2)
    # lam=1.0 degenerates to pure relevance order
    rel = mmr_select(ds, q, k=6, pool=20, lam=1.0)
    assert rel["vec_id"].tolist() == top["vec_id"].tolist()


# ------------------------------------------------------ TextRank


def test_textrank_picks_central_sentence(ray_session):
    from dup_ocropy_ray.pipelines.textstats import textrank_sentences

    # the hub sentence shares words with every other; satellites don't
    # overlap each other
    text = ("alpha beta gamma delta. alpha red red red. "
            "beta blue blue blue. gamma green green green. "
            "unrelated totally disjoint words here.")
    out = textrank_sentences(text, k=1)
    assert out[0][0] == 0  # the hub wins
    assert textrank_sentences("", k=2) == []
    one = textrank_sentences("just one sentence", k=3)
    assert len(one) == 1 and one[0][2] == "just one sentence"
    # deterministic
    assert textrank_sentences(text, k=2) == textrank_sentences(text, k=2)


# --------------------------------------------------- HLL overlap


def test_hll_overlap_partial_sets(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dup_ocropy_ray.pipelines.sketches import hll_overlap_by_type

    # A = users 0..3999, B = 2000..5999 -> exact overlap 2000
    rows = ([("A", u) for u in range(4000)]
            + [("B", u) for u in range(2000, 6000)])
    df = pd.DataFrame(rows, columns=["event_type", "user_id"])
    df["user_id"] = df["user_id"].astype("int64")
    out = hll_overlap_by_type(rd.from_pandas(df))
    assert len(out) == 1
    r = out.iloc[0]
    assert r["exact_inter"] == 2000
    # HLL p=14: set-size estimates within ~2%, inclusion-exclusion
    # intersection compounds to a few percent
    assert abs(r["est_a"] - 4000) / 4000 < 0.03
    assert abs(r["est_inter"] - 2000) / 2000 < 0.10
    # determinism
    out2 = hll_overlap_by_type(rd.from_pandas(df))
    pd.testing.assert_frame_equal(out, out2)


def test_quantile_methods_panel(ray_session):
    from dup_ocropy_ray.pipelines.queries import q_quantile_methods

    out = q_quantile_methods("/root/testdata/sf0.001")
    # sketches stay inside their error class of the exact answer; the
    # hash sample is 200 rows at sf0.001, so its rank-error bound
    # (~sqrt(q(1-q)/200)) translates to a few hundred permille of
    # VALUE at the steep quartile — the gate reflects that class
    assert (out["kll_dev_permille"] <= 50).all()
    assert (out["sampled_dev_permille"] <= 400).all()
    assert (out["exact"] > 0).all()


# ----------------------------------------------------- TextTiling


def test_texttiling_planted_topics(ray_session):
    from dup_ocropy_ray.pipelines.textstats import texttiling_boundaries

    t1 = " ".join(["apple", "fruit", "orchard", "tree", "juice",
                   "ripe"] * 10)
    t2 = " ".join(["engine", "piston", "torque", "diesel", "gear",
                   "clutch"] * 10)
    t3 = " ".join(["river", "delta", "salmon", "current", "bank",
                   "flow"] * 10)
    assert texttiling_boundaries(t1 + " " + t2) == [60]
    assert texttiling_boundaries(t1 + " " + t2 + " " + t3) == [60, 120]
    assert texttiling_boundaries(t1) == []       # single topic
    assert texttiling_boundaries("too short") == []
    # deterministic
    assert (texttiling_boundaries(t1 + " " + t2)
            == texttiling_boundaries(t1 + " " + t2))


# --------------------------------------------- JL random projection


def test_rp_recall_on_clustered_data(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dup_ocropy_ray.pipelines.similarity import rp_knn_recall

    rng = np.random.RandomState(13)
    # 50 well-separated clusters of EXACTLY k=10 points: the true
    # top-10 is the point's own cluster, so recall measures cluster
    # preservation (not hairline intra-cluster ordering, which no
    # compression preserves)
    centers = rng.randn(50, 64) * 4.0
    V = np.vstack([c + rng.randn(10, 64) * 0.3 for c in centers])
    df = pd.DataFrame({"vec_id": pd.Series(range(len(V)), dtype="int64"),
                       "embedding": [list(map(float, v)) for v in V]})
    ds = rd.from_pandas(df)
    out = rp_knn_recall(ds, V[:2], k=10, out_dims=(8, 32))
    r = dict(zip(out["out_dim"], out["recall_permille"]))
    assert r[32] >= 900      # JL preserves real neighborhoods
    assert r[8] <= r[32] + 100  # roughly monotone in target dim
    # deterministic
    out2 = rp_knn_recall(ds, V[:2], k=10, out_dims=(8, 32))
    pd.testing.assert_frame_equal(out, out2)


def test_mannwhitney_identity(ray_session):
    from dup_ocropy_ray.pipelines.queries import q_mannwhitney

    out = q_mannwhitney("/root/testdata/sf0.001").set_index("group")
    n_en, n_de = int(out.loc["en", "n"]), int(out.loc["de", "n"])
    # U_en + U_de == n_en * n_de (doubled on both sides)
    assert (int(out.loc["en", "u_x2"]) + int(out.loc["de", "u_x2"])
            == 2 * n_en * n_de)
    assert (out["u_x2"] >= 0).all()
