"""Distributed multinomial Naive Bayes classifier
(pipelines/textstats.nb_classifier): integer-quantized log scoring,
train/held-out split, DuckDB twin parity."""

import duckdb
import numpy as np
import pandas as pd

import ray.data as rd

from dup_ocropy_ray.pipelines.textstats import nb_classifier


def _ds(rows):
    df = pd.DataFrame(rows)
    df["doc_id"] = df["doc_id"].astype("int64")
    return rd.from_pandas(df).repartition(3)


def _oracle(sql, rows):
    con = duckdb.connect()
    con.register("docs_src", pd.DataFrame(rows))
    con.sql("CREATE VIEW documents AS SELECT * FROM docs_src")
    return con.sql(sql).df()


def test_separable_classes_predicted_exactly(ray_session):
    # class-specific vocabularies: held-out docs must classify perfectly
    rows = []
    for i in range(40):
        lang = "aa" if i % 2 == 0 else "bb"
        word = "apple banana cherry" if lang == "aa" else "xray yak zebra"
        rows.append({"doc_id": i, "lang": lang, "text": word + " common"})
    out = nb_classifier(_ds(rows), label_col="lang", train_mod=5)
    assert len(out) == 8  # doc_id % 5 == 0
    assert (out["pred_lang"] == out["lang"]).all()


def test_empty_doc_predicts_prior_argmax_with_lex_ties(ray_session):
    # held-out doc 0 has no tokens; priors are equal (2 train docs per
    # class), so the tie breaks to the lexicographically smallest class
    rows = [
        {"doc_id": 0, "lang": "zz", "text": ""},
        {"doc_id": 1, "lang": "mm", "text": "alpha beta"},
        {"doc_id": 2, "lang": "aa", "text": "gamma delta"},
        {"doc_id": 3, "lang": "mm", "text": "alpha beta"},
        {"doc_id": 4, "lang": "aa", "text": "gamma delta"},
    ]
    out = nb_classifier(_ds(rows), label_col="lang", train_mod=5)
    assert out.loc[0, "pred_lang"] == "aa"


def test_matches_duckdb_twin_on_messy_corpus(ray_session):
    from dup_ocropy_ray.pipelines.queries import SQL_NB_LANGID

    rng = np.random.RandomState(7)
    vocab = [f"w{j}" for j in range(30)]
    rows = []
    for i in range(60):
        lang = ["aa", "bb", "cc"][i % 3]
        # overlapping vocab with a per-class skew
        probs = np.ones(30)
        probs[(i % 3) * 10:(i % 3) * 10 + 10] = 4.0
        words = rng.choice(vocab, size=rng.randint(0, 25),
                           p=probs / probs.sum())
        rows.append({"doc_id": i, "lang": lang, "text": " ".join(words)})
    rows[0]["text"] = ""                      # empty held-out doc
    rows[5]["text"] = None                    # NULL held-out doc
    rows[10]["text"] = "unseen tokens only"   # all-unseen held-out doc
    rows[15]["lang"] = "dd"                   # class present only held-out
    df = pd.DataFrame(rows)

    got = nb_classifier(rd.from_pandas(df).repartition(4),
                        label_col="lang", train_mod=5)
    want = _oracle(SQL_NB_LANGID, rows)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False)
    # the test-only class is never predicted (model trained without it)
    assert "dd" not in set(got["pred_lang"])


# ----------------------------------------------- per-source KL drift


def test_source_kl_ranks_planted_drift(ray_session):
    from dup_ocropy_ray.pipelines.textstats import source_kl

    rows = []
    i = 0
    # srcA/srcB share one distribution; srcC is lexically alien
    for _ in range(30):
        for s, words in (("srcA", "alpha beta gamma delta"),
                         ("srcB", "alpha beta gamma delta"),
                         ("srcC", "qqq www eee rrr")):
            rows.append({"doc_id": i, "source": s, "text": words})
            i += 1
    out = source_kl(_ds(rows), group_col="source")
    kl = out.set_index("source")["kl_micro"]
    assert kl["srcC"] > kl["srcA"] and kl["srcC"] > kl["srcB"]
    # per-source KL normalized: alien source is far from the mixture
    assert kl["srcC"] / (1e6 * 120) > 0.5  # > 0.5 nats


def test_source_kl_matches_duckdb_twin_messy(ray_session):
    from dup_ocropy_ray.pipelines.queries import SQL_SOURCE_KL
    from dup_ocropy_ray.pipelines.textstats import source_kl

    rng = np.random.RandomState(13)
    vocab = [f"w{j}" for j in range(40)]
    rows = []
    for i in range(50):
        s = f"src{i % 4}"
        words = rng.choice(vocab, size=rng.randint(0, 30))
        rows.append({"doc_id": i, "source": s, "text": " ".join(words)})
    rows[3]["text"] = None
    rows[7]["text"] = ""
    # a source whose every doc is empty (zero tokens, kl 0)
    rows.append({"doc_id": 50, "source": "srcE", "text": "  "})
    df = pd.DataFrame(rows)

    got = source_kl(rd.from_pandas(df).repartition(4),
                    group_col="source")
    want = _oracle(SQL_SOURCE_KL, rows)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False)
    assert int(want.set_index("source")["kl_micro"]["srcE"]) == 0


def test_lr_quality_accuracy_and_determinism(ray_session):
    """Held-out accuracy gate on the real sf0.001 corpus + bit-identical
    weights across two runs on the same input (stable-order reduce)."""
    from dup_ocropy_ray.pipelines.textstats import (
        lr_features, lr_quality, lr_train)

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text", "n_chars"])
    out = lr_quality(ds)
    acc = out[out.label == out.pred].n.sum() / out.n.sum()
    assert acc >= 0.85, f"held-out accuracy {acc}"

    w1 = lr_train(lr_features(ds), steps=6)
    w2 = lr_train(lr_features(ds), steps=6)
    assert (w1 == w2).all()


def test_lr_train_matches_serial_reference(ray_session):
    """On a single block, distributed Newton-IRLS lr_train must equal
    (to float round-off of the fold-back) a serial numpy implementation
    of the same standardize + IRLS — same steps, l2."""
    from dup_ocropy_ray.pipelines.textstats import (
        LR_FEATS, lr_features, lr_score, lr_train)

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text", "n_chars"])
    feat = lr_features(ds).to_pandas().sort_values("doc_id")
    steps, l2 = 6, 1e-4

    X0 = np.column_stack([feat[c].to_numpy("float64") for c in LR_FEATS])
    y = feat["label"].to_numpy("float64")
    mu, sd = X0.mean(0), X0.std(0)
    sd[sd == 0] = 1.0
    X = np.column_stack([(X0 - mu) / sd, np.ones(len(y))])
    n = len(y)
    w = np.zeros(X.shape[1])
    for _ in range(steps):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        r = p * (1.0 - p)
        H = (X * r[:, None]).T @ X + l2 * n * np.eye(X.shape[1])
        g = X.T @ (y - p) - l2 * n * w
        w = w + np.linalg.solve(H, g)
    want = np.empty_like(w)
    nf = len(LR_FEATS)
    want[:nf] = w[:nf] / sd
    want[nf] = w[nf] - float((w[:nf] * mu / sd).sum())

    got = lr_train(rd.from_pandas(feat).repartition(1),
                   steps=steps, l2=l2)
    assert np.allclose(got, want, rtol=1e-9, atol=1e-12)

    # scoring applies raw-space weights per batch
    scored = lr_score(rd.from_pandas(feat), got).to_pandas()
    p_ser = 1.0 / (1.0 + np.exp(-(np.column_stack(
        [X0, np.ones(len(y))]) @ want)))
    s = scored.sort_values("doc_id")["prob"].to_numpy()
    assert np.allclose(s, p_ser, rtol=1e-9)


# --------------------------------------------- AdaBoost stumps


def test_adaboost_serial_parity_and_accuracy(ray_session):
    """The distributed stump selection must equal a serial numpy
    replay of the same algorithm (same bins, same stable reduce), and
    the held-out confusion must beat chance comfortably."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from dup_ocropy_ray.pipelines.textstats import (
        LR_FEATS, adaboost_stumps, boost_quality, lr_features)

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text", "n_chars"])
    ds = rd.from_arrow(t)
    feat_ds = lr_features(ds)
    stumps = adaboost_stumps(feat_ds, rounds=6)
    assert len(stumps) >= 1
    # serial replay on the collected feature table
    feat = feat_ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    cols = list(LR_FEATS)
    nf = len(cols)
    X = np.column_stack([feat[c].to_numpy(np.float64) for c in cols])
    y = feat["label"].to_numpy(np.int64) * 2 - 1
    edges = []
    for j in range(nf):
        lo, hi = X[:, j].min(), X[:, j].max()
        edges.append(np.linspace(lo, hi, 33)[1:-1] if hi > lo
                     else np.array([lo]))
    F = np.zeros(len(y))
    serial = []
    for _ in range(6):
        w = np.exp(-y * F)
        best = None
        for j in range(nf):
            idx = np.searchsorted(edges[j], X[:, j], side="left")
            hp = np.bincount(idx, weights=w * (y > 0),
                             minlength=edges[j].shape[0] + 1)
            hn = np.bincount(idx, weights=w * (y < 0),
                             minlength=edges[j].shape[0] + 1)
            cp, cn = np.cumsum(hp)[:-1], np.cumsum(hn)[:-1]
            if cp.shape[0] == 0:
                continue
            tot_p, tot_n = hp.sum(), hn.sum()
            for pol, errs in ((1, cn + (tot_p - cp)),
                              (-1, cp + (tot_n - cn))):
                b = int(np.argmin(errs))
                e = float(errs[b]) / (tot_p + tot_n)
                if best is None or e < best[0]:
                    best = (e, j, b, pol)
        e, j, b, pol = best
        e = min(max(e, 1e-10), 1 - 1e-10)
        if e >= 0.5 - 1e-9:
            break
        alpha = 0.5 * float(np.log((1 - e) / e))
        serial.append((cols[j], float(edges[j][b]), pol, alpha))
        F += alpha * pol * np.where(X[:, j] <= edges[j][b], 1.0, -1.0)
    got = list(zip(stumps.feature, stumps.thr, stumps.pol, stumps.alpha))
    assert len(got) == len(serial)
    for g, s in zip(got, serial):
        assert g[0] == s[0] and g[2] == s[2]
        np.testing.assert_allclose([g[1], g[3]], [s[1], s[3]], rtol=1e-12)

    conf = boost_quality(ds, rounds=6)
    acc = conf[conf.label == conf.pred].n.sum() / conf.n.sum()
    assert acc >= 0.9
    assert conf.equals(boost_quality(ds, rounds=6))  # deterministic


# ------------------------------------------- isotonic calibration


def test_pav_properties_and_reference():
    import numpy as np

    from dup_ocropy_ray.pipelines.textstats import pav_fit

    rng = np.random.RandomState(9)
    for _ in range(20):
        bins = rng.randint(3, 40)
        n = rng.randint(0, 20, bins).astype(np.int64)
        pos = np.array([rng.randint(0, k + 1) for k in n], dtype=np.int64)
        iso = pav_fit(n, pos)
        m = n > 0
        r = iso[m]
        # monotone non-decreasing over populated bins
        assert (np.diff(r) >= -1e-12).all()
        # weighted mass preserved
        np.testing.assert_allclose((iso * n).sum(), pos.sum(), rtol=1e-9)
        # quadratic reference: repeatedly average adjacent violators
        rates = [(float(w), float(p)) for w, p in zip(n, pos) if w > 0]
        changed = True
        while changed:
            changed = False
            for i in range(len(rates) - 1):
                (w1, p1), (w2, p2) = rates[i], rates[i + 1]
                if p1 * w2 >= p2 * w1 and not (w1 == 0 or w2 == 0):
                    rates[i:i + 2] = [(w1 + w2, p1 + p2)]
                    changed = True
                    break
        ref = []
        for w, p in rates:
            ref.extend([p / w] * int(round(w / 1)))  # expand by weight
        # compare segment rates through cumulative weights
        flat = np.repeat(r, n[m])
        flat_ref = np.concatenate(
            [np.full(int(w), p / w) for w, p in rates])
        np.testing.assert_allclose(flat, flat_ref, rtol=1e-9)


def test_isotonic_calibration_query(ray_session):
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from dup_ocropy_ray.pipelines.textstats import isotonic_calibration

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text", "n_chars"])
    out = isotonic_calibration(rd.from_arrow(t))
    assert (np.diff(out["iso_permille"].to_numpy()) >= 0).all()
    assert out["n"].sum() > 0
    # deterministic
    out2 = isotonic_calibration(rd.from_arrow(t))
    assert out.equals(out2)
