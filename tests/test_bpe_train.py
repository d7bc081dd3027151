"""Distributed BPE trainer (textstats.bpe_train) vs a serial reference
implementation of Sennrich et al. 2016 — exact merge-sequence parity,
including the deterministic (count desc, left asc, right asc) tie rule."""

from collections import Counter

import numpy as np
import pandas as pd

import ray.data as rd

from dup_ocropy_ray.pipelines.textstats import bpe_train


def serial_bpe(texts, num_merges):
    wc = Counter(w for t in texts for w in (t or "").split())
    vocab = {w: list(w) + ["</w>"] for w in wc}
    merges = []
    for rank in range(num_merges):
        pc = Counter()
        for w, c in wc.items():
            s = vocab[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        (left, right), count = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, left, right, count))
        tok = left + right
        for w in vocab:
            s = vocab[w]
            i = 0
            while i < len(s) - 1:
                if s[i] == left and s[i + 1] == right:
                    s[i : i + 2] = [tok]
                else:
                    i += 1
    return pd.DataFrame({
        "rank": pd.Series([m[0] for m in merges], dtype="int64"),
        "left": pd.Series([m[1] for m in merges], dtype=str),
        "right": pd.Series([m[2] for m in merges], dtype=str),
        "count": pd.Series([m[3] for m in merges], dtype="int64"),
    })


def _ds(texts):
    return rd.from_pandas(pd.DataFrame({"text": texts})).repartition(3)


def test_bpe_train_matches_serial_reference(ray_session):
    rng = np.random.default_rng(17)
    base = ["lower", "lowest", "newer", "newest", "wider", "widest",
            "low", "new", "wide", "er", "est"]
    texts = [" ".join(rng.choice(base, size=rng.integers(3, 12)))
             for _ in range(40)]
    got = bpe_train(_ds(texts), num_merges=20)
    want = serial_bpe(texts, 20)
    pd.testing.assert_frame_equal(got, want)
    # the classic corpus learns multi-char subwords, not just pairs
    assert any(len(l) + len(r) > 3 for l, r in zip(got["left"], got["right"]))


def test_bpe_train_on_fixture_table(ray_session):
    import pyarrow.parquet as pq

    texts = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                          columns=["text"]).column("text").to_pylist()
    got = bpe_train(_ds(texts), num_merges=8)
    want = serial_bpe(texts, 8)
    pd.testing.assert_frame_equal(got, want)


def test_bpe_train_empty_and_degenerate(ray_session):
    got = bpe_train(_ds(["", None, "a"]), num_merges=5)
    want = serial_bpe(["", None, "a"], 5)
    pd.testing.assert_frame_equal(got, want)


def serial_kcenter(ids, vecs, k):
    import numpy as np
    order = np.argsort(ids)
    ids = np.asarray(ids)[order]
    M = np.asarray(vecs, dtype=np.float64)[order]
    chosen = [(0, int(ids[0]), 0.0)]
    mind = np.linalg.norm(M - M[0][None, :], axis=1)
    for rank in range(1, k):
        i = int(np.lexsort((ids, -mind))[0])
        chosen.append((rank, int(ids[i]), round(float(mind[i]), 6)))
        mind = np.minimum(mind, np.linalg.norm(M - M[i][None, :], axis=1))
    return pd.DataFrame({
        "rank": pd.Series([c[0] for c in chosen], dtype="int64"),
        "vec_id": pd.Series([c[1] for c in chosen], dtype="int64"),
        "dist": [c[2] for c in chosen],
    })


def test_kcenter_coreset_matches_serial(ray_session):
    from dup_ocropy_ray.pipelines.similarity import kcenter_coreset

    rng = np.random.default_rng(3)
    n, dim = 120, 8
    vecs = rng.standard_normal((n, dim))
    ids = rng.permutation(n).astype("int64") * 7 + 1
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": ids, "embedding": list(vecs)})).repartition(4)
    got = kcenter_coreset(ds, k=10)
    want = serial_kcenter(ids, vecs, 10)
    pd.testing.assert_frame_equal(got, want)
    # coverage radius shrinks (weakly) as centers are added
    d = got["dist"].to_numpy()[1:]
    assert (np.diff(d) <= 1e-9).all()


def test_ann_recall_monotone_and_exact_at_full_probe(ray_session):
    from dup_ocropy_ray.pipelines.similarity import ann_recall

    rng = np.random.default_rng(11)
    n, dim = 400, 16
    vecs = rng.standard_normal((n, dim))
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(n, dtype="int64"),
        "embedding": list(vecs)})).repartition(4)
    out = ann_recall(ds, vecs[:3], k=10, num_centroids=8,
                     probes=(1, 4, 8))
    r = out.set_index("nprobe")["recall"]
    assert r[8] == 1.0                       # full probe == brute force
    assert r[1] <= r[4] <= r[8]              # monotone in nprobe
    assert r[1] > 0.0                        # probes the query's own cell


# ------------------------------------------------------ apply / encode


def serial_encode(texts, merges):
    """Rank-order merge replay (exactly how training applied them)."""
    rules = list(zip(merges["left"], merges["right"]))
    out = []
    for t in texts:
        n = 0
        for w in (t or "").split():
            s = list(w) + ["</w>"]
            for left, right in rules:
                i = 0
                while i < len(s) - 1:
                    if s[i] == left and s[i + 1] == right:
                        s[i : i + 2] = [left + right]
                    else:
                        i += 1
            n += len(s)
        out.append(n)
    return out


def _docs_ds(texts):
    return rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype="int64"),
        "text": texts,
    })).repartition(3)


def test_bpe_apply_matches_rank_order_replay(ray_session):
    from dup_ocropy_ray.pipelines.textstats import bpe_apply

    rng = np.random.default_rng(23)
    base = ["lower", "lowest", "newer", "newest", "low", "new",
            "unrelated", "tokenizer", ""]
    texts = [" ".join(rng.choice(base, size=rng.integers(0, 15)))
             for _ in range(30)] + ["", None]
    merges = serial_bpe([t for t in texts if t], 15)
    got = (bpe_apply(_docs_ds(texts), merges).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = serial_encode(texts, merges)
    assert got["n_tokens"].tolist() == want
    # structural invariants
    words = [len((t or "").split()) for t in texts]
    chars = [sum(len(w) for w in (t or "").split()) for t in texts]
    assert got["n_words"].tolist() == words
    assert got["n_chars"].tolist() == chars
    # tokens bounded: one per word (fully merged) up to chars+words
    assert (got["n_tokens"] >= got["n_words"]).all()
    assert (got["n_tokens"] <= got["n_chars"] + got["n_words"]).all()


def test_bpe_apply_zero_merges_is_char_tokenizer(ray_session):
    from dup_ocropy_ray.pipelines.textstats import bpe_apply

    texts = ["ab abc", "x"]
    empty = pd.DataFrame({"rank": pd.Series([], dtype="int64"),
                          "left": pd.Series([], dtype=str),
                          "right": pd.Series([], dtype=str),
                          "count": pd.Series([], dtype="int64")})
    got = (bpe_apply(_docs_ds(texts), empty).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # every word -> len(word) chars + </w>
    assert got["n_tokens"].tolist() == [2 + 1 + 3 + 1, 1 + 1]


def test_unigram_lm_coverage_and_roundtrip(ray_session):
    """Every corpus word segments into pieces whose concatenation is the
    word (coverage: all single chars stay in the vocabulary)."""
    import ray.data as rd

    from dup_ocropy_ray.pipelines import textstats as ts

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    pieces = ts.unigram_lm_train(docs, vocab_size=120, em_iters=2,
                                 seed_keep=500)
    lp = dict(zip(pieces["piece"], pieces["logp"]))
    words = set()
    for t in docs.to_pandas()["text"].fillna(""):
        words.update(t.split())
    for w in sorted(words)[:300]:
        segs, score = ts.viterbi_segment(w, lp, 6)
        assert "".join(segs) == w
        assert score > -1e17
    # multi-char pieces were actually learned
    assert (pieces["piece"].str.len() > 1).sum() > 10


def test_unigram_lm_hard_em_monotone_and_deterministic(ray_session):
    """Hard-EM never decreases total Viterbi likelihood of the word
    table, and training is layout-independent (1 vs 8 blocks)."""
    import ray.data as rd

    from dup_ocropy_ray.pipelines import textstats as ts

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    wc = (docs.to_pandas()["text"].fillna("").str.split().explode()
          .dropna().value_counts())

    def total_ll(pieces):
        lp = dict(zip(pieces["piece"], pieces["logp"]))
        return sum(c * ts.viterbi_segment(w, lp, 6)[1]
                   for w, c in wc.items())

    lls = []
    for it in (1, 2, 3):
        p = ts.unigram_lm_train(docs, vocab_size=120, em_iters=it,
                                seed_keep=500)
        lls.append(total_ll(p))
    assert lls[0] <= lls[1] + 1e-6 and lls[1] <= lls[2] + 1e-6, lls

    a = ts.unigram_lm_train(docs, vocab_size=120, em_iters=2,
                            seed_keep=500)
    b = ts.unigram_lm_train(docs.repartition(8), vocab_size=120,
                            em_iters=2, seed_keep=500)
    pd.testing.assert_frame_equal(a, b)


def test_unigram_lm_query_runs(ray_session):
    from dup_ocropy_ray.pipelines import queries as q

    out = q.q_unigram_lm("/root/testdata/sf0.001")
    assert len(out) == 20
    assert (out["piece"].str.len() > 1).all()
    assert out["corpus_pieces"].iloc[0] <= out["corpus_chars"].iloc[0]
    assert out["corpus_pieces"].iloc[0] >= out["corpus_words"].iloc[0]
