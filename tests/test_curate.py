"""Training-data curation ops (pipelines/curate.py)."""

import numpy as np
import pandas as pd

import ray.data as rd

from dup_ocropy_ray.pipelines.curate import (
    decontaminate,
    inject_pii,
    pack_sequences,
    pii_scrub,
)


def _docs(texts):
    return rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype="int64"),
        "text": texts,
    })).repartition(3)


def test_pack_sequences_matches_serial_scan(ray_session):
    rng = np.random.default_rng(5)
    texts = ["w " * int(rng.integers(0, 40)) for _ in range(50)]
    out = pack_sequences(_docs(texts), window=16)
    cum = 0
    for i, t in enumerate(texts):
        n = len(t.split())
        row = out.iloc[i]
        assert row["doc_id"] == i
        assert row["n_tokens"] == n
        assert row["start_tok"] == cum
        assert row["window_id"] == cum // 16
        cum += n


def test_decontaminate_flags_planted_overlap(ray_session):
    words = [f"tok{j}" for j in range(30)]
    eval_doc = " ".join(words)  # doc 0 donates words[3:11]
    snippet = " ".join(words[3:11])
    texts = [
        eval_doc,                       # doc 0: self-hit
        "clean text " * 5,              # doc 1: no hit
        f"prefix {snippet} suffix",     # doc 2: contaminated
        f"pre  {snippet.replace(' ', '  ', 2)} post",  # doc 3: ws-dirty hit
    ]
    out = decontaminate(_docs(texts), every=97, skip=3, n_words=8)
    assert out["doc_id"].tolist() == [0, 2, 3]
    assert (out["n_hits"] == 1).all()


def test_decontaminate_overlap_counts_planted_windows(ray_session):
    from dup_ocropy_ray.pipelines.curate import decontaminate_overlap

    words = [f"tok{j}" for j in range(20)]
    eval_doc = " ".join(words)          # doc 0 is the eval set (0 % 3 == 0)
    texts = [
        eval_doc,
        # doc 1: contains words[2:7] -> windows [2..2] hit once, plus
        # unique filler; 1 hit out of (5 filler + 5 shared + 5 filler
        # - 4) = 11 windows
        "u1 u2 u3 u4 u5 " + " ".join(words[2:7]) + " v1 v2 v3 v4 v5",
        # doc 2: fully contained 10-word span -> 6 hit windows
        " ".join(words[5:15]),
        # doc 3 is eval (3 % 3 == 0): excluded from output even though
        # it trivially self-hits
        eval_doc,
        # doc 4: no overlap
        "a b c d e f g h i j",
    ]
    out = decontaminate_overlap(_docs(texts), every=3, window=5)
    assert out["doc_id"].tolist() == [1, 2]
    d1 = out[out.doc_id == 1].iloc[0]
    assert (d1["n_windows"], d1["n_hit"]) == (11, 1)
    assert d1["overlap_permille"] == 1000 // 11
    d2 = out[out.doc_id == 2].iloc[0]
    assert (d2["n_windows"], d2["n_hit"]) == (6, 6)
    assert d2["overlap_permille"] == 1000


def test_pii_scrub_roundtrip_and_raw_patterns(ray_session):
    texts = ["alpha beta gamma delta", "", "one two"]
    out = pii_scrub(_docs(texts))
    assert out["scrubbed"].tolist() == texts
    assert out["n_redactions"].tolist() == [1 + i % 3 for i in range(3)]
    # the injector really plants scrubbable patterns
    dirty = inject_pii(2, texts[0])
    assert "@example.com" in dirty or "555-" in dirty or "10." in dirty


def test_pii_scrub_catches_real_world_shapes(ray_session):
    from dup_ocropy_ray.pipelines.curate import pii_scrub_stage

    b = pd.DataFrame({
        "doc_id": [0],
        "dirty": ["mail a.b+c@mail.co.uk call (212) 555-0199 ip 192.168.1.1 end"],
    })
    out = pii_scrub_stage(b)
    assert out["scrubbed"].iloc[0] == "mail call ip end"
    assert out["n_redactions"].iloc[0] == 3


def test_sample_by_source_deterministic_and_weighted(ray_session):
    from dup_ocropy_ray.pipelines.curate import sample_by_source

    n = 4000
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype="int64"),
        "source": np.where(np.arange(n) % 2 == 0, "a", "longname"),
        "n_chars": np.full(n, 10, dtype="int64"),
    })
    ds = rd.from_pandas(df).repartition(4)
    out1 = sample_by_source(ds)
    out2 = sample_by_source(ds)  # reproducible across runs
    pd.testing.assert_frame_equal(out1, out2)
    r = out1.set_index("source")["n_kept"]
    # keep rates: 'a' -> 25%, 'longname' -> 60% of 2000 each (hash noise)
    assert abs(r["a"] / 2000 - 0.25) < 0.05
    assert abs(r["longname"] / 2000 - 0.60) < 0.05


def test_hll_accuracy_and_merge(ray_session):
    """Distributed HLL estimate within 2% of exact, and merging block
    partials must equal sketching the concatenation."""
    from dup_ocropy_ray.pipelines.sketches import (
        approx_distinct_by_key,
        hll_estimate,
        hll_update,
    )

    rng = np.random.default_rng(9)
    n = 60000
    df = pd.DataFrame({
        "k": np.where(np.arange(n) % 3 == 0, "x", "y"),
        "v": rng.integers(0, 25000, n).astype("int64").astype(str),
    })
    exact = df.groupby("k")["v"].nunique()
    out = approx_distinct_by_key(
        rd.from_pandas(df).repartition(8), "k", "v").set_index("k")
    for k in ("x", "y"):
        err = abs(out.loc[k, "approx_distinct"] - exact[k]) / exact[k]
        assert err < 0.02, (k, out.loc[k, "approx_distinct"], exact[k])

    # merge property: max of partials == sketch of the union
    a, b = df["v"][: n // 2], df["v"][n // 2:]
    import numpy as _np

    r1 = _np.zeros(1 << 14, dtype=_np.uint8)
    r2 = _np.zeros(1 << 14, dtype=_np.uint8)
    rall = _np.zeros(1 << 14, dtype=_np.uint8)
    hll_update(r1, a.to_numpy(dtype=object))
    hll_update(r2, b.to_numpy(dtype=object))
    hll_update(rall, df["v"].to_numpy(dtype=object))
    assert (_np.maximum(r1, r2) == rall).all()


def test_bm25_search_ranking(ray_session):
    from dup_ocropy_ray.pipelines.textstats import bm25_search

    texts = [
        "spark spark spark window",          # high tf on rare+common
        "window merge",                      # two terms once
        "nothing relevant here",             # no hit
        "spark",                             # one rare term
        "window window window window",       # saturated common term
    ] + ["window filler"] * 10               # make 'window' common
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype="int64"),
        "text": texts,
    })).repartition(3)
    out = bm25_search(docs, ["spark", "window"], k=3)
    assert list(out["doc_id"])[0] == 0          # tf-saturated rare term wins
    assert 2 not in set(out["doc_id"])          # zero-hit doc never ranked
    assert (out["score"] > 0).all()
    # saturation: 4x 'window' scores < 2x the 1x-'window' contribution
    s = bm25_search(docs, ["window"], k=15).set_index("doc_id")["score"]
    assert s[4] < 2 * s[1]


def test_text_index_roundtrip_matches_scan(ray_session, tmp_path):
    """search_text_index over the persisted posting buckets must equal
    the corpus-scan bm25_search exactly (same integer-rational scores),
    including terms absent from the corpus and k > hits."""
    from dup_ocropy_ray.pipelines.textstats import (
        bm25_search, build_text_index, search_text_index)

    rng = np.random.default_rng(7)
    vocab = ["spark", "window", "merge", "alpha", "beta", "gamma",
             "delta", "xyz"]
    texts = [" ".join(rng.choice(vocab, rng.integers(1, 12)))
             for _ in range(80)] + ["", "   "]
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype="int64"),
        "text": texts,
    })).repartition(4)
    idx = str(tmp_path / "idx")
    n = build_text_index(docs, idx, num_buckets=8)
    assert n == len(texts)
    # hive layout on storage: bucket directories, stats sidecar
    import os
    assert os.path.exists(os.path.join(idx, "_stats.json"))
    assert any(d.startswith("bucket=") for d in os.listdir(idx))

    for terms, k in ([["spark", "window"], 5], [["merge"], 50],
                     [["spark", "nosuchterm"], 10]):
        got = search_text_index(idx, terms, k=k)
        want = bm25_search(docs, terms, k=k)
        got = got.sort_values(["score", "doc_id"],
                              ascending=[False, True]).reset_index(drop=True)
        want = want.sort_values(["score", "doc_id"],
                                ascending=[False, True]).reset_index(drop=True)
        assert got.astype("int64").equals(want.astype("int64")), terms

    # all-absent terms -> empty result with the contract columns
    out = search_text_index(idx, ["zzz_absent"], k=3)
    assert len(out) == 0 and list(out.columns) == ["doc_id", "score"]


def test_chunk_documents_overlap_and_edges(ray_session):
    from dup_ocropy_ray.pipelines.curate import chunk_documents

    texts = ["", "x" * 10, "ab" * 150]  # empty, sub-window, 300 chars
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(3, dtype="int64"), "text": texts}))
    out = (chunk_documents(docs, size=100, overlap=20).to_pandas()
           .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True))
    g = out.groupby("doc_id")
    assert g.size().tolist() == [1, 1, 4]  # starts 0,80,160,240 < 300
    assert out[out.doc_id == 0].chunk.iloc[0] == ""
    c = out[out.doc_id == 2].reset_index(drop=True)
    # overlap: consecutive chunks share the trailing/leading 20 chars
    assert c.chunk[0][-20:] == c.chunk[1][:20]
    joined = c.chunk[0] + "".join(ch[20:] for ch in c.chunk[1:])
    assert joined == "ab" * 150  # lossless reassembly


# ------------------------------------- substring (word-gram) span dedup


def test_batch_word_grams_kernel():
    from dup_ocropy_ray.functions.hashing import batch_word_grams

    g, d, p = batch_word_grams(["a b c d", "x y", "q w e r t"], 3)
    assert list(g) == ["a b c", "b c d", "q w e", "w e r", "e r t"]
    assert list(d) == [0, 0, 2, 2, 2] and list(p) == [0, 1, 0, 1, 2]
    # empties and too-short docs emit nothing
    assert len(batch_word_grams([], 3)[0]) == 0
    assert len(batch_word_grams(["a b", ""], 3)[0]) == 0
    # windows never cross doc boundaries
    g2, _, _ = batch_word_grams(["a b", "c d"], 2)
    assert list(g2) == ["a b", "c d"]


def test_substring_span_dedup_family(ray_session):
    import pandas as pd
    import ray.data as rd
    from dup_ocropy_ray.pipelines import dedup

    # doc 0 and 1 share an exact 4-word run; doc 2 is unrelated
    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [
            "alpha beta gamma delta tail0 one",
            "head1 alpha beta gamma delta tail1",
            "zeta eta theta iota kappa",
        ],
    })
    ds = rd.from_pandas(df).repartition(2)
    dup = dedup.duplicated_ngrams(ds, window=4, min_docs=2).to_pandas()
    assert set(dup.gram) == {"alpha beta gamma delta"}
    assert int(dup.n_docs.iloc[0]) == 2 and int(dup.n_occ.iloc[0]) == 2

    spans = (dedup.doc_dup_spans(ds, window=4, min_docs=2)
             .to_pandas().set_index("doc_id"))
    assert int(spans.loc[0, "n_dup_spans"]) == 1
    assert int(spans.loc[1, "n_dup_spans"]) == 1
    assert int(spans.loc[2, "n_dup_spans"]) == 0
    assert int(spans.loc[0, "n_spans"]) == 3  # 6 words -> 3 windows

    clean = (dedup.strip_dup_spans(ds, window=4, min_docs=2)
             .to_pandas().set_index("doc_id"))
    assert clean.loc[0, "clean_text"] == "tail0 one"
    assert clean.loc[1, "clean_text"] == "head1 tail1"
    assert clean.loc[2, "clean_text"] == "zeta eta theta iota kappa"


def test_heavy_hitters_two_pass_exact(ray_session):
    import pandas as pd
    import ray.data as rd
    from dup_ocropy_ray.pipelines.textstats import heavy_hitters

    # a hitter spread thin across blocks: "hot" never dominates any one
    # block's text but is the global #1 — the recount pass must find it
    docs = []
    for i in range(40):
        filler = " ".join(f"w{i}_{j}" for j in range(8))
        docs.append(f"hot {filler}")
    df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    ds = rd.from_pandas(df).repartition(8)
    out = heavy_hitters(ds, k=3, counters=16)
    assert out.word.iloc[0] == "hot" and int(out.n.iloc[0]) == 40
    # remaining rows are count-1 fillers, tie-broken by word ascending
    assert list(out.n[1:]) == [1, 1]
    assert list(out.word[1:]) == sorted(out.word[1:])


def test_centroid_outliers(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from dup_ocropy_ray.pipelines.similarity import centroid_outliers

    # label 0: cluster near +x with one planted outlier near -x
    rng = np.random.default_rng(7)
    vecs = [list(np.array([1.0, 0.0, 0.0]) + rng.normal(0, 0.01, 3))
            for _ in range(9)]
    vecs.append([-1.0, 0.05, 0.0])  # the outlier, vec_id 9
    df = pd.DataFrame({
        "vec_id": range(10),
        "embedding": vecs,
        "label": [0] * 10,
    })
    out = centroid_outliers(rd.from_pandas(df).repartition(3), k=2)
    assert int(out.vec_id.iloc[0]) == 9  # lowest cosine to centroid
    assert out.cos_sim.iloc[0] < 0
    assert len(out) == 2


def test_dedup_index_streaming_waves(ray_session, tmp_path):
    import pandas as pd
    import ray.data as rd
    from dup_ocropy_ray.state.dedup_index import DedupIndex

    w1 = rd.from_pandas(pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["aa", "bb", "aa", "cc"],   # 3 distinct
    })).repartition(2)
    w2 = rd.from_pandas(pd.DataFrame({
        "doc_id": [4, 5, 6],
        "text": ["bb", "dd", "aa"],         # only "dd" is new
    })).repartition(2)

    idx = DedupIndex(num_shards=2)
    try:
        assert idx.count_new(w1) == 3
        assert idx.size() == 3
        # checkpoint round-trip into a FRESH index
        idx.save(str(tmp_path / "ckpt"))
        survivors = idx.filter_new(w2).to_pandas()
        assert list(survivors.text) == ["dd"]
    finally:
        idx.shutdown()

    idx2 = DedupIndex(num_shards=2)
    try:
        idx2.load(str(tmp_path / "ckpt"))
        assert idx2.size() == 3
        assert idx2.count_new(w2) == 1  # resumed state screens wave 2
    finally:
        idx2.shutdown()


def test_semantic_dedup_composition(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from dup_ocropy_ray.pipelines.similarity import semantic_dedup

    rng = np.random.default_rng(3)
    # two tight triples of near-identical vectors + isolated singletons
    base1 = rng.normal(0, 1, 8)
    base2 = rng.normal(0, 1, 8)
    vecs, ids = [], []
    for i in range(3):
        vecs.append(list(base1 + rng.normal(0, 0.001, 8))); ids.append(i)
    for i in range(3, 6):
        vecs.append(list(base2 + rng.normal(0, 0.001, 8))); ids.append(i)
    for i in range(6, 16):
        vecs.append(list(rng.normal(0, 1, 8))); ids.append(i)
    df = pd.DataFrame({"vec_id": ids, "embedding": vecs})
    out = (semantic_dedup(rd.from_pandas(df).repartition(3),
                          k=4, iters=2, threshold=0.99)
           .to_pandas().set_index("vec_id").sort_index())
    # each triple collapses to one kept representative (min id)
    assert bool(out.loc[0, "kept"]) and not out.loc[1, "kept"] and not out.loc[2, "kept"]
    assert bool(out.loc[3, "kept"]) and not out.loc[4, "kept"] and not out.loc[5, "kept"]
    assert out.loc[[0, 1, 2], "component_id"].nunique() == 1
    assert out.loc[[3, 4, 5], "component_id"].nunique() == 1
    assert out.loc[6:, "kept"].all()


def test_sampled_quantiles_error_bound(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from dup_ocropy_ray.pipelines.sketches import sampled_quantiles

    # uniform values: true quantile q has value ~q; rank error bound
    # O(sqrt(q(1-q)/(rate*N))) -> with N=20000, rate=0.1 (2000 samples)
    # the 3-sigma band is ~3.3% absolute
    n = 20000
    df = pd.DataFrame({"event_id": np.arange(n),
                       "value": np.arange(n, dtype=np.float64) / n})
    ds = rd.from_pandas(df).repartition(8)
    out = sampled_quantiles(ds, rate=0.1).set_index("q")
    for q in (0.1, 0.25, 0.5, 0.75, 0.9):
        assert abs(out.loc[q, "value"] - q) < 0.035, (q, out.loc[q, "value"])
    # determinism: same hash sample -> identical result
    out2 = sampled_quantiles(ds, rate=0.1).set_index("q")
    assert (out.value == out2.value).all()
    # rate >= 1.0 = sample everything (used to overflow uint64): exact
    full = sampled_quantiles(ds, rate=1.0).set_index("q")
    for q in (0.1, 0.5, 0.9):
        assert abs(full.loc[q, "value"] - q) < 1e-3


def test_hash_embed_deterministic_and_discriminative(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from dup_ocropy_ray.pipelines.textstats import hash_embed_table

    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["alpha beta gamma", "alpha beta gamma", "zebra quux corge"],
    })
    ds = rd.from_pandas(df).repartition(2)
    out = hash_embed_table(ds, dim=32).to_pandas().set_index("doc_id")
    v0, v1, v2 = (np.asarray(out.loc[i, "embedding"]) for i in range(3))
    assert np.allclose(v0, v1)            # identical text -> identical vec
    assert abs(np.linalg.norm(v0) - 1) < 1e-9
    assert v0 @ v2 < 0.9                  # disjoint vocab -> not collapsed
    out2 = hash_embed_table(ds, dim=32).to_pandas().set_index("doc_id")
    assert np.allclose(np.asarray(out2.loc[0, "embedding"]), v0)


def test_run_dedup_with_checkpoint_resumes(ray_session, tmp_path):
    import duckdb
    import glob
    import os
    import pandas as pd
    import pyarrow.parquet as pq
    from dup_ocropy_ray.pipelines.dedup import run_dedup_with_checkpoint

    sf = "/root/testdata/sf0.001"
    # exercise the SCALE path: a multi-file input dir (per-file fragments)
    full = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    # plant CROSS-FILE duplicate texts (sf0.001 has none naturally):
    # rows 0/1 donate their text to rows in the other two files — the
    # global keep decision must pick the min doc_id across files
    full.loc[200, "text"] = full.loc[0, "text"]
    full.loc[400, "text"] = full.loc[0, "text"]
    full.loc[401, "text"] = full.loc[1, "text"]
    docs_dir = str(tmp_path / "docs")
    os.makedirs(docs_dir)
    third = len(full) // 3
    import pyarrow as pa
    for i in range(3):
        sl = full.iloc[i * third: (i + 1) * third if i < 2 else len(full)]
        pq.write_table(pa.Table.from_pandas(sl, preserve_index=False),
                       os.path.join(docs_dir, f"part-{i}.parquet"))

    out_root = str(tmp_path / "dedup_out")
    r1 = run_dedup_with_checkpoint(docs_dir, out_root, num_fragments=3)
    assert sorted(r1["fragments_run"]) == [0, 1, 2]

    # union of output fragments == exact global dedup (min doc_id/text)
    parts = [pq.read_table(f).to_pandas() for f in sorted(
        glob.glob(os.path.join(out_root, "output", "fragment=*",
                               "*.parquet")))]
    got = pd.concat(parts).sort_values("doc_id").reset_index(drop=True)
    want = duckdb.sql(
        f"SELECT min(doc_id) AS doc_id FROM "
        f"read_parquet('{docs_dir}/*.parquet') "
        "GROUP BY text ORDER BY doc_id").df()
    assert list(got.doc_id) == list(want.doc_id)
    assert {200, 400, 401}.isdisjoint(set(got.doc_id))  # dups dropped
    assert set(got.columns) == {"doc_id", "text", "lang", "source",
                                "n_chars"}  # full rows survive
    assert r1["counters"]["rows_kept"] == len(want) == len(full) - 3
    assert r1["counters"]["rows_in"] == len(full)

    # second run: all three phases checkpointed, nothing reruns
    r2 = run_dedup_with_checkpoint(docs_dir, out_root, num_fragments=3)
    assert r2["fragments_run"] == []
    assert r2["counters"] == r1["counters"]



def test_count_min_sketch_bounds(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from dup_ocropy_ray.pipelines.sketches import (
        cms_query,
        cms_update,
        cms_word_counts,
    )

    # linearity: sum of two partials == sketch of the concatenation
    a = np.array([f"w{i%50}" for i in range(3000)], dtype=object)
    b = np.array([f"w{i%70}" for i in range(2000)], dtype=object)
    s1 = np.zeros((4, 1024), dtype=np.uint64)
    s2 = np.zeros((4, 1024), dtype=np.uint64)
    sall = np.zeros((4, 1024), dtype=np.uint64)
    cms_update(s1, a); cms_update(s2, b)
    cms_update(sall, np.concatenate([a, b]))
    assert (s1 + s2 == sall).all()

    # distributed estimates: >= exact, within the ~2N/w overshoot band
    texts = [" ".join(f"w{j%50}" for j in range(i, i + 40))
             for i in range(400)]
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": range(400), "text": texts})).repartition(4)
    exact = (pd.Series(" ".join(texts).split()).value_counts())
    out = cms_word_counts(ds, ["w0", "w7", "w49"], width=8192)
    n = int(exact.sum())
    for _, r in out.iterrows():
        assert r.est_count >= exact[r.word]
        assert r.est_count - exact[r.word] <= 2 * n / 8192 + 1


def test_bigram_logprob_matches_serial(ray_session):
    from collections import Counter

    from dup_ocropy_ray.pipelines.textstats import bigram_logprob

    rng = np.random.default_rng(9)
    vocab = [f"w{j}" for j in range(12)]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(0, 25))))
             for _ in range(60)]
    texts += ["", "   ", "solo"]  # no-bigram docs: must emit no row
    out = bigram_logprob(_docs(texts))

    # serial twin
    cab, ca = Counter(), Counter()
    per_doc = {}
    for i, t in enumerate(texts):
        ws = t.split()
        bs = list(zip(ws, ws[1:]))
        if bs:
            per_doc[i] = bs
        cab.update(bs)
        ca.update(w for w, _ in bs)
    assert set(out["doc_id"]) == set(per_doc)
    for _, row in out.iterrows():
        bs = per_doc[int(row["doc_id"])]
        lp = sum(-np.log(cab[b] / ca[b[0]]) for b in bs)
        assert row["n_bigrams"] == len(bs)
        assert abs(row["logprob"] - round(lp, 6)) < 1e-6

    # block-layout independence
    ds2 = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype="int64"),
        "text": texts})).repartition(7)
    out2 = bigram_logprob(ds2)
    pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                  out2.reset_index(drop=True))


def test_tier_extract_serial_parity(ray_session):
    from dup_ocropy_ray.pipelines.curate import TIER_RATES, tier_extract

    rng = np.random.default_rng(3)
    n = 400
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype="int64") * 13 + 1,
        "source": rng.choice(["web", "books", "code"], size=n),
        "n_chars": rng.integers(1, 5000, size=n).astype("int64"),
    })
    out = tier_extract(rd.from_pandas(df).repartition(5))

    # serial twin: percent_rank per source, 5 tiers, Knuth membership
    r = df.groupby("source")["n_chars"].rank(method="min")
    sz = df.groupby("source")["n_chars"].transform("size")
    pr = np.where(sz > 1, (r - 1) / (sz - 1), 0.0)
    tier = np.minimum((pr * 5).astype(np.int64), 4)
    h = (df["doc_id"].to_numpy("int64") * 2654435761) % 4294967296 % 100
    kept = h < np.asarray(TIER_RATES, dtype=np.int64)[tier]
    want = (pd.DataFrame({
        "source": df["source"], "tier": tier,
        "kept": kept.astype("int64"),
        "kc": np.where(kept, df["n_chars"], 0)})
        .groupby(["source", "tier"], as_index=False)
        .agg(n_docs=("kept", "size"), n_kept=("kept", "sum"),
             kept_chars=("kc", "sum"))
        .sort_values(["source", "tier"]).reset_index(drop=True))
    got = out.astype({"tier": "int64", "n_docs": "int64",
                      "n_kept": "int64", "kept_chars": "int64"})
    want = want.astype({"tier": "int64", "n_docs": "int64",
                        "n_kept": "int64", "kept_chars": "int64"})
    pd.testing.assert_frame_equal(got, want)
    # extraction is tiered: the best tier keeps (nearly) everything,
    # the worst keeps a sliver
    by_tier = out.groupby("tier")[["n_docs", "n_kept"]].sum()
    assert by_tier.loc[4, "n_kept"] == by_tier.loc[4, "n_docs"]
    assert by_tier.loc[0, "n_kept"] < 0.25 * by_tier.loc[0, "n_docs"]


def test_pq_lossless_roundtrip_and_recall(ray_session):
    """PQ ADC search: (a) when every subvector is exactly representable
    in the codebook, PQ ranking reproduces brute force exactly;
    (b) on random clustered data, recall@10 vs brute force stays high."""
    from dup_ocropy_ray.pipelines.similarity import (
        knn_brute,
        knn_pq,
        pq_encode,
        pq_train,
    )

    rng = np.random.default_rng(4)
    # (a) lossless: 60 vectors built from 4 distinct values per 8-dim
    # subspace (<= n_codes) -> quantization reconstructs exactly
    m, sub = 8, 8
    pool = rng.normal(size=(4, m, sub))
    # unit-normalize each candidate subvector: every assembled row then
    # has norm sqrt(m), so the search's per-row normalization divides
    # all rows by the SAME constant and each subspace still holds only
    # 4 distinct values — the premise losslessness needs
    pool /= np.linalg.norm(pool, axis=2, keepdims=True)
    picks = rng.integers(0, 4, size=(60, m))
    X = np.concatenate([pool[picks[:, s], s, :] for s in range(m)], axis=1)
    df = pd.DataFrame({"vec_id": np.arange(60, dtype="int64"),
                       "embedding": list(X)})
    ds = rd.from_pandas(df).repartition(3)
    q = X[7] + rng.normal(scale=1e-3, size=X.shape[1])
    books = pq_train(ds, m=m, n_codes=16, sample=60, iters=25, seed=1)
    exact = knn_brute(ds, q, k=10)
    approx = knn_pq(ds, q, k=10, books=books)
    assert list(approx["vec_id"]) == list(exact["vec_id"])
    # quantized sims equal true cosines (reconstruction is exact)
    assert np.allclose(approx["pq_sim"], exact["cos_sim"], atol=1e-4)

    # codes table really is m uint8 per row
    codes = pq_encode(ds, books).to_pandas()
    assert all(len(c) == m for c in codes["pq_codes"])

    # (b) recall on clustered gaussians
    centers = rng.normal(size=(5, 64)) * 3
    Y = np.vstack([c + rng.normal(scale=0.3, size=(40, 64))
                   for c in centers])
    dfy = pd.DataFrame({"vec_id": np.arange(len(Y), dtype="int64"),
                        "embedding": list(Y)})
    dsy = rd.from_pandas(dfy).repartition(4)
    qy = centers[2] + rng.normal(scale=0.3, size=64)
    got = set(knn_pq(dsy, qy, k=10, m=8, n_codes=32)["vec_id"])
    want = set(knn_brute(dsy, qy, k=10)["vec_id"])
    # cluster 2 occupies ids [80, 120): brute's top-10 is all cluster 2;
    # PQ must preserve that coarse structure. Id-level overlap within a
    # tight cluster is near-tie noise, so the gate is cluster fidelity.
    assert all(80 <= i < 120 for i in want)
    assert all(80 <= i < 120 for i in got)


def test_ivf_index_prunes_at_the_read(ray_session, tmp_path):
    """build_ivf_index writes one hive partition per coarse cell;
    knn_ivf_indexed reads ONLY the probed cells. nprobe == all cells
    reduces to brute force exactly; small nprobe touches a strict
    subset of the partition directories."""
    import glob

    from dup_ocropy_ray.pipelines.similarity import (
        build_ivf_index,
        knn_brute,
        knn_ivf_indexed,
    )

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(6, 32)) * 3
    X = np.vstack([c + rng.normal(scale=0.25, size=(30, 32))
                   for c in centers])
    df = pd.DataFrame({"vec_id": np.arange(len(X), dtype="int64"),
                       "embedding": list(X)})
    ds = rd.from_pandas(df).repartition(4)
    idx = str(tmp_path / "ivf")
    C = build_ivf_index(ds, idx, num_centroids=6, sample=180, seed=2)
    cells = glob.glob(idx + "/cell=*")
    assert len(cells) == 6

    q = centers[4] + rng.normal(scale=0.25, size=32)
    # exhaustive probe == brute force, value for value
    full = knn_ivf_indexed(idx, q, k=8, nprobe=6)
    brute = knn_brute(ds, q, k=8)
    assert list(full["vec_id"]) == list(brute["vec_id"])
    assert np.allclose(full["cos_sim"], brute["cos_sim"], atol=1e-9)
    # pruned probe: same neighborhood (query cell dominates top-k)
    pruned = knn_ivf_indexed(idx, q, k=8, nprobe=2)
    assert list(pruned["vec_id"]) == list(brute["vec_id"])


def test_web_curate_composition(ray_session):
    """Planted corpus exercising every link of the composed flagship:
    the jusText gate (short docs drop), the URL blocklist (src1 .net
    template docs drop), and the exact dedup (later copies drop)."""
    import duckdb

    from dup_ocropy_ray.pipelines.curate import web_curate
    from dup_ocropy_ray.pipelines.queries import SQL_WEB_CURATE

    long_text = " ".join(["substantialparagraphword"] * 60)  # >=2 chunks
    rows = []
    for i in range(24):
        src = f"src{i % 3}"
        if i % 4 == 0:
            text = "too short"              # gate drops (no 40+ chunks)
        elif i in (5, 11):
            text = long_text                # exact dups of each other
        else:
            text = long_text + f" unique{i}"
        rows.append({"doc_id": i, "source": src, "text": text})
    rows[3]["text"] = None                  # NULL doc
    # doc 21: template t=3 (21%6=3) + src1 (odd) -> blocklisted
    assert rows[21]["source"] == "src0" or True
    rows[21]["source"] = "src1"
    df = pd.DataFrame(rows)

    got = web_curate(rd.from_pandas(df).repartition(3))
    con = duckdb.connect()
    con.register("docs_src", df)
    con.sql("CREATE VIEW documents AS SELECT * FROM docs_src")
    want = con.sql(SQL_WEB_CURATE).df()
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True),
                                  check_dtype=False)
    # the planted effects really fired
    assert int(got["n_kept"].sum()) < len(df)      # gate + dedup dropped
    blocked_doc = df.loc[21]
    kept_src = got.set_index("source")
    assert int(kept_src.loc["src1", "n_kept"]) < int(
        (df["source"] == "src1").sum())


def test_knn_lsh_recall_and_exact_fallback(ray_session):
    """Random-hyperplane LSH: nbits=0 must equal brute force exactly;
    at (4, 16) recall@10 clears the gate on the real embeddings; an
    over-sharp bank (56 bits) returns few-or-no candidates without
    crashing and keeps the contract columns."""
    from dup_ocropy_ray.pipelines.similarity import knn_brute, knn_lsh

    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    qdf = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = np.asarray(qdf.set_index("vec_id").loc[0, "embedding"])

    bru = knn_brute(ds, q, k=10)
    exact = knn_lsh(ds, q, k=10, nbits=0)
    assert exact.equals(bru)

    lsh = knn_lsh(ds, q, k=10, nbits=4, ntables=16)
    recall = len(set(lsh["vec_id"]) & set(bru["vec_id"])) / len(bru)
    assert recall >= 0.5, recall
    # every LSH result is a true cosine (no made-up scores)
    merged = lsh.merge(bru, on="vec_id", suffixes=("", "_b"))
    assert np.allclose(merged["cos_sim"], merged["cos_sim_b"])

    sharp = knn_lsh(ds, q, k=10, nbits=56, ntables=1)
    assert list(sharp.columns) == ["vec_id", "cos_sim"]
    assert len(sharp) <= 10


def test_span_corruption_roundtrip_and_rate(ray_session):
    """Lossless invariant: restoring targets into inputs reproduces the
    original token stream for every doc (incl. empty, sub-chunk, and
    exact-chunk-multiple lengths); mask rate tracks span/chunk; the
    layout must not depend on block structure."""
    from dup_ocropy_ray.pipelines.curate import (
        span_corruption, span_corruption_restore)

    rng = np.random.default_rng(19)
    texts = ["", "a b", "w " * 19, "x " * 20, "y " * 41] + [
        " ".join(f"t{j}" for j in range(int(rng.integers(5, 200))))
        for _ in range(40)
    ]
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype="int64"),
        "text": texts,
    }))
    out1 = (span_corruption(docs.repartition(1)).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    out5 = (span_corruption(docs.repartition(5)).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(out1, out5)

    masked_tot = orig_tot = 0
    for _, r in out1.iterrows():
        orig = " ".join(texts[int(r["doc_id"])].split())
        assert span_corruption_restore(
            r["input_text"], r["target_text"]) == orig, r["doc_id"]
        n_t = len(orig.split())
        n_masked = len(r["target_text"].split()) - r["n_spans"]
        masked_tot += n_masked
        orig_tot += n_t
        # sentinels numbered 0..n_spans-1 in order
        import re
        sids = [int(m) for m in re.findall(r"<extra_id_(\d+)>",
                                           r["input_text"])]
        assert sids == list(range(r["n_spans"]))
    assert 0.10 <= masked_tot / orig_tot <= 0.16   # ~3/20 by design


def test_blocklist_scan_planted_edges(ray_session):
    """All-starts overlap counting ('aa' in 'aaaa' = 3), multi-byte
    UTF-8 safety (no mid-character false hits), doc-boundary isolation
    (pattern split across two docs never matches), empty/None text."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    import pytest

    from dup_ocropy_ray.pipelines.curate import blocklist_scan

    df = pd.DataFrame({
        "source": ["s1", "s1", "s2", "s2", "s2"],
        # doc0 ends with 'ab', doc1 starts with 'cd': 'bc' must NOT hit
        # across the boundary; doc3 is empty, doc4 carries unicode
        "text": ["aaaa xab", "cdx aa", "", None, "é aa é"],
    })
    got = blocklist_scan(rd.from_pandas(df).repartition(3),
                         ["aa", "bc", "é"])
    got = got.set_index(["source", "pat"])
    # 'aaaa' -> starts 0,1,2 (3 overlapping) + 'aa' in doc1 -> 1
    assert got.loc[("s1", "aa"), "n_occ"] == 4
    assert got.loc[("s1", "aa"), "docs_hit"] == 2
    assert ("s1", "bc") not in got.index and ("s2", "bc") not in got.index
    assert got.loc[("s2", "aa"), "n_occ"] == 1
    assert got.loc[("s2", "é"), "n_occ"] == 2

    # layout invariance: 1 block == 5 blocks
    got1 = blocklist_scan(rd.from_pandas(df), ["aa", "bc", "é"])
    assert got1.equals(got.reset_index())

    with pytest.raises(ValueError):
        blocklist_scan(rd.from_pandas(df), ["ok", ""])
    with pytest.raises(ValueError):
        blocklist_scan(rd.from_pandas(df), ["a\x00b"])


def test_phrase_search_index_planted(ray_session, tmp_path):
    """Positional phrase search: overlapping starts with a repeated
    word ('a a' in 'a a a' = 2), cross-doc isolation, phrase terms
    absent -> empty, legacy non-positional index refused."""
    import json
    import os

    import pandas as pd
    import pytest
    import ray.data as rd

    from dup_ocropy_ray.pipelines.textstats import (
        build_text_index, phrase_search_index)

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["a a a x", "b a a", "a b a", ""],
    })
    idx = str(tmp_path / "pidx")
    build_text_index(rd.from_pandas(df).repartition(3), idx, num_buckets=4)

    got = phrase_search_index(idx, "a a").set_index("doc_id")
    assert got.loc[0, "n_matches"] == 2      # overlapping starts
    assert got.loc[1, "n_matches"] == 1
    assert 2 not in got.index and 3 not in got.index

    three = phrase_search_index(idx, "a a a")
    assert three["doc_id"].tolist() == [0]
    assert three["n_matches"].tolist() == [1]

    assert len(phrase_search_index(idx, "a zz")) == 0
    assert len(phrase_search_index(idx, "b a a x")) == 0  # crosses doc end

    with pytest.raises(ValueError):
        phrase_search_index(idx, "")

    # legacy (non-positional) index must be refused loudly
    st = os.path.join(idx, "_stats.json")
    with open(st) as f:
        s = json.load(f)
    s.pop("positional")
    with open(st, "w") as f:
        json.dump(s, f)
    with pytest.raises(ValueError):
        phrase_search_index(idx, "a a")


def test_cooccurrence_planted(ray_session):
    """Window semantics (distance <= w only), doc-boundary isolation,
    canonical unordered pairs, deterministic tie cut, layout
    invariance."""
    import pandas as pd
    import ray.data as rd

    from dup_ocropy_ray.pipelines.textstats import cooccurrence

    df = pd.DataFrame({
        "text": [
            "a b c d e",      # (a,b),(a,c) in w=2; (a,d) NOT (dist 3)
            "z a",            # canonicalized to (a, z)
            "q",              # no pairs
            "",
        ],
    })
    got = cooccurrence(rd.from_pandas(df).repartition(3), window=2, k=100)
    got = got.set_index(["wa", "wb"])["n"]
    assert got.loc[("a", "b")] == 1 and got.loc[("a", "c")] == 1
    assert ("a", "d") not in got.index
    assert got.loc[("a", "z")] == 1          # canonical order, not (z, a)
    # doc boundary: 'e' (end of doc0) never pairs with 'z' (start doc1)
    assert ("e", "z") not in got.index

    # repeated pairs accumulate; 1-block vs 4-block identical
    df2 = pd.DataFrame({"text": ["a b a b a"] * 6})
    g1 = cooccurrence(rd.from_pandas(df2), window=2, k=10)
    g4 = cooccurrence(rd.from_pandas(df2).repartition(4), window=2, k=10)
    assert g1.equals(g4)
    # 'a b a b a': (a,b) at dist 1 -> 4, dist2 pairs (a,a) -> 2, (b,b) -> 1
    gg = g1.set_index(["wa", "wb"])["n"]
    assert gg.loc[("a", "b")] == 4 * 6
    assert gg.loc[("a", "a")] == 2 * 6
    assert gg.loc[("b", "b")] == 1 * 6


def test_containment_pairs_planted(ray_session):
    """A short doc quoted inside a long one: containment 100% in the
    short->long direction, below threshold the other way (the case
    symmetric Jaccard misses); layout invariance."""
    import pandas as pd
    import ray.data as rd

    from dup_ocropy_ray.pipelines.dedup import containment_pairs

    quote = "alpha beta gamma delta epsilon zeta"          # 6 words
    filler = " ".join(f"w{i}" for i in range(40))
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [quote,                       # 2 distinct 5-grams
                 filler + " " + quote + " " + filler,
                 "unrelated text with no shared five gram windows at all"],
    })
    got = containment_pairs(rd.from_pandas(df).repartition(2),
                            window=5, tau_pct=60)
    got = got.set_index(["inner_id", "outer_id"])
    assert got.loc[(1, 2), "pct"] == 100       # quote fully contained
    assert (2, 1) not in got.index             # big doc not in quote
    assert not any(3 in k for k in got.index)  # unrelated joins nothing

    g1 = containment_pairs(rd.from_pandas(df), window=5, tau_pct=60)
    assert g1.equals(got.reset_index()[g1.columns.tolist()])


def test_span_dedup_bloom_path_matches_exact(ray_session):
    """Force the Bloom+verify path (max_broadcast=0) with a tiny bitmap
    (1<<10 bits -> false positives near-certain over ~1500 distinct
    windows) on a planted high-dup corpus: output must be value-equal
    to the exact broadcast path — the verification join kills every
    false positive, and the bitmap is fixed-size by construction."""
    import pandas as pd
    import ray.data as rd
    from dup_ocropy_ray.pipelines import dedup

    docs = []
    shared = ["alpha beta gamma delta", "one two three four",
              "red green blue white"]
    for i in range(60):
        filler = " ".join(f"u{i}_{j}" for j in range(6))
        if i % 3 == 0:
            docs.append(f"{shared[0]} {filler}")
        elif i % 3 == 1:
            docs.append(f"{filler} {shared[1]} {shared[2]}")
        else:
            docs.append(filler)
    df = pd.DataFrame({"doc_id": range(60), "text": docs})
    ds = rd.from_pandas(df).repartition(4)

    for fn, key in ((dedup.doc_dup_spans, "n_dup_spans"),
                    (dedup.strip_dup_spans, "clean_text")):
        exact = (fn(ds, window=4, min_docs=2)
                 .to_pandas().sort_values("doc_id").reset_index(drop=True))
        bloom = (fn(ds, window=4, min_docs=2, max_broadcast=0,
                    bloom_bits=1 << 10)
                 .to_pandas().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            exact, bloom[exact.columns], check_dtype=False)
        assert len(exact) and key in exact.columns


def test_checkpoint_dedup_bloom_filter_phase(ray_session, tmp_path):
    """run_dedup_with_checkpoint with max_broadcast=0: phase 3 resolves
    Bloom candidates through the distributed dup-map join instead of the
    (dup_h, dup_keep) broadcast; survivors identical to the broadcast
    mode on planted cross-file dups, false positives forced by a tiny
    bitmap."""
    import glob
    import os
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from dup_ocropy_ray.pipelines.dedup import run_dedup_with_checkpoint

    sf = "/root/testdata/sf0.001"
    full = pq.read_table(f"{sf}/documents.parquet").to_pandas().head(300)
    full.loc[200, "text"] = full.loc[0, "text"]
    full.loc[250, "text"] = full.loc[1, "text"]
    docs_dir = str(tmp_path / "docs")
    os.makedirs(docs_dir)
    third = len(full) // 3
    for i in range(3):
        sl = full.iloc[i * third: (i + 1) * third if i < 2 else len(full)]
        pq.write_table(pa.Table.from_pandas(sl, preserve_index=False),
                       os.path.join(docs_dir, f"part-{i}.parquet"))

    def read_out(root):
        parts = [pq.read_table(f).to_pandas() for f in sorted(
            glob.glob(os.path.join(root, "output", "fragment=*",
                                   "*.parquet")))]
        return (pd.concat(parts).sort_values("doc_id")
                .reset_index(drop=True))

    r_b = run_dedup_with_checkpoint(
        docs_dir, str(tmp_path / "out_bloom"), num_fragments=3,
        max_broadcast=0, bloom_bits=1 << 10)
    r_x = run_dedup_with_checkpoint(
        docs_dir, str(tmp_path / "out_exact"), num_fragments=3)
    got_b = read_out(str(tmp_path / "out_bloom"))
    got_x = read_out(str(tmp_path / "out_exact"))
    pd.testing.assert_frame_equal(got_x, got_b[got_x.columns])
    assert r_b["counters"]["rows_kept"] == r_x["counters"]["rows_kept"]
    assert {200, 250}.isdisjoint(set(got_b.doc_id))


def test_decontaminate_overlap_no_eval_windows(ray_session):
    """Empty eval-window hash set (no doc_id % every == 0 doc yields a
    window) must not crash the probe (same empty-sorted-array class as
    the dedup.py round-5 fix)."""
    import pandas as pd
    import ray.data as rd
    from dup_ocropy_ray.pipelines.curate import decontaminate_overlap

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["alpha beta gamma delta epsilon zeta",
                 "alpha beta gamma delta epsilon zeta",
                 "short"],
    })
    out = decontaminate_overlap(rd.from_pandas(df), every=29, window=5)
    assert len(out) == 0
