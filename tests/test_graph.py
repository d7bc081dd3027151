"""Link-graph analytics (pipelines/graph.py): integer-exact PageRank,
degree distribution, triangle counting — invariants checked against
closed forms and a brute-force reference on the deterministic graph."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _n_docs():
    import pyarrow.parquet as pq

    return pq.read_metadata(f"{SF}/documents.parquet").num_rows


def test_out_links_deterministic_and_in_range():
    from dup_ocropy_ray.pipelines.graph import out_links

    src = np.arange(1000, dtype=np.int64)
    a = out_links(src, 1000, 4)
    b = out_links(src, 1000, 4)
    assert a.shape == (1000, 4)
    assert np.array_equal(a, b)
    assert a.min() >= 0 and a.max() < 1000


def test_pagerank_mass_conservation(ray_session):
    """Closed form for the total scaled rank: every node has out-degree
    exactly k, so S_{t+1} = N * inj_t + 17 * k * S_t with S_0 = N —
    a whole-pipeline invariant independent of the graph's wiring."""
    from dup_ocropy_ray.pipelines import queries as q
    from dup_ocropy_ray.pipelines.graph import pagerank

    k, iters = 4, 5
    nodes = q._read(SF, "documents", ["doc_id"])
    n = nodes.count()
    ranks = pagerank(nodes, n, k=k, iters=iters).to_pandas()
    assert len(ranks) == n
    s = n
    for t in range(iters):
        s = n * (3 * 20**t * k ** (t + 1)) + 17 * k * s
    assert int(ranks["r"].sum()) == s


def test_pagerank_matches_numpy_power_iteration(ray_session):
    from dup_ocropy_ray.pipelines import queries as q
    from dup_ocropy_ray.pipelines.graph import out_links, pagerank

    k, iters = 4, 3
    nodes = q._read(SF, "documents", ["doc_id"])
    n = nodes.count()
    ranks = (pagerank(nodes, n, k=k, iters=iters).to_pandas()
             .sort_values("id").reset_index(drop=True))

    r = np.ones(n, dtype=np.int64)
    dst = out_links(np.arange(n, dtype=np.int64), n, k)
    for t in range(iters):
        nxt = np.full(n, 3 * 20**t * k ** (t + 1), dtype=np.int64)
        np.add.at(nxt, dst.ravel(), np.repeat(17 * r, k))
        r = nxt
    assert np.array_equal(ranks["r"].to_numpy(), r)
    assert np.array_equal(ranks["id"].to_numpy(), np.arange(n))


def test_indegree_hist_totals(ray_session):
    from dup_ocropy_ray.pipelines.graph import indegree_hist

    k = 4
    n = _n_docs()
    h = indegree_hist(SF, k=k)
    assert int(h["n_nodes"].sum()) == n
    assert int((h["indeg"] * h["n_nodes"]).sum()) == n * k


def test_triangle_count_matches_bruteforce(ray_session):
    from dup_ocropy_ray.pipelines.graph import out_links, triangle_count

    k = 4
    n = _n_docs()
    got = int(triangle_count(SF, k=k)["n_triangles"].iloc[0])

    dst = out_links(np.arange(n, dtype=np.int64), n, k)
    pairs = set()
    for s in range(n):
        for d in dst[s]:
            if s != d:
                pairs.add((min(s, int(d)), max(s, int(d))))
    adj = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
    want = 0
    for u, vs in adj.items():
        vs = sorted(vs)
        for i, v in enumerate(vs):
            want += len(adj.get(v, set()) & set(vs[i + 1:]))
    assert got == want


def test_events_pivot_totals(ray_session):
    import pyarrow.parquet as pq

    from dup_ocropy_ray.pipelines.queries import q_events_pivot

    out = q_events_pivot(SF)
    ncols = [c for c in out.columns if c.startswith("n_")]
    total = int(out[ncols].to_numpy().sum())
    assert total == pq.read_metadata(f"{SF}/events.parquet").num_rows
    assert out["hour"].is_monotonic_increasing


def test_price_histogram_totals(ray_session):
    import pyarrow.parquet as pq

    from dup_ocropy_ray.pipelines.queries import q_price_histogram

    out = q_price_histogram(SF)
    assert int(out["n"].sum()) == pq.read_metadata(
        f"{SF}/lineitem.parquet").num_rows
    assert out["bin"].is_monotonic_increasing
    assert (out["bin"] >= 0).all()


def test_bfs_levels_matches_numpy(ray_session):
    from dup_ocropy_ray.pipelines.graph import (_BFS_INF, bfs_levels,
                                                out_links)

    k, rounds, seed_mod = 4, 4, 97
    n = _n_docs()
    got = bfs_levels(SF, k=k, rounds=rounds, seed_mod=seed_mod)

    dst = out_links(np.arange(n, dtype=np.int64), n, k)
    d = np.where(np.arange(n) % seed_mod == 0, 0, _BFS_INF).astype(np.int64)
    for _ in range(rounds):
        nxt = d.copy()
        np.minimum.at(nxt, dst.ravel(), np.repeat(d + 1, k))
        d = nxt
    d = np.where(d >= _BFS_INF, -1, d)
    want = (pd.Series(d).value_counts().sort_index()
            .rename_axis("dist").reset_index(name="n_nodes"))
    assert got["dist"].tolist() == want["dist"].tolist()
    assert got["n_nodes"].tolist() == want["n_nodes"].tolist()
    # seeds stay at distance 0 and something beyond the seeds is reached
    assert 0 in got["dist"].tolist()
    assert (got["dist"] > 0).any()


def test_hybrid_search_fusion_semantics(ray_session):
    """A doc ranked #1 in both legs must outscore a doc present in only
    one leg, and the integer RRF contributions match the closed form."""
    from dup_ocropy_ray.pipelines.queries import q_hybrid_search

    out = q_hybrid_search(SF)
    assert list(out.columns) == ["doc_id", "rrf_score"]
    assert len(out) == 10
    assert out["rrf_score"].is_monotonic_decreasing
    # max possible = both-legs rank 1; min possible = single leg rank 100
    both_r1 = 2 * (10**9 // 61)
    assert out["rrf_score"].iloc[0] <= both_r1
    assert out["rrf_score"].iloc[-1] >= 10**9 // 160


def test_harmonic_centrality_matches_numpy(ray_session):
    """Per-seed BFS replay in numpy -> floor-reciprocal sums -> same
    deterministic top-20 cut as the distributed wide-state BFS."""
    from dup_ocropy_ray.pipelines.graph import (_BFS_INF, _HC_SCALE,
                                                harmonic_centrality,
                                                out_links)

    k, rounds, n_seeds, seed_mod, topn = 4, 4, 4, 97, 20
    n = _n_docs()
    got = harmonic_centrality(SF, k=k, rounds=rounds, n_seeds=n_seeds,
                              seed_mod=seed_mod, topn=topn)

    dst = out_links(np.arange(n, dtype=np.int64), n, k)
    h = np.zeros(n, np.int64)
    for s in range(0, n_seeds * seed_mod, seed_mod):
        if s >= n:
            continue
        d = np.where(np.arange(n) == s, 0, _BFS_INF).astype(np.int64)
        for _ in range(rounds):
            nxt = d.copy()
            np.minimum.at(nxt, dst.ravel(), np.repeat(d + 1, k))
            d = nxt
        ok = (d > 0) & (d < _BFS_INF)
        h[ok] += _HC_SCALE // d[ok]
    want = (pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                          "harmonic": h})
            .sort_values(["harmonic", "doc_id"],
                         ascending=[False, True]).head(topn)
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["harmonic"] > 0).all()
