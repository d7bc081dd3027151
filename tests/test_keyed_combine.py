"""relational.keyed_combine — the shared Dataset-returning keyed
combine every BSP/graph/count site now rides: property-checked against
plain pandas groupby over random frames, layouts, and ops."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

import ray.data as rd


@st.composite
def frames(draw):
    n = draw(st.integers(1, 200))
    keys = draw(st.lists(st.integers(-5, 5), min_size=n, max_size=n))
    v1 = draw(st.lists(st.integers(-10**9, 10**9), min_size=n, max_size=n))
    v2 = draw(st.lists(st.integers(-100, 100), min_size=n, max_size=n))
    blocks = draw(st.integers(1, 6))
    op = draw(st.sampled_from(["sum", "min", "max"]))
    return (pd.DataFrame({"k": np.array(keys, np.int64),
                          "a": np.array(v1, np.int64),
                          "b": np.array(v2, np.int64)}), blocks, op)


@settings(max_examples=10, deadline=None)
@given(frames())
def test_keyed_combine_matches_pandas(ray_session, fb):
    from dup_ocropy_ray.pipelines.relational import keyed_combine

    df, blocks, op = fb
    got = (keyed_combine(rd.from_pandas(df).repartition(blocks),
                         "k", ["a", "b"], op, num_partitions=4)
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = (getattr(df.groupby("k", as_index=False)[["a", "b"]], op)()
            .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"), check_dtype=False)


def test_keyed_combine_composite_key(ray_session):
    from dup_ocropy_ray.pipelines.relational import keyed_combine

    df = pd.DataFrame({
        "k1": np.array([1, 1, 2, 2, 1], np.int64),
        "k2": np.array([0, 0, 0, 1, 1], np.int64),
        "v": np.array([10, 20, 30, 40, 50], np.int64),
    })
    got = (keyed_combine(rd.from_pandas(df).repartition(3),
                         ["k1", "k2"], ["v"], "sum", num_partitions=2)
           .to_pandas().sort_values(["k1", "k2"]).reset_index(drop=True))
    want = (df.groupby(["k1", "k2"], as_index=False)["v"].sum()
            .sort_values(["k1", "k2"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  want.astype("int64"), check_dtype=False)


# ------------------------------------------------ bloom_semi_filter


def test_bloom_semi_filter_no_false_negatives(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dup_ocropy_ray.pipelines.relational import bloom_semi_filter

    rng = np.random.RandomState(11)
    left = pd.DataFrame({"k": rng.randint(0, 10_000, 5000).astype("int64"),
                         "v": np.arange(5000, dtype="int64")})
    right = pd.DataFrame({"rk": rng.choice(10_000, 200,
                                           replace=False).astype("int64")})
    out = bloom_semi_filter(rd.from_pandas(left), rd.from_pandas(right),
                            "k", "rk").to_pandas()
    rset = set(right.rk.tolist())
    true_hits = left[left.k.isin(rset)]
    # every true match survives (no false negatives)
    assert set(true_hits.v) <= set(out.v)
    # and the reduction actually reduced (tiny false-positive rate at
    # 2^20 bits / 200 keys)
    assert len(out) < len(left) * 0.2
    assert len(out) >= len(true_hits)


def test_bloom_semi_filter_rejects_non_pow2(ray_session):
    import pandas as pd
    import pytest
    import ray.data as rd

    from dup_ocropy_ray.pipelines.relational import bloom_semi_filter

    df = rd.from_pandas(pd.DataFrame({"k": pd.Series([1], dtype="int64")}))
    with pytest.raises(ValueError, match="power of 2"):
        bloom_semi_filter(df, df, "k", "k", num_bits=1000)
