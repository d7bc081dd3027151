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
