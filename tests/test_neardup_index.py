"""Streaming near-dup index: planted near-duplicates across waves and
within a batch, snapshot/restore, and parameter guards."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


BASE = ("the quick brown fox jumps over the lazy dog while the "
        "band plays a long and winding tune about distributed "
        "systems and their many failure modes in production")
NEAR = BASE.replace("lazy", "sleepy")          # one-token edit: near-dup
OTHER = ("completely different content about cooking recipes and "
         "gardening tips for the late summer season with tomatoes "
         "peppers and herbs growing in raised beds by the fence")


def _ds(texts):
    return rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64),
         "text": texts}))


def test_neardup_filter_across_and_within_waves(ray_session):
    from dup_ocropy_ray.state.neardup_index import NearDupIndex

    idx = NearDupIndex(num_bands=16, num_perm=64)
    # wave 1: base + other admit; in-batch near-dup of base is dropped
    kept = idx.filter_new(_ds([BASE, NEAR, OTHER])).to_pandas()
    assert sorted(kept["doc_id"]) == [0, 2]
    # wave 2: near-dup of an ADMITTED doc is rejected; fresh text admits
    kept2 = idx.filter_new(_ds([NEAR, OTHER + " extended with more",
                                "tiny"])).to_pandas()
    assert 0 not in list(kept2["doc_id"])  # NEAR collides with BASE
    assert idx.size() > 0


def test_neardup_snapshot_restore_roundtrip(ray_session, tmp_path):
    from dup_ocropy_ray.state.neardup_index import NearDupIndex

    idx = NearDupIndex(num_bands=8, num_perm=32)
    assert idx.count_new(_ds([BASE, OTHER])) == 2
    snap = idx.save(str(tmp_path))
    idx2 = NearDupIndex(num_bands=8, num_perm=32)
    idx2.restore(snap)
    assert idx2.size() == idx.size()
    # restored index still rejects near-dups of pre-snapshot docs
    assert idx2.count_new(_ds([NEAR])) == 0
    # mismatched parameters refuse the snapshot
    with pytest.raises(ValueError, match="bands/perm/k"):
        NearDupIndex(num_bands=16, num_perm=64).restore(snap)


def test_neardup_distinct_texts_all_admit(ray_session):
    from dup_ocropy_ray.state.neardup_index import NearDupIndex

    idx = NearDupIndex(num_bands=8, num_perm=32)
    texts = [f"document number {i} " + " ".join(
        f"w{i}x{j}" for j in range(30)) for i in range(20)]
    assert idx.count_new(_ds(texts)) == 20


def test_neardup_wave_mode_is_layout_independent(ray_session):
    """filter_new_wave admissions depend only on wave CONTENT: the same
    wave split into 1 block or 8 blocks (near-dup pair forced into
    separate concurrent batches) admits the identical id set, and the
    min-id cluster representative always wins."""
    from dup_ocropy_ray.state.neardup_index import NearDupIndex

    texts = [BASE, NEAR, OTHER] + [
        f"unique filler document {i} " + " ".join(
            f"tok{i}q{j}" for j in range(25)) for i in range(13)]
    admitted_sets = []
    for blocks in (1, 8, 16):
        idx = NearDupIndex(num_bands=16, num_perm=64)
        wave = _ds(texts).repartition(blocks)
        kept = idx.filter_new_wave(wave).to_pandas()
        admitted_sets.append(frozenset(kept["doc_id"].tolist()))
    assert admitted_sets[0] == admitted_sets[1] == admitted_sets[2]
    # min-id representative: BASE (0) admits, its near-dup NEAR (1) drops
    assert 0 in admitted_sets[0] and 1 not in admitted_sets[0]
    assert 2 in admitted_sets[0]


def test_neardup_wave_then_stream_rejects_admitted(ray_session):
    """Wave admissions register: a later wave's near-dups of wave-1
    winners are rejected by the index probe, and full rows (not just
    ids) come back from the semi join."""
    from dup_ocropy_ray.state.neardup_index import NearDupIndex

    idx = NearDupIndex(num_bands=16, num_perm=64)
    kept1 = idx.filter_new_wave(_ds([BASE, OTHER])).to_pandas()
    assert sorted(kept1.columns) == ["doc_id", "text"]
    assert sorted(kept1["doc_id"]) == [0, 1]
    kept2 = idx.filter_new_wave(_ds([NEAR, "fresh short text entirely "
                                     "new words appear here today"]))
    assert kept2.to_pandas()["doc_id"].tolist() == [1]
