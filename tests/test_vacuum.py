"""VACUUM orphan-file GC (relational.vacuum_dir): dry-run vs apply,
retention window, and the referenced-set safety invariant."""

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dup_ocropy_ray.pipelines.relational import vacuum_dir


@pytest.fixture()
def table_dir(tmp_path):
    d = tmp_path / "tbl"
    d.mkdir()
    for name in ["part-0.parquet", "part-1.parquet",
                 "stale-old.parquet", "stale-new.parquet"]:
        pq.write_table(pa.table({"x": pa.array([1])}), d / name)
    old = time.time() - 30 * 86400
    os.utime(d / "stale-old.parquet", (old, old))
    return str(d), [str(d / "part-0.parquet"), str(d / "part-1.parquet")]


def test_vacuum_dry_run_deletes_nothing(table_dir):
    d, ref = table_dir
    rep = vacuum_dir(d, ref, grace_sec=7 * 86400, apply=False)
    by = rep.set_index("file")["status"]
    assert by["part-0.parquet"] == "referenced"
    assert by["stale-old.parquet"] == "orphan_eligible"
    assert by["stale-new.parquet"] == "orphan_kept_young"
    assert os.path.exists(os.path.join(d, "stale-old.parquet"))


def test_vacuum_apply_removes_only_old_orphans(table_dir):
    d, ref = table_dir
    rep = vacuum_dir(d, ref, grace_sec=7 * 86400, apply=True)
    by = rep.set_index("file")["status"]
    assert by["stale-old.parquet"] == "orphan_removed"
    assert not os.path.exists(os.path.join(d, "stale-old.parquet"))
    # referenced and young files survive
    assert os.path.exists(os.path.join(d, "part-0.parquet"))
    assert os.path.exists(os.path.join(d, "stale-new.parquet"))
    # idempotent second pass: nothing left to remove
    rep2 = vacuum_dir(d, ref, grace_sec=7 * 86400, apply=True)
    assert (rep2["status"] != "orphan_removed").all()


def test_vacuum_zero_grace_sweeps_all_orphans(table_dir):
    d, ref = table_dir
    rep = vacuum_dir(d, ref, grace_sec=0.0, apply=True)
    by = rep.set_index("file")["status"]
    assert by["stale-new.parquet"] == "orphan_removed"
    assert set(os.listdir(d)) == {"part-0.parquet", "part-1.parquet"}
