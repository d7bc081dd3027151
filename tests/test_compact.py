"""Small-file compaction (relational.compact_parquet): plan
properties, lossless rewrite, per-group resume, and the stale-plan
guard."""

import glob
import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dup_ocropy_ray.pipelines.relational import (
    compact_parquet,
    compaction_plan,
)


def test_compaction_plan_properties():
    files = [(f"f{i:02d}", sz) for i, sz in enumerate(
        [700, 300, 300, 250, 200, 120, 90, 60, 40, 10])]
    groups = compaction_plan(files, target_bytes=512)
    flat = [p for g in groups for p in g]
    assert sorted(flat) == sorted(p for p, _ in files)  # exact cover
    sizes = dict(files)
    for g in groups:
        if len(g) > 1:
            assert sum(sizes[p] for p in g) <= 512
    # oversized file gets its own bin
    assert ["f00"] in groups
    # deterministic
    assert groups == compaction_plan(list(reversed(files)), 512)


@pytest.fixture()
def frag_dir(tmp_path):
    rng = np.random.RandomState(0)
    src = tmp_path / "frags"
    src.mkdir()
    start = 0
    for i, n in enumerate([50, 30, 80, 10, 40, 25, 60, 5]):
        t = pa.table({
            "k": pa.array(np.arange(start, start + n, dtype=np.int64)),
            "v": pa.array(rng.rand(n))})
        pq.write_table(t, src / f"shard-{i}.parquet")
        start += n
    return str(src), start


def test_compact_lossless_and_fewer_files(frag_dir, tmp_path, ray_session):
    src, total = frag_dir
    out = str(tmp_path / "out")
    m = compact_parquet(src, out, target_bytes=1 << 14)
    assert m["rows"] == total
    assert m["n_files_after"] < m["n_files_before"] == 8
    back = pq.read_table(
        sorted(glob.glob(os.path.join(out, "part-*.parquet")))).to_pandas()
    assert sorted(back["k"].tolist()) == list(range(total))
    # second call is a manifest cache hit
    assert compact_parquet(src, out, target_bytes=1 << 14) == m


def test_compact_resume_skips_finished_groups(frag_dir, tmp_path,
                                              ray_session):
    src, total = frag_dir
    out1 = str(tmp_path / "full")
    m = compact_parquet(src, out1, target_bytes=1 << 12)
    assert m["n_files_after"] >= 2
    # simulate a killed run: plan + first group only
    out2 = str(tmp_path / "partial")
    os.makedirs(out2)
    shutil.copy(os.path.join(out1, "_plan.json"),
                os.path.join(out2, "_plan.json"))
    shutil.copy(os.path.join(out1, "part-00000.parquet"),
                os.path.join(out2, "part-00000.parquet"))
    before = os.stat(os.path.join(out2, "part-00000.parquet")).st_mtime_ns
    m2 = compact_parquet(src, out2, target_bytes=1 << 12)
    assert m2["rows"] == total
    # the pre-existing group was NOT rewritten
    after = os.stat(os.path.join(out2, "part-00000.parquet")).st_mtime_ns
    assert before == after
    back = pq.read_table(
        sorted(glob.glob(os.path.join(out2, "part-*.parquet")))).to_pandas()
    assert sorted(back["k"].tolist()) == list(range(total))


def test_compact_refuses_stale_plan(frag_dir, tmp_path, ray_session):
    src, _ = frag_dir
    out = str(tmp_path / "out")
    os.makedirs(out)
    with open(os.path.join(out, "_plan.json"), "w") as f:
        json.dump({"plan_key": "deadbeef"}, f)
    with pytest.raises(RuntimeError, match="different input set"):
        compact_parquet(src, out, target_bytes=1 << 14)


def test_compact_schema_mismatch_raises(tmp_path, ray_session):
    src = tmp_path / "mix"
    src.mkdir()
    pq.write_table(pa.table({"k": pa.array([1], pa.int64())}),
                   src / "a.parquet")
    pq.write_table(pa.table({"k": pa.array(["x"])}), src / "b.parquet")
    with pytest.raises(Exception, match="schema mismatch"):
        compact_parquet(str(src), str(tmp_path / "out"),
                        target_bytes=1 << 20)


# --------------------------------------------------- purge_rows


def test_purge_rows_resume_and_guard(ray_session, tmp_path):
    import json
    import os

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from dup_ocropy_ray.pipelines.relational import purge_rows

    src = tmp_path / "in"
    src.mkdir()
    for i in range(3):
        pq.write_table(pa.table({
            "user_id": pa.array(np.arange(i * 100, i * 100 + 100,
                                          dtype=np.int64)),
            "v": pa.array(np.arange(100, dtype=np.int64))}),
            str(src / f"f{i}.parquet"))
    out = tmp_path / "out"
    man = purge_rows(str(src), str(out), "user_id", [5, 150, 299, 999])
    assert man["rows_removed"] == 3  # 999 not present
    assert man["rows_in"] == 300
    # every output file exists and holds no purged key
    kept = pq.read_table(str(out / "part-00000.parquet"))
    assert 5 not in kept.column("user_id").to_pylist()
    # resume: delete one output, rerun -> same manifest totals
    os.remove(str(out / "_purge.json"))
    os.remove(str(out / "part-00001.parquet"))
    man2 = purge_rows(str(src), str(out), "user_id", [5, 150, 299, 999])
    assert man2["rows_removed"] == 3
    # guard: a different key set refuses the directory
    os.remove(str(out / "_purge.json"))
    with pytest.raises(RuntimeError, match="different input or key"):
        purge_rows(str(src), str(out), "user_id", [1])
    # idempotent: manifest present -> returned as-is
    man3 = purge_rows(str(src), str(out), "user_id", [5, 150, 299, 999])

    def strip(m):
        return {**m, "files": [{k: v for k, v in f.items()
                                if k != "wall_sec"} for f in m["files"]]}

    assert json.dumps(strip(man3), sort_keys=True) == json.dumps(
        strip(man2), sort_keys=True)
