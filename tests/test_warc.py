"""WARC codec + shard corpus tests: record round-trip, member-per-record
ranged access (the CDX property), deterministic bytes, and the
documents -> shards -> extract round-trip through Ray."""

import gzip

import pandas as pd
import pytest

from dup_ocropy_ray.functions import warcx


RECS = [
    ("https://example.org/doc/0", b"<html><body>zero</body></html>"),
    ("https://example.org/doc/1", "p\xe5ge one — unicode".encode()),
    ("https://example.org/doc/2", b""),  # empty payload is legal
    ("https://example.org/doc/3", b"x" * 70000),  # bigger than one gzip window
]


def test_record_roundtrip_plain():
    blob = b"".join(warcx.build_record(u, p) for u, p in RECS)
    out = list(warcx.iter_warc(blob))
    assert [r["payload"] for r in out] == [p for _, p in RECS]
    assert [r["headers"]["warc-target-uri"] for r in out] == [u for u, _ in RECS]
    assert all(r["headers"]["warc-type"] == "response" for r in out)


def test_gz_members_and_ranged_fetch():
    blob, index = warcx.write_warc_gz(RECS)
    # full scan
    scanned = list(warcx.iter_warc_gz(blob))
    assert [(o, l) for o, l, _ in scanned] == [
        (e["offset"], e["length"]) for e in index]
    # members tile the file exactly
    assert index[0]["offset"] == 0
    assert sum(e["length"] for e in index) == len(blob)
    # ranged fetch of each record equals the scan (no other bytes touched)
    for e, (_, _, rec) in zip(index, scanned):
        got = warcx.read_record_at(blob, e["offset"], e["length"])
        assert got["payload"] == rec["payload"]
        assert got["headers"]["warc-target-uri"] == e["uri"]


def test_deterministic_bytes():
    b1, _ = warcx.write_warc_gz(RECS)
    b2, _ = warcx.write_warc_gz(RECS)
    assert b1 == b2


def test_malformed_raises():
    with pytest.raises(ValueError):
        list(warcx.iter_warc(b"HTTP/1.1 200 OK\r\n\r\n"))
    good = warcx.build_record("u:1", b"abc")
    with pytest.raises(ValueError):
        list(warcx.iter_warc(good[:-4]))  # trailing CRLFCRLF chopped
    blob, _ = warcx.write_warc_gz(RECS[:1])
    with pytest.raises(ValueError):
        list(warcx.iter_warc_gz(blob[:-3]))  # truncated member


def test_content_length_binary_safe():
    # payload containing the record terminator must survive (length-framed,
    # not delimiter-framed)
    tricky = b"a\r\n\r\nb" + gzip.compress(b"inner")
    rec = warcx.build_record("u:t", tricky)
    (out,) = list(warcx.iter_warc(rec))
    assert out["payload"] == tricky


def test_corpus_build_read_extract(ray_session, tmp_path):
    from dup_ocropy_ray.sources.warcgen import (
        build_warc_corpus, read_warc, uri_doc_id)

    sf_dir = "/root/testdata/sf0.001"
    man = build_warc_corpus(sf_dir, num_shards=4, root=str(tmp_path))
    assert len(man["shards"]) <= 4
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    assert man["n_records"] == len(docs)

    rows = read_warc(man["shards"]).to_pandas()
    assert len(rows) == len(docs)
    ids = sorted(uri_doc_id(u) for u in rows["uri"])
    assert ids == sorted(docs["doc_id"].tolist())
    # shard routing: every record's file index == doc_id % num_shards
    for p, u in zip(rows["path"], rows["uri"]):
        shard = int(p.split("shard-")[1][:5])
        assert shard == uri_doc_id(u) % 4

    # build is cached: second call returns the same manifest without work
    again = build_warc_corpus(sf_dir, num_shards=4, root=str(tmp_path))
    assert again == man

    # ranged CDX fetch against one shard
    import pyarrow.parquet as pq

    cdx = pq.read_table(man["shards"][0] + ".cdx.parquet").to_pandas()
    with open(man["shards"][0], "rb") as f:
        blob = f.read()
    e = cdx.iloc[len(cdx) // 2]
    rec = warcx.read_record_at(blob, int(e["offset"]), int(e["length"]))
    assert rec["headers"]["warc-target-uri"] == e["uri"]
    assert rec["payload"].decode().startswith("<!DOCTYPE html>")


def test_warc_checkpoint_resume_and_mode_guard(ray_session, tmp_path):
    import json
    import os

    from dup_ocropy_ray.sources.warcgen import (
        build_warc_corpus, run_warc_extract_with_checkpoint)

    man = build_warc_corpus("/root/testdata/sf0.001", num_shards=4,
                            root=str(tmp_path))
    out_root = str(tmp_path / "ckpt")
    r1 = run_warc_extract_with_checkpoint(man["shards"], out_root,
                                          num_fragments=2)
    assert r1["fragments_run"] == [0, 1]
    assert r1["counters"]["records"] == man["n_records"]
    assert r1["counters"]["chars_extracted"] > 0
    # completed job: rerun is a no-op
    r2 = run_warc_extract_with_checkpoint(man["shards"], out_root,
                                          num_fragments=2)
    assert r2["fragments_run"] == []
    assert r2["counters"] == r1["counters"]
    # kill one fragment's manifest: only THAT fragment reruns
    os.remove(os.path.join(out_root, "_manifest", "00001.json"))
    r3 = run_warc_extract_with_checkpoint(man["shards"], out_root,
                                          num_fragments=2)
    assert r3["fragments_run"] == [1]
    assert r3["counters"] == r1["counters"]
    # per-fragment metrics recorded
    with open(os.path.join(out_root, "_manifest", "00000.json")) as f:
        mf = json.load(f)
    assert mf["metrics"]["shards"] == 2 and mf["metrics"]["wall_sec"] > 0
    # a foreign-mode plan refuses to resume
    other = str(tmp_path / "ckpt2")
    os.makedirs(other)
    with open(os.path.join(other, "_plan.json"), "w") as f:
        json.dump({"mode": "file_groups", "groups": []}, f)
    with pytest.raises(RuntimeError, match="fresh out_root"):
        run_warc_extract_with_checkpoint(man["shards"], other)


def test_charset_sniffing_priority_and_bom_strip():
    from dup_ocropy_ray.functions import charsetx

    s = "héllo wörld"
    # BOM beats header, and the BOM char never leaks into the text
    t, e = charsetx.decode_html(b"\xff\xfe" + s.encode("utf-16-le"),
                                "text/html; charset=latin-1")
    assert (t, e) == (s, "utf-16-le")
    t, e = charsetx.decode_html(b"\xfe\xff" + s.encode("utf-16-be"), None)
    assert (t, e) == (s, "utf-16-be")
    t, e = charsetx.decode_html(b"\xef\xbb\xbf" + s.encode(), None)
    assert (t, e) == (s, "utf-8")
    # header beats meta
    payload = b'<meta charset="utf-8">' + s.encode("latin-1")
    t, e = charsetx.decode_html(payload, "text/html; charset=latin-1")
    assert e == "latin-1" and "h\xe9llo" in t
    # meta used when header is silent
    t, e = charsetx.decode_html(b'<meta charset="latin-1">' +
                                s.encode("latin-1"), "text/html")
    assert e == "latin-1"
    # lying meta (declares utf-16 over ascii bytes) falls back, no crash
    t, e = charsetx.decode_html(b'<meta charset="utf-17x">plain', None)
    assert e == "utf-8" and "plain" in t
    # undecodable utf-8 -> latin-1 last resort
    t, e = charsetx.decode_html(b"\xff\xfa\x01", None)
    assert e == "latin-1" and len(t) == 3


def test_warc_checkpoint_extracts_mixed_charsets(ray_session, tmp_path):
    """A real crawl shard is not all-UTF-8: the charset_mix corpus plants
    UTF-16LE/BE+BOM and header-declared payloads, and the checkpointed
    extraction must decode them via WHATWG sniffing (charsetx), not
    crash the fragment on a strict utf-8 decode."""
    import os

    from dup_ocropy_ray.sources.warcgen import (
        build_warc_corpus, run_warc_extract_with_checkpoint)

    man = build_warc_corpus("/root/testdata/sf0.001", num_shards=2,
                            root=str(tmp_path), charset_mix=True)
    out_root = str(tmp_path / "ckpt_mix")
    r = run_warc_extract_with_checkpoint(man["shards"], out_root,
                                         num_fragments=2)
    assert r["counters"]["records"] == man["n_records"]
    # UTF-16 payloads (doc_id%4 in {1,2}) extracted real text, not mojibake
    import pyarrow.parquet as pq

    frags = [os.path.join(out_root, d) for d in os.listdir(out_root)
             if d.startswith("fragment=")]
    parts = [pq.read_table(os.path.join(fd, f))
             for fd in frags for f in os.listdir(fd)
             if f.endswith(".parquet")]
    import pyarrow as pa

    t = pa.concat_tables(parts).to_pandas()
    u16 = t[t["doc_id"] % 4 == 1]
    assert len(u16) > 0
    assert (u16["main_text"].str.len() > 0).all()
    assert not u16["main_text"].str.contains("\x00").any()


def test_run_job_cli_warc_and_compact(ray_session, tmp_path):
    """scripts/run_job.py --pipeline warc / compact as real subprocesses
    (the `ray job submit` surface for the crawl-extraction and lakehouse
    OPTIMIZE jobs): warc extraction resumes to zero pending on rerun,
    then compaction bin-packs its fragment output losslessly."""
    import json
    import os
    import subprocess
    import sys

    import pyarrow.parquet as pq

    from dup_ocropy_ray.sources.warcgen import build_warc_corpus

    man = build_warc_corpus("/root/testdata/sf0.001", num_shards=4,
                            root=str(tmp_path))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    job = os.path.join(repo, "scripts", "run_job.py")
    env = dict(os.environ, RAY_ADDRESS="local")
    out1 = str(tmp_path / "warcout")
    glob_arg = os.path.join(os.path.dirname(man["shards"][0]),
                            "shard-*.warc.gz")
    cmd = [sys.executable, job, "--pipeline", "warc", "--docs", glob_arg,
           "--out", out1, "--fragments", "2"]
    r1 = subprocess.run(cmd, capture_output=True, text=True, env=env,
                        timeout=600)
    assert r1.returncode == 0, r1.stderr[-2000:]
    rec1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert sorted(rec1["fragments_run"]) == [0, 1]
    assert rec1["counters"]["records"] == man["n_records"]

    r2 = subprocess.run(cmd, capture_output=True, text=True, env=env,
                        timeout=600)
    assert r2.returncode == 0, r2.stderr[-2000:]
    rec2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert rec2["fragments_run"] == []
    assert rec2["counters"] == rec1["counters"]

    # compact the fragment parquet into one ~huge target file; rows and
    # content survive (read-back equals the extraction output)
    out2 = str(tmp_path / "compacted")
    r3 = subprocess.run(
        [sys.executable, job, "--pipeline", "compact", "--docs", out1,
         "--out", out2, "--fragments", "1"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r3.returncode == 0, r3.stderr[-2000:]
    rec3 = json.loads(r3.stdout.strip().splitlines()[-1])
    assert rec3["rows"] == man["n_records"]
    assert rec3["n_files_after"] <= rec3["n_files_before"]
    parts = sorted(f for f in os.listdir(out2) if f.endswith(".parquet"))
    got = sum(pq.read_metadata(os.path.join(out2, p)).num_rows
              for p in parts)
    assert got == man["n_records"]
