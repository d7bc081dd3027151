"""Training-data curation operators: sequence packing, benchmark
decontamination, PII scrubbing. Standard LLM-pretraining-pipeline steps
(brief-scope additions like pipelines/dedup.py; no ocropy counterpart).

Scale notes per op:
- pack_sequences: needs a GLOBAL token prefix sum — reuses
  windows.ordered_scan (per-block partials, tiny driver prefix,
  broadcast), so the only exchange is one range-sort on doc_id.
- decontaminate: the benchmark side is SMALL by construction (eval sets
  are thousands of rows, corpora are billions) — broadcast via ray.put,
  vectorized substring scan per batch. Never a shuffle join.
- pii_scrub: stateless per-batch regex pass (compiled once at module
  import, pandas str ops), no shuffle.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

import ray
import ray.data as rd

WINDOW_TOKENS = 256

# PII patterns: email, north-american-style phone, IPv4 (compiled once;
# the scrub stage is vectorized pandas .str.replace over the batch).
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\(\d{3}\) \d{3}-\d{4}"
_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_RE = re.compile(f"(?:{_EMAIL_RE}|{_PHONE_RE}|{_IP_RE})")
_WS_RE = re.compile(r"\s+")


# ------------------------------------------------------- sequence packing


def pack_sequences(docs: rd.Dataset, window: int = WINDOW_TOKENS) -> pd.DataFrame:
    """Greedy sequence packing for pretraining: concatenate documents in
    doc_id order and cut fixed ``window``-token training sequences.
    Returns per doc: its token count, global start-token offset, and the
    window the doc STARTS in — the packing plan a tokenizer-sharder
    executes. The global running offset is the distributed prefix scan
    (windows.ordered_scan); nothing corpus-scale touches the driver."""
    from .windows import ordered_scan

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        toks = [len(t.split()) if isinstance(t, str) else 0
                for t in b["text"]]
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64"),
            "n_tokens": pd.Series(toks, dtype="int64"),
        })

    scanned = ordered_scan(
        docs.map_batches(prep, batch_format="pandas", batch_size=8192),
        "doc_id", sum_cols=("n_tokens",))

    def plan(b: pd.DataFrame) -> pd.DataFrame:
        start = (b["run_n_tokens"] - b["n_tokens"]).astype("int64")
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64"),
            "n_tokens": b["n_tokens"].astype("int64"),
            "start_tok": start,
            "window_id": (start // window).astype("int64"),
        })

    out = scanned.map_batches(plan, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# ------------------------------------------------------- decontamination


def _eval_snippets(docs: rd.Dataset, every: int, skip: int,
                   n_words: int) -> list[tuple[int, str]]:
    """Deterministic stand-in benchmark: every ``every``-th doc donates
    words [skip, skip+n_words) as an eval snippet. In production this is
    the real benchmark file; either way it is the SMALL side."""

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        sel = b[b["doc_id"] % every == 0]
        ids, snips = [], []
        for i, t in zip(sel["doc_id"], sel["text"]):
            w = (t or "").split()
            if len(w) >= skip + n_words:
                ids.append(int(i))
                snips.append(" ".join(w[skip:skip + n_words]))
        return pd.DataFrame({"eval_id": pd.Series(ids, dtype="int64"),
                             "snippet": pd.Series(snips, dtype=str)})

    sm = docs.map_batches(pick, batch_format="pandas").to_pandas()
    return list(zip(sm["eval_id"], sm["snippet"]))


def decontaminate(docs: rd.Dataset, every: int = 97, skip: int = 3,
                  n_words: int = 8) -> pd.DataFrame:
    """Benchmark decontamination: flag corpus documents whose text
    contains any eval-set snippet (exact n-word overlap — the standard
    pretraining hygiene check). Snippet set is broadcast once
    (ray.put); the scan is a vectorized pandas str.contains per snippet,
    OR-reduced. Returns (doc_id, n_hits) for contaminated docs only."""
    snippets = _eval_snippets(docs, every, skip, n_words)
    ref = ray.put([s for _, s in snippets])

    def scan(b: pd.DataFrame) -> pd.DataFrame:
        snips = ray.get(ref)
        # snippets are single-spaced (built from split()); normalize the
        # haystack the same way so irregular whitespace can't hide a hit
        text = (b["text"].fillna("")
                .str.replace(_WS_RE.pattern, " ", regex=True))
        hits = np.zeros(len(b), dtype="int64")
        for s in snips:
            hits += text.str.contains(s, regex=False).to_numpy()
        sel = hits > 0
        return pd.DataFrame({
            "doc_id": b["doc_id"][sel].astype("int64"),
            "n_hits": hits[sel],
        })

    out = docs.map_batches(scan, batch_format="pandas",
                           batch_size=8192).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# ----------------------------------------------------------- PII scrub


def inject_pii(doc_id: int, text: str) -> str:
    """Deterministically plant 1 + doc_id%3 PII tokens (email, phone,
    IPv4 round-robin) between words — synthetic-source stand-in so the
    scrub is oracle-checkable as a round-trip."""
    w = (text or "").split()
    n = 1 + doc_id % 3
    fakes = [
        f"user{doc_id}@example.com",
        f"({100 + doc_id % 900:03d}) 555-{doc_id % 10000:04d}",
        f"10.{doc_id % 256}.0.{(doc_id * 7) % 256}",
    ]
    for k in range(n):
        pos = 0 if not w else ((doc_id + 1) * (k + 1)) % (len(w) + 1)
        w.insert(pos, fakes[k % 3])
    return " ".join(w)


def pii_scrub_stage(b: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, dirty) -> (doc_id, scrubbed, n_redactions): remove PII
    matches, re-normalize whitespace. Vectorized str.count/str.replace."""
    dirty = b["dirty"].fillna("")
    n = dirty.str.count(_PII_RE.pattern).astype("int64")
    clean = (dirty.str.replace(_PII_RE.pattern, "", regex=True)
             .str.replace(_WS_RE.pattern, " ", regex=True).str.strip())
    return pd.DataFrame({
        "doc_id": b["doc_id"].astype("int64"),
        "scrubbed": clean,
        "n_redactions": n,
    })


def pii_scrub(docs: rd.Dataset) -> pd.DataFrame:
    """Round-trip: inject deterministic PII, scrub it back out. The
    scrubbed text must equal the whitespace-normalized source and the
    redaction count must equal the planted count (1 + doc_id%3)."""

    def dirty(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64"),
            "dirty": [inject_pii(int(i), t)
                      for i, t in zip(b["doc_id"], b["text"])],
        })

    out = (docs.map_batches(dirty, batch_format="pandas", batch_size=8192)
           .map_batches(pii_scrub_stage, batch_format="pandas",
                        batch_size=8192)
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


# ------------------------------------------------- weighted sampling


def sample_by_source(docs: rd.Dataset, base_pct: int = 20) -> pd.DataFrame:
    """Deterministic weighted downsampling for corpus mixing: each
    source keeps ``base_pct + 5 * len(source)`` percent of its docs,
    selected by a stable hash permutation of doc_id (reproducible across
    runs and workers — the property reservoir sampling lacks). Stateless
    per-batch filter + metadata-scale grouped summary; no shuffle of
    the kept rows themselves."""

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        h = (b["doc_id"].to_numpy("int64") * 2654435761) % 4294967296 % 100
        quota = (base_pct + 5 * b["source"].str.len()).to_numpy("int64")
        sel = b[h < quota]
        return pd.DataFrame({
            "source": sel["source"].astype(str),
            "kept": np.ones(len(sel), dtype="int64"),
            "kept_chars": sel["n_chars"].to_numpy("int64"),
        })

    from .relational import grouped_agg

    g = grouped_agg(
        docs.map_batches(pick, batch_format="pandas", batch_size=8192),
        ["source"], sums=["kept_chars"])
    out = pd.DataFrame({
        "source": g["source"].astype(str),
        "n_kept": g["n"].astype("int64"),
        "kept_chars": g["sum_kept_chars"].astype("int64"),
    })
    return out.sort_values("source").reset_index(drop=True)


# ------------------------------------------------------- text chunking


def chunk_documents(docs: rd.Dataset, size: int = 200,
                    overlap: int = 50) -> rd.Dataset:
    """Fixed-size character chunking with overlap (the RAG/embedding
    prep step): chunk i covers [i*(size-overlap), i*(size-overlap)+size)
    of the whitespace-normalized text; emission continues while the
    start is inside the text (empty docs get one empty chunk so
    rows-in/rows-out accounting holds). Stateless flat map, no
    shuffle."""
    assert overlap < size
    step = size - overlap

    def f(b: pd.DataFrame) -> pd.DataFrame:
        ids, idxs, starts, chunks = [], [], [], []
        for i, t in zip(b["doc_id"], b["text"]):
            t = _WS_RE.sub(" ", t or "").strip()
            n = len(t)
            j = 0
            while j == 0 or j * step < n:
                s = j * step
                ids.append(int(i))
                idxs.append(j)
                starts.append(s)
                chunks.append(t[s:s + size])
                j += 1
        return pd.DataFrame({
            "doc_id": pd.Series(ids, dtype="int64"),
            "chunk_idx": pd.Series(idxs, dtype="int64"),
            "start": pd.Series(starts, dtype="int64"),
            "chunk": pd.Series(chunks, dtype=str),
        })

    return docs.map_batches(f, batch_format="pandas", batch_size=8192)
