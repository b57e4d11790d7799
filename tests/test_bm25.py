"""BM25 top-k (pipelines/bm25.py) vs a straight-line Python reference."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ddsketch_ruby_ray.pipelines.bm25 import bm25_topk_pipeline


def _brute(docs, qterms, k):
    """docs: {doc_id: text}; same float op order as the pipeline."""
    toks = {d: [t for t in s.split(" ") if t] for d, s in docs.items()}
    n = len(docs)
    total = sum(len(v) for v in toks.values())
    avgdl = float(total) / float(n) if n else 1.0
    dfs = {q: sum(1 for v in toks.values() if q in v) for q in qterms}
    idfs = {
        q: math.log((float(n - dfs[q]) + 0.5) / (float(dfs[q]) + 0.5))
        for q in qterms
    }
    out = []
    for d, v in toks.items():
        tfs = {q: v.count(q) for q in qterms}
        if not any(tfs.values()):
            continue
        dl = float(len(v))
        norm = 1.2 * ((1.0 - 0.75) + 0.75 * (dl / avgdl))
        score = 0.0
        for q in qterms:
            tf = float(tfs[q])
            s = idfs[q] * ((tf * (1.2 + 1.0)) / (tf + norm)) if tfs[q] else 0.0
            score = score + s
        out.append((d, score, len(v)))
    out.sort(key=lambda r: (-r[1], r[0]))
    return [(i + 1, d, s, dl) for i, (d, s, dl) in enumerate(out[:k])]


def _run(docs, qterms, k, parts=4):
    import ray.data as rd

    tbl = pa.table(
        {
            "doc_id": pa.array(list(docs.keys()), pa.int64()),
            "text": pa.array(list(docs.values()), pa.string()),
        }
    )
    df = bm25_topk_pipeline(
        rd.from_arrow(tbl).repartition(parts),
        key_col="doc_id",
        text_col="text",
        query_terms=qterms,
        k=k,
    ).to_pandas()
    return [
        (int(r.rank), int(r.doc_id), float(r.score), int(r.dl))
        for r in df.itertuples()
    ]


VOCAB = ["hash", "join", "scan", "sort", "table", "row", "x", "y", "z"]


def _corpus(seed, n_docs=400):
    rng = np.random.default_rng(seed)
    return {
        i: " ".join(rng.choice(VOCAB, size=rng.integers(0, 30)))
        for i in range(n_docs)
    }


class TestBm25:
    def test_vs_brute(self, ray_session):
        docs = _corpus(2)
        q = ["hash", "join", "z"]
        assert _run(docs, q, 15) == _brute(docs, q, 15)

    def test_partitioning_invariant(self, ray_session):
        docs = _corpus(9)
        q = ["scan", "sort"]
        assert _run(docs, q, 10, parts=2) == _run(docs, q, 10, parts=9)

    def test_docs_without_query_terms_excluded(self, ray_session):
        docs = {1: "hash join", 2: "table row", 3: ""}
        got = _run(docs, ["hash"], 10)
        assert [d for _, d, _, _ in got] == [1]

    def test_absent_term_is_harmless(self, ray_session):
        docs = {1: "hash hash join", 2: "hash"}
        a = _run(docs, ["hash"], 10)
        b = _run(docs, ["hash", "nosuchterm"], 10)
        assert [r[1] for r in a] == [r[1] for r in b]


class TestEmptyInput:
    def test_zero_rows_returns_empty_table(self, ray_session):
        # Dataset.sum returns None on zero rows; the pipeline must emit the
        # empty (rank, key, score, dl) table instead of TypeError-ing
        out = _run({}, ["alpha", "beta"], k=5)
        assert out == []
