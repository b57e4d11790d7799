"""Per-doc duplication scoring (pipelines/postings.py::dup_fraction_pipeline)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ddsketch_ruby_ray.pipelines.dedup import word_shingles


def _docs():
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over a sleeping cat",  # shares a prefix
        "completely unrelated words appear in this document only",
        "the quick brown fox jumps over the lazy dog",  # exact dup of 0
        "one two",  # < n tokens -> single short shingle
        "",  # zero shingles -> absent from output
    ]
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)})


def _run(t, repartition=None):
    import ray.data as rd

    from ddsketch_ruby_ray.pipelines.postings import dup_fraction_pipeline

    ds = rd.from_arrow(t)
    if repartition:
        ds = ds.repartition(repartition)
    return (
        dup_fraction_pipeline(ds, key_col="doc_id", text_col="text", ngram=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


class TestDupFraction:
    def test_matches_bruteforce_and_layout(self, ray_session):
        t = _docs()
        df = _run(t)
        texts = t["text"].to_pylist()
        sets = [set(word_shingles(s, 3)) for s in texts]
        want = {}
        for i, si in enumerate(sets):
            if not si:
                continue
            dup = sum(
                1 for sh in si if any(sh in sj for j, sj in enumerate(sets) if j != i)
            )
            want[i] = (len(si), dup, (1000 * dup) // len(si))
        assert df.doc_id.tolist() == sorted(want)
        for _, row in df.iterrows():
            assert (row.n_shingles, row.n_dup, row.dup_milli) == want[row.doc_id]
        # exact duplicates score 1000; the unique doc scores 0
        full = df.set_index("doc_id")
        assert full.loc[0].dup_milli == 1000 and full.loc[3].dup_milli == 1000
        assert full.loc[2].dup_milli == 0
        assert 0 < full.loc[1].dup_milli < 1000  # partial overlap
        df2 = _run(t, repartition=5)
        assert (df.values == df2.values).all()

    def test_random_corpus_bruteforce(self, ray_session):
        rng = np.random.default_rng(17)
        vocab = [f"w{i}" for i in range(30)]
        texts = [" ".join(rng.choice(vocab, 12)) for _ in range(60)]
        t = pa.table(
            {"doc_id": pa.array(range(60), pa.int64()), "text": pa.array(texts)}
        )
        df = _run(t, repartition=8).set_index("doc_id")
        sets = [set(word_shingles(s, 3)) for s in texts]
        for i, si in enumerate(sets):
            others = set().union(*(sj for j, sj in enumerate(sets) if j != i))
            dup = len(si & others)
            assert df.loc[i].n_shingles == len(si)
            assert df.loc[i].n_dup == dup
