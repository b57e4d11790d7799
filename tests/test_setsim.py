"""Vocabulary Jaccard between groups (pipelines/setsim.py) vs brute force."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ddsketch_ruby_ray.pipelines.setsim import vocab_jaccard_pipeline

VOCAB = ["a", "bb", "ccc", "dd", "e", "ff", "g", "hh", "iii", "jj"]


def _brute(groups, texts):
    vocab = {}
    for g, s in zip(groups, texts):
        vocab.setdefault(g, set()).update(t for t in s.split(" ") if t)
    names = sorted(vocab)
    out = {}
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            inter = len(vocab[a] & vocab[b])
            union = len(vocab[a] | vocab[b])
            out[(a, b)] = (
                len(vocab[a]),
                len(vocab[b]),
                inter,
                union,
                float(inter) / float(union) if union else 0.0,
            )
    return out


def _run(groups, texts, parts=4):
    import ray.data as rd

    tbl = pa.table(
        {"g": pa.array(groups, pa.string()), "text": pa.array(texts, pa.string())}
    )
    df = vocab_jaccard_pipeline(
        rd.from_arrow(tbl).repartition(parts), group_col="g", text_col="text"
    ).to_pandas()
    return {
        (r.group_a, r.group_b): (
            int(r.n_a),
            int(r.n_b),
            int(r.n_inter),
            int(r.n_union),
            float(r.jaccard),
        )
        for r in df.itertuples()
    }


class TestVocabJaccard:
    def test_random_vs_brute(self, ray_session):
        rng = np.random.default_rng(14)
        n = 600
        groups = rng.choice(["s1", "s2", "s3", "s4"], n).tolist()
        texts = [
            " ".join(rng.choice(VOCAB, size=rng.integers(0, 12)))
            for _ in range(n)
        ]
        assert _run(groups, texts) == _brute(groups, texts)

    def test_disjoint_and_identical(self, ray_session):
        groups = ["a", "a", "b", "c"]
        texts = ["x y", "y z", "x y z", "p q"]
        got = _run(groups, texts)
        assert got[("a", "b")] == (3, 3, 3, 3, 1.0)  # identical vocabularies
        assert got[("a", "c")] == (3, 2, 0, 5, 0.0)  # disjoint
