"""Bigram LM-proxy scorer tests (pipelines/lmscore.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _run(t, top_k, repartition=None):
    import ray.data as rd

    from ddsketch_ruby_ray.pipelines.lmscore import bigram_lm_score_pipeline

    ds = rd.from_arrow(t)
    if repartition:
        ds = ds.repartition(repartition)
    return (
        bigram_lm_score_pipeline(ds, id_col="doc_id", text_col="text", top_k=top_k)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


class TestBigramLMScore:
    def test_hand_computed(self, ray_session):
        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(
                    [
                        "a b a b",   # bigrams: "a b" x2, "b a" x1
                        "a b",       # "a b" x1
                        "zz",        # no bigrams
                        "",          # no tokens
                    ]
                ),
            }
        )
        df = _run(t, top_k=1)  # only "a b" (count 3) survives the top-1
        w_ab = int(np.floor(np.log2(1 + 3) * 1000))  # 2000
        assert df.n_bigrams.tolist() == [3, 1, 0, 0]
        assert df.score_milli.tolist() == [2 * w_ab, w_ab, 0, 0]

    def test_layout_invariant(self, ray_session):
        rng = np.random.default_rng(13)
        words = np.array(["the", "cat", "sat", "on", "mat", "dog", "ran"])
        texts = [" ".join(rng.choice(words, rng.integers(0, 30))) for _ in range(200)]
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(200), pa.int64()),
                "text": pa.array(texts),
            }
        )
        a = _run(t, top_k=10)
        b = _run(t, top_k=10, repartition=7)
        assert (a.values == b.values).all()

    def test_empty_token_runs_match_sql_tokenize(self, ray_session):
        # double spaces produce empty tokens that must be dropped BEFORE
        # pairing (SQL list_filter runs before list_zip)
        t = pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "text": pa.array(["x  y"]),  # tokens [x, y] -> one bigram "x y"
            }
        )
        df = _run(t, top_k=5)
        assert df.n_bigrams.tolist() == [1]
