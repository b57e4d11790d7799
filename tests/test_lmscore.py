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


class TestPmiCollocations:
    def _run(self, docs, top_k=10, min_count=1, blocks=None):
        import ray.data as rd

        from ddsketch_ruby_ray.pipelines.pmi import pmi_collocations_pipeline

        t = pa.table({"text": pa.array(docs, pa.string())})
        ds = rd.from_arrow(t)
        if blocks:
            ds = ds.repartition(blocks)
        return pmi_collocations_pipeline(
            ds, text_col="text", top_k=top_k, min_count=min_count
        ).to_pandas()

    def test_matches_brute_force(self, ray_session):
        import math
        from collections import Counter

        docs = [
            "new york is a big city",
            "new york new york",
            "a big apple in new york",
            "big city big city",
            "a",  # extra lone 'a': breaks the c_xy/(c_x*c_y) ratio tie
        ]
        df = self._run(docs, top_k=5, min_count=2)
        toks = [t for d in docs for t in d.split(" ") if t]
        uni = Counter(toks)
        big = Counter()
        for d in docs:
            ts = [t for t in d.split(" ") if t]
            big.update(" ".join(p) for p in zip(ts, ts[1:]))
        n = len(toks)
        want = sorted(
            ((b, c) for b, c in big.items() if c >= 2),
            key=lambda bc: (-bc[1], bc[0]),
        )[:5]
        assert df.bigram.tolist() == [b for b, _ in want]
        for row in df.itertuples(index=False):
            x, y = row.bigram.split(" ", 1)
            assert (row.c_xy, row.c_x, row.c_y, row.n_tokens) == (
                big[row.bigram], uni[x], uni[y], n,
            )
            assert row.pmi == math.log(
                float(big[row.bigram] * n) / float(uni[x] * uni[y])
            )
        # 'new york' is a real collocation: higher PMI than 'a big'
        pmis = dict(zip(df.bigram, df.pmi))
        assert pmis["new york"] > pmis["a big"]

    def test_layout_invariance(self, ray_session):
        docs = ["alpha beta gamma alpha beta", "beta gamma alpha beta gamma"] * 5
        a = self._run(docs, blocks=1)
        b = self._run(docs, blocks=7)
        assert a.equals(b)


class TestTokenFrequencySpectrum:
    def test_matches_brute_force_and_layout(self, ray_session):
        import ray.data as rd
        from collections import Counter

        from ddsketch_ruby_ray.pipelines.pmi import token_frequency_spectrum_pipeline

        docs = [
            "a a b c",
            "b c d",
            "a e",
            "",
            "  ",  # empty / whitespace docs contribute nothing
        ]
        t = pa.table({"text": pa.array(docs, pa.string())})
        got = (
            token_frequency_spectrum_pipeline(rd.from_arrow(t), text_col="text")
            .to_pandas()
            .sort_values("freq")
            .reset_index(drop=True)
        )
        tokc = Counter(tok for d in docs for tok in d.split(" ") if tok)
        spec = Counter(tokc.values())
        assert dict(zip(got.freq, got.n_tokens)) == dict(spec)
        got2 = (
            token_frequency_spectrum_pipeline(
                rd.from_arrow(t).repartition(4), text_col="text"
            )
            .to_pandas()
            .sort_values("freq")
            .reset_index(drop=True)
        )
        assert got.equals(got2)
